"""Native (C++) audio loader vs the Python reference path."""

import numpy as np
import pytest

from dcs_net_tpu.data import synthetic
from dcs_net_tpu.data.audio_io import read_wav, resample
from dcs_net_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(
    not nl.native_available(), reason="native audioio failed to build")


@pytest.fixture(scope="module")
def wav_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nat"))
    synthetic.generate(root, n_train=4, n_test=1, seconds=0.5)
    return root


def test_decode_matches_python(wav_tree):
    import os

    d = os.path.join(wav_tree, "clean_trainset_28spk_wav")
    path = os.path.join(d, sorted(os.listdir(d))[0])
    want, sr = read_wav(path)
    got = nl.load_wav(path)
    assert sr == 48000
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_decode_and_resample_matches_python(wav_tree):
    import os

    d = os.path.join(wav_tree, "clean_trainset_28spk_wav")
    path = os.path.join(d, sorted(os.listdir(d))[0])
    raw, _ = read_wav(path)
    want = resample(raw, 48000, 16000)
    got = nl.load_wav(path, orig_freq=48000, new_freq=16000)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fill_batch_matches_python(wav_tree):
    import os

    cd = os.path.join(wav_tree, "clean_trainset_28spk_wav")
    nd = os.path.join(wav_tree, "noisy_trainset_28spk_wav")
    names = sorted(os.listdir(cd))[:3]
    clean_paths = [os.path.join(cd, n) for n in names]
    noisy_paths = [os.path.join(nd, n) for n in names]
    crop = 4000
    starts = [0, 100, 2000]
    clean, noisy = nl.fill_batch(clean_paths, noisy_paths, starts, crop)
    assert clean.shape == noisy.shape == (3, crop)
    for i, (cp, np_, s) in enumerate(zip(clean_paths, noisy_paths, starts)):
        raw, _ = read_wav(cp)
        want = resample(raw, 48000, 16000)
        want = want[s:s + crop]
        if want.shape[0] < crop:
            want = np.pad(want, (0, crop - want.shape[0]))
        np.testing.assert_allclose(clean[i], want, atol=1e-5, err_msg=str(i))
    assert np.all(np.isfinite(noisy))


def test_fill_batch_missing_file(wav_tree):
    with pytest.raises(IOError):
        nl.fill_batch(["/nonexistent.wav"], ["/nonexistent2.wav"], [0], 100)


def test_loader_native_matches_python(wav_tree):
    from dcs_net_tpu.core.config import DataConfig
    from dcs_net_tpu.data.dataset import Loader, VoiceBankDataset
    from dcs_net_tpu.data.partition import make_partition

    cfg = DataConfig(root=wav_tree, crop_samples=4000)
    part = make_partition(cfg)
    ds = VoiceBankDataset(part["train"], cfg, "train")
    py = Loader(ds, batch_size=2, shuffle=True, seed=3, use_native=False)
    nat = Loader(ds, batch_size=2, shuffle=True, seed=3, use_native=True)
    for bp, bn in zip(py.epoch(1), nat.epoch(1)):
        assert bp["id"] == bn["id"]
        np.testing.assert_array_equal(bp["start"], bn["start"])
        np.testing.assert_allclose(bp["clean"], bn["clean"], atol=1e-5)
        np.testing.assert_allclose(bp["noisy"], bn["noisy"], atol=1e-5)
