"""Data pipeline: wav IO roundtrip, resampler properties, partition semantics,
loader crops/shuffling/NaN tripwires — on synthetic fixtures."""

import os

import numpy as np
import pytest

from dcs_net_tpu.core.config import DataConfig
from dcs_net_tpu.data import partition as P
from dcs_net_tpu.data import synthetic
from dcs_net_tpu.data.audio_io import read_wav, resample, write_wav
from dcs_net_tpu.data.dataset import Loader, VoiceBankDataset


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voicebank"))
    synthetic.generate(root, n_train=8, n_test=3, seconds=0.8)
    return root


def test_wav_roundtrip(tmp_path, rng):
    x = rng.uniform(-0.9, 0.9, 4800).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, x, 48000)
    y, sr = read_wav(path)
    assert sr == 48000
    np.testing.assert_allclose(y, x, atol=1.5 / 2 ** 15)


def test_resample_sine_preserved():
    """A 1 kHz tone must survive 48k->16k with amplitude ~1 and low distortion."""
    sr, n = 48000, 48000
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = resample(x, 48000, 16000)
    assert y.shape[0] == 16000
    core = y[200:-200]
    t16 = (np.arange(y.shape[0]) / 16000)[200:-200]
    ref = np.sin(2 * np.pi * 1000 * t16)
    err = np.abs(core - ref).max()
    assert err < 5e-3, f"resample distortion {err}"


def test_resample_kills_aliases():
    """Content above 8 kHz must be attenuated hard."""
    sr, n = 48000, 48000
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * 11000 * t).astype(np.float32)
    y = resample(x, 48000, 16000)
    assert np.abs(y[500:-500]).max() < 0.02


def test_resample_jax_matches_host():
    import jax.numpy as jnp

    from dcs_net_tpu.data.audio_io import resample_jax

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9600)).astype(np.float32)
    host = resample(x, 48000, 16000)
    dev = np.asarray(resample_jax(jnp.asarray(x), 48000, 16000))
    np.testing.assert_allclose(dev, host, atol=2e-5)


def test_partition_split_and_cache(fixture_root):
    cfg = DataConfig(root=fixture_root)
    part = P.make_partition(cfg, seed=0)
    assert len(part["train"]) + len(part["val"]) == 8
    assert len(part["test"]) == 3
    assert set(part["train"]).isdisjoint(part["val"])
    # cached: same result, file exists
    again = P.make_partition(cfg, seed=123)  # different seed, cache wins
    assert again == part
    assert os.path.exists(os.path.join(fixture_root, cfg.partition_json))


def test_shard_ids():
    ids = [f"u{i}" for i in range(10)]
    s0 = P.shard_ids(ids, 0, 3)
    s1 = P.shard_ids(ids, 1, 3)
    s2 = P.shard_ids(ids, 2, 3)
    assert len(s0) == len(s1) == len(s2) == 3
    assert set(s0).isdisjoint(s1) and set(s1).isdisjoint(s2)


def test_dataset_crop_and_loader(fixture_root):
    cfg = DataConfig(root=fixture_root, crop_samples=8160, batch_size=4)
    part = P.make_partition(cfg)
    ds = VoiceBankDataset(part["train"], cfg, mode="train")
    item = ds.get(0, np.random.default_rng(0))
    assert item["clean"].shape == (8160,)
    assert item["noisy"].shape == (8160,)
    # 0.8 s @16k = 12800 samples > 8160: random crop
    starts = {ds.get(0, np.random.default_rng(s))["start"] for s in range(5)}
    assert len(starts) > 1, "crop start should vary with rng"

    loader = Loader(ds, batch_size=4, shuffle=True, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == len(loader)
    assert batches[0]["clean"].shape == (4, 8160)
    # epoch shuffling is seeded & different across epochs
    ids_e0 = [i for b in loader.epoch(0) for i in b["id"]]
    ids_e0b = [i for b in loader.epoch(0) for i in b["id"]]
    ids_e1 = [i for b in loader.epoch(1) for i in b["id"]]
    assert ids_e0 == ids_e0b, "same epoch must reproduce the same order"
    assert ids_e0 != ids_e1, "different epochs should reshuffle"


def test_dataset_pads_short_utterance(tmp_path):
    root = str(tmp_path)
    synthetic.generate(root, n_train=2, n_test=1, seconds=0.3)  # 4800 samples @16k
    cfg = DataConfig(root=root, crop_samples=8160)
    part = P.make_partition(cfg)
    ds = VoiceBankDataset(part["train"], cfg, mode="train")
    item = ds.get(0, np.random.default_rng(0))
    assert item["clean"].shape == (8160,)
    assert item["start"] == 0
    assert np.all(item["clean"][-100:] == 0), "short utterance zero-padded"
