"""End-to-end slice: Trainer.fit on synthetic fixtures (BASELINE config 1
analog), checkpoint save/restore roundtrip, streaming-vs-full enhancement.

Channel-reduced model + short crops keep CPU compile tractable; the full-size
path runs on TPU via bench.py.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.data import synthetic
from dcs_net_tpu.data.dataset import Loader, VoiceBankDataset
from dcs_net_tpu.data.partition import make_partition

TINY_CHANNELS = (1, 2, 2, 4, 4, 8, 8, 8)
CROP = 2016


def _cfg(variant, root, log_dir):
    cfg = config_for_variant(variant)
    return cfg.replace(
        model=cfg.model.__class__(
            complex_valued=cfg.model.complex_valued,
            subtractive=cfg.model.subtractive,
            channels=TINY_CHANNELS, ca_reduction=2),
        data=cfg.data.__class__(root=root, crop_samples=CROP, batch_size=2,
                                num_workers=1),
        run=cfg.run.__class__(max_epochs=1, log_every_n_steps=2,
                              num_sanity_val_steps=1, log_dir=log_dir),
    )


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vb"))
    synthetic.generate(root, n_train=6, n_test=2, seconds=0.6)
    return root


def _loaders(cfg):
    part = make_partition(cfg.data)
    train = Loader(VoiceBankDataset(part["train"], cfg.data, "train"),
                   batch_size=2, shuffle=True, drop_last=True, num_workers=1)
    val = Loader(VoiceBankDataset(part["val"], cfg.data, "val"),
                 batch_size=2, shuffle=False, num_workers=1)
    return train, val


def test_fit_one_epoch_and_checkpoint(data_root, tmp_path):
    from dcs_net_tpu.train.checkpoint import CheckpointManager, abstract_like
    from dcs_net_tpu.train.loop import Trainer

    cfg = _cfg("drs", data_root, str(tmp_path / "logs"))
    train_loader, val_loader = _loaders(cfg)
    trainer = Trainer(cfg, use_tensorboard=False)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    metrics = trainer.fit(train_loader, val_loader, ckpt=ckpt)
    assert "val_loss" in metrics and np.isfinite(metrics["val_loss"])
    assert "val_stoi" in metrics
    # events were logged
    assert os.path.exists(os.path.join(cfg.run.log_dir, "events.jsonl"))
    # checkpoint roundtrip restores identical params
    step = ckpt.latest_step()
    assert step is not None and step >= 1
    restored, extra = ckpt.restore(abstract_like(trainer.state), with_extra=True)
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert extra["epoch"] == 0
    cfg2 = ckpt.load_config()
    assert cfg2 is not None and cfg2.variant == "drs"


def test_plateau_and_swa_wiring(data_root, tmp_path):
    from dcs_net_tpu.train.loop import Trainer
    from dcs_net_tpu.train.optim import get_lr

    cfg = _cfg("dr", data_root, str(tmp_path / "logs2"))
    cfg = cfg.replace(
        optim=cfg.optim.__class__(plateau_patience=0, swa=True,
                                  swa_start_frac=1.0),  # swa from epoch 1 on
        run=cfg.run.__class__(max_epochs=1, num_sanity_val_steps=0,
                              log_dir=cfg.run.log_dir))
    train_loader, val_loader = _loaders(cfg)
    trainer = Trainer(cfg, use_tensorboard=False)
    trainer.init_state()
    lr0 = get_lr(trainer.state.opt_state)
    tm = trainer.train_epoch(train_loader.epoch(0), 0)
    vm = trainer.eval_epoch(val_loader.epoch(0), 0, compute_metrics=False)
    trainer.end_of_epoch(0, vm)
    # patience=0: first epoch sets best; feed a worse metric to trigger a cut
    # (epoch 0 is pre-SWA, so the plateau scheduler still acts)
    trainer.plateau.best = -1e9
    trainer.epoch = 0
    trainer.end_of_epoch(0, vm)
    lr_cut = get_lr(trainer.state.opt_state)
    assert lr_cut < lr0
    # epoch 1 enters SWA: Lightning swaps plateau for SWALR, which (with
    # swa_lrs=None) holds the lr constant — a worse metric must NOT cut it
    trainer.plateau.best = -1e9
    trainer.end_of_epoch(1, vm)
    assert get_lr(trainer.state.opt_state) == lr_cut
    assert trainer.swa is not None and trainer.swa.n_averaged >= 1
    trainer.finalize_swa()
    assert trainer.state.params is trainer.swa.avg_params


def test_swa_bn_refresh(data_root, tmp_path):
    """finalize_swa with train data refreshes BN running stats: the averaged
    params carry cumulative-average batch statistics (torch update_bn
    semantics), not the stale pre-SWA running stats."""
    from dcs_net_tpu.train.loop import Trainer

    cfg = _cfg("dr", data_root, str(tmp_path / "logs3"))
    cfg = cfg.replace(
        optim=cfg.optim.__class__(swa=True, swa_start_frac=0.0),
        run=cfg.run.__class__(max_epochs=1, num_sanity_val_steps=0,
                              log_dir=cfg.run.log_dir))
    train_loader, _ = _loaders(cfg)
    trainer = Trainer(cfg, use_tensorboard=False)
    trainer.init_state()
    trainer.train_epoch(train_loader.epoch(0), 0)
    trainer.end_of_epoch(0, {})
    stale = jax.tree.map(np.asarray, trainer.state.batch_stats)
    trainer.finalize_swa(train_loader.epoch(1), max_batches=2)

    # stats changed...
    changed = jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), stale,
        jax.tree.map(np.asarray, trainer.state.batch_stats))
    assert max(jax.tree.leaves(changed)) > 0.0
    # ...and equal the plain mean of the recovered per-batch statistics
    # (cumulative average == mean), recomputed here independently
    from dcs_net_tpu.train import steps as S

    m = 0.1
    stats0 = stale  # the refresh recovered batch stats against the PRE-refresh
    # running stats (they are constant inputs, not threaded)
    batch_stats = []
    rng = jax.random.PRNGKey(cfg.run.seed ^ 0x5A5A5A)
    for i, hb in enumerate(train_loader.epoch(1)):
        if i >= 2:
            break
        batch = trainer._device_batch(hb)
        x = batch.noisy if cfg.model.complex_valued else batch.noisy.abs()
        rng, sub = jax.random.split(rng)
        _, mut = trainer.model.apply(
            {"params": trainer.state.params, "batch_stats": stats0},
            x, train=True, rngs={"dropout": sub}, mutable=["batch_stats"])
        batch_stats.append(jax.tree.map(
            lambda new, old: (np.asarray(new) - (1 - m) * np.asarray(old)) / m,
            mut["batch_stats"], stats0))
    want = jax.tree.map(lambda *xs: np.mean(xs, axis=0), *batch_stats)
    got = jax.tree.map(np.asarray, trainer.state.batch_stats)
    jax.tree.map(lambda w, g: np.testing.assert_allclose(w, g, rtol=1e-4,
                                                         atol=1e-6), want, got)


def test_enhance_full_vs_streaming(data_root):
    from dcs_net_tpu.models.enhance import enhance_full, enhance_streaming
    from dcs_net_tpu.models.unet import DCSNet

    cfg = _cfg("dcs", data_root, "unused")
    model = DCSNet(cfg.model, cfg.quirks)
    n = 4000  # arbitrary utterance length
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32) * 0.1)

    from dcs_net_tpu.dsp import stft as dsp

    # init on a stride-aligned dummy (T must be divisible by 8 inside the
    # model; enhance_full pads at inference but init shapes are the caller's)
    dummy = jnp.zeros((1, 2016), jnp.float32)
    variables = jax.jit(lambda r, w: model.init(
        {"params": r, "dropout": r}, dsp.stft(w, cfg.stft), train=False)
    )(jax.random.PRNGKey(0), dummy)

    full = jax.jit(lambda v, w: enhance_full(model, v, w, cfg))(variables, wave)
    assert full.shape == (1, n)
    assert np.all(np.isfinite(np.asarray(full)))

    stream = enhance_streaming(model, variables, wave, cfg,
                               chunk_frames=64, overlap=16)
    assert stream.shape == (1, n)
    assert np.all(np.isfinite(np.asarray(stream)))
    # chunked output should resemble the full-utterance output away from
    # chunk boundaries (same weights, BN eval mode, deterministic)
    a, b = np.asarray(full)[0], np.asarray(stream)[0]
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, f"stream/full correlation {corr}"


def test_checkpoint_format_version_guard(tmp_path):
    """Format-version marker round-trips; a version bump refuses restore with
    a migration message, and restore_raw stays available as the escape hatch
    (ADVICE r2 item 1: the optax.flatten change silently broke old opt_state
    layouts — now it fails loudly)."""
    import jax.numpy as jnp

    from dcs_net_tpu.train import checkpoint as C
    from dcs_net_tpu.train.steps import TrainState

    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params={"w": jnp.ones(3)},
                       batch_stats={"bn": jnp.ones(2)},
                       opt_state={"m": jnp.zeros(3)})
    mgr = C.CheckpointManager(str(tmp_path / "ckpt_v"))
    mgr.save(1, state)
    restored, _ = mgr.restore(C.abstract_like(state))
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.ones(3))
    orig = C.FORMAT_VERSION
    try:
        C.FORMAT_VERSION = orig + 1
        with pytest.raises(C.CheckpointIncompatible, match="restore_raw"):
            mgr.restore(C.abstract_like(state))
    finally:
        C.FORMAT_VERSION = orig
    raw = mgr.restore_raw()
    assert "params" in raw["state"]
    mgr.close()
