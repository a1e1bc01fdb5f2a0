"""K-steps-per-dispatch training (steps_per_dispatch): equivalence with K
single dispatches, and the Trainer wiring incl. ragged tail."""

import numpy as np

import jax
import jax.numpy as jnp

from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.models.unet import DCSNet
from dcs_net_tpu.train import steps as S
from dcs_net_tpu.train.optim import make_optimizer

KEY = jax.random.PRNGKey(0)
CROP = 2016
TINY_CHANNELS = (1, 2, 2, 4, 4, 8, 8, 8)


def _cfg():
    cfg = config_for_variant("drs")
    return cfg.replace(
        data=cfg.data.__class__(crop_samples=CROP, batch_size=2),
        model=cfg.model.__class__(
            complex_valued=False, subtractive=True,
            channels=TINY_CHANNELS, ca_reduction=2,
            dropout_conv=0.0, dropout_fc=0.0, dropout=False))


def test_scanned_equals_sequential():
    cfg = _cfg()
    model = DCSNet(cfg.model, cfg.quirks)
    tx = make_optimizer(cfg.optim)
    K = 3
    rng = jax.random.PRNGKey(5)
    noisy = jax.random.normal(rng, (K, 2, CROP)) * 0.1
    clean = noisy * 0.8

    batch0 = S.batch_from_waves(noisy[0], clean[0], cfg)
    state = S.init_state(model, cfg, tx, KEY, batch0.noisy.abs())

    # sequential: K single steps with the same rng schedule the scan uses
    single = jax.jit(S.make_train_step(model, cfg, tx))
    rngs = jax.random.split(jax.random.PRNGKey(9), K)
    st_seq = state
    for i in range(K):
        b = S.batch_from_waves(noisy[i], clean[i], cfg)
        st_seq, m_seq = single(st_seq, b, rngs[i])

    scanned = jax.jit(S.make_scanned_train_step(model, cfg, tx, K))
    st_scan, m_scan = scanned(state, noisy, clean, jax.random.PRNGKey(9))

    np.testing.assert_allclose(float(m_scan["loss"]), float(m_seq["loss"]),
                               rtol=1e-5)
    # scan compiles one program vs K separate jits: fusion differences give
    # sub-update-size rounding (Adam update magnitude is lr=1e-4)
    for a, b in zip(jax.tree.leaves(st_seq.params),
                    jax.tree.leaves(st_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)
    assert int(st_scan.step) == K


def test_trainer_scanned_epoch_with_ragged_tail(tmp_path):
    from dcs_net_tpu.data import synthetic
    from dcs_net_tpu.data.dataset import Loader, VoiceBankDataset
    from dcs_net_tpu.data.partition import make_partition
    from dcs_net_tpu.train.loop import Trainer

    root = str(tmp_path)
    synthetic.generate(root, n_train=6, n_test=1, seconds=0.4)
    cfg = _cfg()
    cfg = cfg.replace(
        data=cfg.data.__class__(root=root, crop_samples=CROP, batch_size=2,
                                num_workers=1),
        run=cfg.run.__class__(max_epochs=1, steps_per_dispatch=2,
                              log_dir=str(tmp_path / "logs"),
                              num_sanity_val_steps=0))
    part = make_partition(cfg.data)
    loader = Loader(VoiceBankDataset(part["train"], cfg.data, "train"),
                    batch_size=2, shuffle=False, drop_last=False, num_workers=1)
    # 5 train utterances -> 3 batches (last ragged) -> 1 scanned dispatch + 1
    # ragged single dispatch
    trainer = Trainer(cfg, use_tensorboard=False)
    trainer.init_state()
    metrics = trainer.train_epoch(loader.epoch(0), 0)
    assert np.isfinite(metrics["loss"])
    assert int(trainer.state.step) == len(loader)
