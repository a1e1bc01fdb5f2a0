"""Data-parallel sharding over a virtual 8-device CPU mesh.

Validates the SPMD contract the driver exercises via dryrun_multichip: state
replicated, batch sharded, gradient all-reduce equivalence with single-device
execution.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.models.unet import DCSNet
from dcs_net_tpu.parallel import mesh as pmesh
from dcs_net_tpu.train import steps as S
from dcs_net_tpu.train.optim import make_optimizer

KEY = jax.random.PRNGKey(0)
CROP = 2016  # T = 64 frames (stride-aligned)
TINY_CHANNELS = (1, 2, 2, 4, 4, 8, 8, 8)


def _cfg():
    cfg = config_for_variant("dcs")
    return cfg.replace(
        data=cfg.data.__class__(crop_samples=CROP, batch_size=8),
        model=cfg.model.__class__(
            complex_valued=True, subtractive=True,
            channels=TINY_CHANNELS, ca_reduction=2))


def _batch(cfg, n=8):
    clean = jax.random.normal(KEY, (n, CROP)) * 0.1
    noise = jax.random.normal(jax.random.PRNGKey(1), (n, CROP)) * 0.02
    return S.batch_from_waves(clean + noise, clean, cfg)


def test_eight_devices_available():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"


def test_dp_step_matches_single_device():
    """One DP step over 8 devices == the same step on one device."""
    cfg = _cfg()
    model = DCSNet(cfg.model, cfg.quirks)
    tx = make_optimizer(cfg.optim)
    batch = _batch(cfg)
    state = S.init_state(model, cfg, tx, KEY, batch.noisy)

    # single-device
    step1 = jax.jit(S.make_train_step(model, cfg, tx))
    s1, m1 = step1(state, batch, jax.random.PRNGKey(7))

    # 8-device DP (dropout rng identical => same masks since shapes match)
    cfg_nodrop = cfg  # dropout rng is replicated; masks identical across runs
    mesh = pmesh.make_mesh(jax.devices()[:8])
    with mesh:
        sharded = pmesh.shard_batch(batch, mesh)
        state_r = jax.device_put(state, pmesh.replicated(mesh))
        step8 = pmesh.make_dp_train_step(model, cfg_nodrop, tx, mesh)
        s8, m8 = step8(state_r, sharded, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    leaves1 = jax.tree.leaves(s1.params)
    leaves8 = jax.tree.leaves(s8.params)
    for a, b in zip(leaves1, leaves8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6)


def test_shard_batch_places_on_mesh():
    cfg = _cfg()
    batch = _batch(cfg)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    sharded = pmesh.shard_batch(batch, mesh)
    leaf = sharded.noisy.re
    assert len(leaf.sharding.device_set) == 8
    # each device holds B/8 utterances
    shard_shape = leaf.sharding.shard_shape(leaf.shape)
    assert shard_shape[0] == 1


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
