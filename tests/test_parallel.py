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
    """DP over 8 devices == single device, on the loss and the GRADIENTS.

    Gradients (not post-Adam parameters) are the invariant: the partitioner
    turns the batch-contracting reductions (loss means; the conv engine's
    wgrad dots, which contract B*H*W in one f32 dot_general,
    ops/conv_engine.py:121-130) into per-device partials + psum — a
    different f32 summation order than the unsharded single dot. That
    reduction-order delta is bounded by ~sqrt(N)*eps_f32 relative to the
    leaf's gradient scale (N = batch*H*W summed elements), which the
    per-leaf tolerance below encodes with a 5x margin.

    The round-3 version of this test compared parameters AFTER one Adam
    step and went red: Adam's first-step update g/(|g|+eps) has slope up
    to 1/eps near g=0, so a ~1e-8 rounding delta on a near-zero gradient
    element moves a parameter by up to lr*1e-8/1e-6 = 1e-6 — past any
    tight tolerance, with no actual DP bug. (Post-Adam params are also a
    WEAK probe: the first-step update is nearly scale-invariant in g, so
    even a grad-scaling bug like a missing mean division would barely move
    them.) The full DP train step (Adam included) still compiles+runs in
    test_graft_dryrun_multichip below.
    """
    cfg = _cfg()
    model = DCSNet(cfg.model, cfg.quirks)
    tx = make_optimizer(cfg.optim)
    batch = _batch(cfg)
    state = S.init_state(model, cfg, tx, KEY, batch.noisy)
    grad_fn = S.make_loss_and_grads(model, cfg)
    rng = jax.random.PRNGKey(7)

    # single-device
    loss1, g1 = jax.jit(grad_fn)(state, batch, rng)

    # 8-device DP (dropout rng replicated => identical masks)
    mesh = pmesh.make_mesh(jax.devices()[:8])
    with mesh:
        sharded = pmesh.shard_batch(batch, mesh)
        state_r = jax.device_put(state, pmesh.replicated(mesh))
        repl = pmesh.replicated(mesh)
        data = pmesh.batch_sharding(mesh)
        loss8, g8 = jax.jit(
            grad_fn, in_shardings=(repl, data, repl),
            out_shardings=(repl, repl))(state_r, sharded, rng)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat8 = jax.tree.leaves(g8)
    assert len(flat1) == len(flat8) > 0
    # Tolerance theory (v3 — calibrated by bench/dp_delta_probe.py at this
    # exact config). The DP delta on a leaf is f32 summation-reassociation
    # noise ~ sqrt(N)*eps_f32 * S, where N = B*H*W summed contributions
    # (~3.3e4 here => sqrt(N)*eps ~ 2e-5) and S is the CONTRIBUTION scale,
    # not the leaf's own magnitude: bias/gamma/beta grads are cancelled
    # sums (dec5_convt.bias_i: value 1.9e-6, contributions ~1e-3, measured
    # DP delta 9.4e-6 — 5x the leaf, 1.5e-5 of its module scale). Within a
    # module every grad sums the same cotangents, and the kernel grad
    # (x-correlated, non-cancelling) exposes their scale — so the floor is
    # per-MODULE: 2e-4 * modmax (~10x margin over sqrt(N)*eps; measured
    # worst d/modmax = 7.3e-5 at initial_bn.gamma_ri), plus 2e-6 * gmax
    # for modules whose own scale is tiny. A real DP bug (wrong psum,
    # missing mean) moves signal-bearing leaves by O(1) of modmax and
    # still trips.
    gmax = max(float(np.abs(np.asarray(a)).max()) for _, a in flat1)
    mod_max = {}
    for path, a in flat1:
        mod = jax.tree_util.keystr(path).split("']")[0]
        mod_max[mod] = max(mod_max.get(mod, 0.0),
                           float(np.abs(np.asarray(a)).max()))
    for (path, a), b in zip(flat1, flat8):
        a, b = np.asarray(a), np.asarray(b)
        mod = jax.tree_util.keystr(path).split("']")[0]
        tol = 2e-4 * mod_max[mod] + 2e-6 * gmax
        np.testing.assert_allclose(
            b, a, rtol=0, atol=tol,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


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
