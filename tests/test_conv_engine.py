"""Parity of the shape-aware conv engine (ops/conv_engine.py) and the Pallas
tap-packed kernel (ops/pallas_conv.py, interpret mode) against
lax.conv_general_dilated, forward AND both gradients.

Shapes mirror the degenerate layers the engine exists for: the dec6 convT
(32->2 k3), the CBAM spatial-attention conv (4->2 k7), and the real-variant
dec6 (16->1 k3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcs_net_tpu.ops import conv_engine as ce

SHAPES = [
    # (B, H, W, Cin), Cout, K   — all stride-1 'same'
    ((2, 32, 24, 32), 2, 3),   # dec6-class
    ((2, 24, 16, 4), 2, 7),    # spatial-attention-class
    ((2, 16, 16, 16), 1, 3),   # real dec6
    ((1, 8, 8, 3), 5, 5),      # odd sizes
]


def _ref_conv(x, w):
    p = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _data(shape, cout, k, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(
        (k, k, shape[-1], cout)).astype(np.float32) * 0.1)
    return x, w


def test_patch_feature_order():
    """_patches orders features TAP-major — index (kh*K + kw)*C + c — the
    layout _dgrad_patchdot/_wgrad_patchdot rely on."""
    x = jnp.arange(2 * 5 * 6 * 3, dtype=jnp.float32).reshape(2, 5, 6, 3)
    K = 3
    p = ce._patches(x, K)
    assert p.shape == (2, 5, 6, 3 * K * K)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for c in range(3):
        for kh in range(K):
            for kw in range(K):
                feat = (kh * K + kw) * 3 + c
                np.testing.assert_array_equal(
                    np.asarray(p[0, 2, 3, feat]),
                    np.asarray(xp[0, 2 + kh, 3 + kw, c]))


@pytest.mark.parametrize("shape,cout,k", SHAPES)
def test_forward_parity(shape, cout, k):
    x, w = _data(shape, cout, k)
    assert ce.use_tuned(k, (1, 1), k // 2, cout)
    got = ce.conv2d_same_tuned(x, w)
    ref = _ref_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,cout,k", SHAPES)
def test_gradient_parity(shape, cout, k):
    x, w = _data(shape, cout, k, seed=1)
    cot = jnp.asarray(np.random.default_rng(2).standard_normal(
        _ref_conv(x, w).shape).astype(np.float32))

    def f_tuned(x, w):
        return jnp.sum(ce.conv2d_same_tuned(x, w) * cot)

    def f_ref(x, w):
        return jnp.sum(_ref_conv(x, w) * cot)

    gx, gw = jax.grad(f_tuned, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)


def test_gradient_parity_bf16():
    """The production path feeds bf16 operands; gradients must be well-typed
    (bf16 cotangents back) and close to the f32 oracle at bf16 tolerance."""
    x, w = _data((2, 16, 16, 8), 2, 3, seed=3)
    xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)

    def f(a, b):
        return jnp.sum(ce.conv2d_same_tuned(a, b).astype(jnp.float32))

    gx, gw = jax.grad(f, argnums=(0, 1))(xb, wb)
    assert gx.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16
    rx, rw = jax.grad(lambda a, b: jnp.sum(_ref_conv(a, b)), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx, np.float32), np.asarray(rx),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(gw, np.float32), np.asarray(rw),
                               rtol=0.05, atol=0.5)


def test_use_tuned_predicate():
    assert ce.use_tuned(3, (1, 1), 1, 2)
    assert ce.use_tuned(7, (1, 1), 3, 2)        # 98 lanes
    assert ce.use_tuned(3, (1, 1), 1, 16)       # 144 lanes (dec5-class)
    assert not ce.use_tuned(3, (1, 1), 1, 32)   # 288 lanes
    assert not ce.use_tuned(3, (2, 1), 1, 2)    # strided
    assert not ce.use_tuned(1, (1, 1), 0, 2)    # 1x1 is already a dot
    assert not ce.use_tuned(3, (1, 1), 0, 2)    # not 'same'
    assert not ce.use_tuned(4, (1, 1), 2, 2)    # even kernel


def test_dispatch_wrapper_matches_xla():
    """ce.conv2d == lax conv for tuned AND untuned shapes."""
    for shape, cout, k, stride in [((2, 16, 16, 8), 2, 3, (1, 1)),
                                   ((2, 16, 16, 8), 32, 3, (1, 1)),
                                   ((2, 32, 32, 4), 16, 7, (2, 2))]:
        x, w = _data(shape, cout, k, seed=4)
        p = k // 2
        got = ce.conv2d(x, w, stride, p)
        ref = jax.lax.conv_general_dilated(
            x, w, stride, ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


# ---- Pallas kernel (interpret mode on CPU) --------------------------------

def test_pallas_forward_interpret_parity():
    from dcs_net_tpu.ops.pallas_conv import _conv_fwd_pallas

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 2)).astype(np.float32) * .1)
    b = jnp.asarray(rng.standard_normal((2,)).astype(np.float32))
    got = _conv_fwd_pallas(x, w, b, interpret=True)
    ref = _ref_conv(x, w) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_vjp_components():
    """conv2d_same_small_cout's hand-written bwd (XLA dgrad/wgrad convs)
    against autodiff of the reference conv."""
    from dcs_net_tpu.ops.pallas_conv import _dgrad, _wgrad

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 2)).astype(np.float32) * .1)
    g = jnp.asarray(rng.standard_normal((2, 16, 16, 2)).astype(np.float32))
    rx, rw = jax.vjp(lambda a, b: _ref_conv(a, b), x, w)[1](g)
    np.testing.assert_allclose(np.asarray(_dgrad(g, w)), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(_wgrad(g, x, 3)), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)


# ---- strided conv with phase-decomposed dgrad ------------------------------

STRIDED = [
    # (B, H, W, Cin), Cout, K, stride — enc0/enc1-class shapes
    ((2, 32, 32, 2), 16, 7, (2, 2)),
    ((2, 32, 24, 2), 8, 7, (2, 1)),
    ((2, 16, 16, 4), 8, 5, (2, 2)),
    ((1, 15, 13, 2), 6, 3, (2, 2)),   # H, W not divisible by stride
    ((2, 16, 16, 3), 8, 3, (2, 1)),
]


@pytest.mark.parametrize("shape,cout,k,stride", STRIDED)
def test_strided_gradient_parity(shape, cout, k, stride):
    x, w = _data(shape, cout, k, seed=7)
    p = k // 2
    assert ce.use_tuned_strided(k, stride, p, shape[-1], cout)

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, stride, ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    cot = jnp.asarray(np.random.default_rng(8).standard_normal(
        ref(x, w).shape).astype(np.float32))

    def f_tuned(x, w):
        return jnp.sum(ce.conv2d_strided_tuned(x, w, stride, p) * cot)

    def f_ref(x, w):
        return jnp.sum(ref(x, w) * cot)

    np.testing.assert_allclose(
        np.asarray(ce.conv2d_strided_tuned(x, w, stride, p)),
        np.asarray(ref(x, w)), rtol=1e-4, atol=1e-4)
    gx, gw = jax.grad(f_tuned, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)


# ---- multi-input (channel-concat-free) and fused-upsample paths -------------

MULTI = [
    # cins, cout, K, stride — complex-conv plane classes
    ((1, 1), 2, 7, (2, 2)),    # enc0 per-plane (strided multi)
    ((2, 2), 1, 7, (1, 1)),    # SA conv class (same-tuned multi)
    ((3, 4), 6, 3, (1, 1)),    # dec-class small cout
    ((8, 8), 16, 5, (2, 1)),   # XLA-fallback sum
]


@pytest.mark.parametrize("cins,cout,k,stride", MULTI)
def test_conv2d_multi_parity(cins, cout, k, stride):
    rng = np.random.default_rng(11)
    p = k // 2
    B, H, W = 2, 14, 11
    xs = tuple(jnp.asarray(rng.standard_normal((B, H, W, c))
                           .astype(np.float32)) for c in cins)
    ws = tuple(jnp.asarray(rng.standard_normal((k, k, c, cout))
                           .astype(np.float32)) * 0.2 for c in cins)

    def ref(*args):
        n = len(args) // 2
        y = None
        for x, w in zip(args[:n], args[n:]):
            yj = jax.lax.conv_general_dilated(
                x, w, stride, ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = yj if y is None else y + yj
        return y

    def mul(*args):
        n = len(args) // 2
        return ce.conv2d_multi(args[:n], args[n:], stride, p)

    args = xs + ws
    np.testing.assert_allclose(np.asarray(mul(*args)), np.asarray(ref(*args)),
                               rtol=1e-4, atol=1e-4)
    ga = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                  argnums=tuple(range(len(args))))(*args)
    gb = jax.grad(lambda *a: jnp.sum(jnp.sin(mul(*a))),
                  argnums=tuple(range(len(args))))(*args)
    for u, v in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(v), np.asarray(u),
                                   rtol=1e-4, atol=1e-4)


UPSAMPLED = [
    # cins, cout, scale — decoder stage classes (K=3 throughout the family)
    ((3, 4), 6, (2, 2)),     # small-cout dot path
    ((3, 4), 6, (2, 1)),
    ((2, 2), 40, (2, 2)),    # per-phase conv fallback (ndh*ndw*cout > 144)
    ((5,), 4, (1, 1)),       # degenerate scale == plain same conv
]


@pytest.mark.parametrize("cins,cout,scale", UPSAMPLED)
def test_upsampled_conv2d_multi_parity(cins, cout, scale):
    rng = np.random.default_rng(12)
    K, p = 3, 1
    B, H, W = 2, 9, 7
    xs = tuple(jnp.asarray(rng.standard_normal((B, H, W, c))
                           .astype(np.float32)) for c in cins)
    ws = tuple(jnp.asarray(rng.standard_normal((K, K, c, cout))
                           .astype(np.float32)) * 0.2 for c in cins)
    sh, sw = scale

    def ref(*args):
        n = len(args) // 2
        x = jnp.concatenate(args[:n], -1)
        x = jnp.repeat(jnp.repeat(x, sh, 1), sw, 2)
        w = jnp.concatenate(args[n:], 2)
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def fus(*args):
        n = len(args) // 2
        return ce.upsampled_conv2d_multi(args[:n], args[n:], scale)

    args = xs + ws
    np.testing.assert_allclose(np.asarray(fus(*args)), np.asarray(ref(*args)),
                               rtol=1e-4, atol=1e-4)
    ga = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                  argnums=tuple(range(len(args))))(*args)
    gb = jax.grad(lambda *a: jnp.sum(jnp.sin(fus(*a))),
                  argnums=tuple(range(len(args))))(*args)
    for u, v in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(v), np.asarray(u),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cins,cout,scale", UPSAMPLED)
def test_upsampled_unified_flag_parity(cins, cout, scale, monkeypatch):
    """The gated-off unified one-dot formulation (ce.UNIFIED_UPDOT) stays
    correct — it is kept as the measured A/B record (BASELINE.md round 4)."""
    monkeypatch.setattr(ce, "UNIFIED_UPDOT", True)
    test_upsampled_conv2d_multi_parity(cins, cout, scale)


@pytest.mark.parametrize("shape,cout,k,stride", STRIDED)
def test_strided_patchdot_flag_parity(shape, cout, k, stride, monkeypatch):
    """The gated-off strided patch-dot forward (ce.STRIDED_PATCHDOT) stays
    correct — kept as the measured A/B record (BASELINE.md round 4)."""
    monkeypatch.setattr(ce, "STRIDED_PATCHDOT", True)
    test_strided_gradient_parity(shape, cout, k, stride)


@pytest.mark.parametrize("mode", ["rowdot", "patchdot"])
def test_same_bwd_modes_parity(mode, monkeypatch):
    """Both conv2d_same_tuned backward implementations (row-dot wgrad vs
    shared-patches) stay correct; the product default is chosen by the
    batch-128 stage A/B (BASELINE.md round 4)."""
    monkeypatch.setattr(ce, "SAME_BWD", mode)
    for shape, cout, k in [((2, 9, 8, 4), 2, 7), ((2, 8, 8, 2), 1, 7),
                           ((2, 10, 7, 3), 2, 3)]:
        test_gradient_parity(shape, cout, k)


@pytest.mark.parametrize("shape,cout,k,stride", [
    ((2, 12, 12, 2), 6, 7, (2, 2)),
    ((2, 11, 9, 3), 4, 5, (2, 1)),
    ((2, 8, 9, 4), 5, 3, (2, 2)),
    ((2, 13, 10, 5), 4, 7, (2, 1)),
])
def test_strided_s2d_parity(shape, cout, k, stride):
    """conv2d_strided_s2d (space-to-depth + folded stride-1 conv) matches
    XLA's strided conv in forward and both gradients."""
    x, w = _data(shape, cout, k, seed=9)
    p = k // 2

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, stride, ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def s2d(x, w):
        return ce.conv2d_strided_s2d(x, w, stride, p)

    np.testing.assert_allclose(np.asarray(s2d(x, w)), np.asarray(ref(x, w)),
                               rtol=1e-4, atol=1e-4)
    ga = jax.grad(lambda x, w: jnp.sum(jnp.sin(ref(x, w))), (0, 1))(x, w)
    gb = jax.grad(lambda x, w: jnp.sum(jnp.sin(s2d(x, w))), (0, 1))(x, w)
    for u, v in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(v), np.asarray(u),
                                   rtol=1e-4, atol=1e-4)


def test_conv2d_dispatch_strided_mode(monkeypatch):
    """The conv2d dispatcher agrees with XLA under both STRIDED_MODE values."""
    x, w = _data((2, 12, 12, 3), 6, 5, seed=11)
    p = 2
    want = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    for mode in ("s2d", "phase"):
        monkeypatch.setattr(ce, "STRIDED_MODE", mode)
        np.testing.assert_allclose(
            np.asarray(ce.conv2d(x, w, (2, 2), p)), np.asarray(want),
            rtol=1e-4, atol=1e-4)


def test_s2d_exact_x64():
    """conv2d_strided_s2d is an EXACT reformulation of the strided conv:
    under float64 the forward and both plain-AD gradients agree with
    lax.conv_general_dilated to ~1e-15 relative at every product encoder
    shape. This pins that the composed-oracle drift seen in f32
    (test_model_oracle_complex) is reassociation noise, not a geometry or
    math bug (round-5 probe, bench/s2d_x64_probe.py)."""
    shapes = [  # (H, W, cin, cout, K, stride) — encoder schedule
        (64, 32, 2, 8, 7, (2, 2)),
        (32, 16, 8, 16, 7, (2, 2)),
        (16, 16, 16, 16, 5, (2, 1)),
        (8, 8, 16, 16, 3, (2, 1)),
    ]
    with jax.enable_x64():
        key = jax.random.PRNGKey(0)
        for H, W, cin, cout, K, stride in shapes:
            k1, k2, key = jax.random.split(key, 3)
            x = jax.random.normal(k1, (2, H, W, cin), jnp.float64)
            w = jax.random.normal(k2, (K, K, cin, cout), jnp.float64)
            p = K // 2

            def ref_loss(x, w):
                y = jax.lax.conv_general_dilated(
                    x, w, stride, ((p, p), (p, p)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.sum(jnp.sin(y))

            def s2d_loss(x, w):
                return jnp.sum(jnp.sin(
                    ce.conv2d_strided_s2d(x, w, stride, p)))

            yr = jax.lax.conv_general_dilated(
                x, w, stride, ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            ys = ce.conv2d_strided_s2d(x, w, stride, p)
            np.testing.assert_allclose(np.asarray(ys), np.asarray(yr),
                                       rtol=1e-12, atol=1e-12)
            gr = jax.grad(ref_loss, (0, 1))(x, w)
            gs = jax.grad(s2d_loss, (0, 1))(x, w)
            for u, v in zip(gr, gs):
                np.testing.assert_allclose(np.asarray(v), np.asarray(u),
                                           rtol=1e-12, atol=1e-12)


def test_conv2d_multi_strided_mode_dispatch(monkeypatch):
    """conv2d_multi routes strided multi-input convs consistently with
    conv2d's STRIDED_MODE: under 's2d' the per-input s2d convs sum to the
    channel-concat conv exactly (grad-checked); 'phase' keeps the r3 path."""
    xs = [_data((2, 12, 12, c), 6, 5, seed=20 + c)[0] for c in (3, 2)]
    ws = [_data((2, 12, 12, c), 6, 5, seed=30 + c)[1] for c in (3, 2)]
    p = 2
    xcat = jnp.concatenate(xs, axis=-1)
    wcat = jnp.concatenate(ws, axis=2)
    want = jax.lax.conv_general_dilated(
        xcat, wcat, (2, 2), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    for mode in ("s2d", "phase"):
        monkeypatch.setattr(ce, "STRIDED_MODE", mode)
        got = ce.conv2d_multi(xs, ws, (2, 2), p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        g = jax.grad(lambda *a: jnp.sum(jnp.sin(
            ce.conv2d_multi(a[:2], a[2:], (2, 2), p))), (0, 1, 2, 3))(
                *xs, *ws)
        gr = jax.grad(lambda xc, wc: jnp.sum(jnp.sin(
            jax.lax.conv_general_dilated(
                xc, wc, (2, 2), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))), (0, 1))(
                    xcat, wcat)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate(g[:2], axis=-1)), np.asarray(gr[0]),
            rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate(g[2:], axis=2)), np.asarray(gr[1]),
            rtol=1e-4, atol=1e-4)
