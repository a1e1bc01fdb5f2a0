"""Direct unit tests for ops/widen.py (VERDICT r3 weak #7).

The lane-merge helpers were previously covered only transitively through
layer parity tests; a wrong branch in bcast_merge's shape dispatch would
surface as a confusing model-level diff. These pin each helper against the
naive unmerged computation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dcs_net_tpu.ops import widen


SHAPES = [(2, 8, 6, 4), (3, 5, 7, 2), (2, 4, 4, 1)]


def _x(rng, shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def test_should_widen():
    assert widen.should_widen((2, 8, 8, 4))
    assert widen.should_widen((2, 8, 8, 127))
    assert not widen.should_widen((2, 8, 8, 128))
    assert not widen.should_widen((2, 8, 8))  # only rank-4 merges


@pytest.mark.parametrize("shape", SHAPES)
def test_merge_unmerge_roundtrip(rng, shape):
    x = _x(rng, shape)
    m = widen.merge(x)
    assert m.shape == (shape[0], shape[1], shape[2] * shape[3])
    np.testing.assert_array_equal(np.asarray(widen.unmerge(m, shape[-1])),
                                  np.asarray(x))
    # merged layout is (w-major, c-minor): element (b,h,w,c) -> (b,h,w*C+c)
    b, h, w, c = 0, 1, 2, shape[-1] - 1
    assert float(m[b, h, w * shape[-1] + c]) == float(x[b, h, w, c])


@pytest.mark.parametrize("shape", SHAPES)
def test_widened_matches_plain(rng, shape):
    x = _x(rng, shape)
    y = _x(rng, shape)
    out = widen.widened(lambda a, b: jnp.maximum(a, 0) + 2 * b, x, y)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.maximum(x, 0) + 2 * y))


def test_widened_passthrough_wide_channels(rng):
    x = _x(rng, (2, 4, 4, 128))  # C >= lane width: no merge
    out = widen.widened(lambda a: a * 3, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x * 3))


@pytest.mark.parametrize("shape", SHAPES)
def test_tile_channel_lane_pattern(rng, shape):
    _, _, w, c = shape
    v = jnp.asarray(rng.standard_normal(c), jnp.float32)
    t = widen.tile_channel(v, w)
    assert t.shape == (w * c,)
    # period-C pattern matching merge()'s (w-major, c-minor) layout
    np.testing.assert_array_equal(np.asarray(t.reshape(w, c)),
                                  np.tile(np.asarray(v), (w, 1)))


@pytest.mark.parametrize("shape", SHAPES)
def test_bcast_merge_channel_branch(rng, shape):
    """(B, 1, 1, C) channel-attention factor."""
    b, h, w, c = shape
    x = _x(rng, shape)
    a = _x(rng, (b, 1, 1, c))
    got = widen.unmerge(widen.merge(x) * widen.bcast_merge(a, x.shape), c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x * a), rtol=1e-6)


@pytest.mark.parametrize("shape", SHAPES)
def test_bcast_merge_spatial_branch(rng, shape):
    """(B, H, W, 1) spatial-attention factor."""
    b, h, w, c = shape
    x = _x(rng, shape)
    a = _x(rng, (b, h, w, 1))
    got = widen.unmerge(widen.merge(x) * widen.bcast_merge(a, x.shape), c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x * a), rtol=1e-6)


def test_bcast_merge_ambiguous_shape_prefers_channel(rng):
    """When H=W=C=1 both patterns match; the channel branch fires first and
    is correct (both reduce to a scalar per batch)."""
    x = _x(rng, (2, 1, 1, 1))
    a = _x(rng, (2, 1, 1, 1))
    got = widen.unmerge(widen.merge(x) * widen.bcast_merge(a, x.shape), 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x * a))


def test_bcast_merge_rejects_unknown_shape(rng):
    x = _x(rng, (2, 4, 6, 3))
    with pytest.raises(ValueError):
        widen.bcast_merge(_x(rng, (2, 4, 1, 3)), x.shape)


@pytest.mark.parametrize("shape", SHAPES + [(2, 3, 5, 3)])
def test_mul_bcast_both_factor_kinds(rng, shape):
    b, h, w, c = shape
    x = _x(rng, shape)
    for fshape in [(b, 1, 1, c), (b, h, w, 1)]:
        a = _x(rng, fshape)
        np.testing.assert_allclose(np.asarray(widen.mul_bcast(x, a)),
                                   np.asarray(x * a), rtol=1e-6)


@pytest.mark.parametrize("shape", SHAPES + [(3, 2, 9, 5)])
def test_channel_sums_matches_naive_mean(rng, shape):
    """channel_sums == naive per-channel mean, including non-divisible
    W*C vs lane-width shapes (exactness is claimed — both stages are plain
    equal-weight sums — so compare tightly)."""
    x = _x(rng, shape)
    mean, sqmean = widen.channel_sums(
        x, [lambda v: v, lambda v: jnp.square(v)])
    np.testing.assert_allclose(np.asarray(mean),
                               np.asarray(jnp.mean(x, axis=(0, 1, 2))),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(sqmean),
        np.asarray(jnp.mean(jnp.square(x), axis=(0, 1, 2))),
        rtol=1e-6, atol=1e-7)
