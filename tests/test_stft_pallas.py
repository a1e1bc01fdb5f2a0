"""Pallas STFT kernel vs the XLA reference implementation (interpret mode on
CPU; the compiled path runs on real TPU via bench/enhance)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcs_net_tpu.core.config import STFTConfig
from dcs_net_tpu.dsp import stft as ref
from dcs_net_tpu.dsp.stft_pallas import stft_pallas

CFG = STFTConfig()


def test_forward_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((2, 8160)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        want = ref.stft(x, CFG)
        got = stft_pallas(x, CFG, True)  # interpret mode
    assert got.shape == want.shape == (2, 256, 256)
    np.testing.assert_allclose(np.asarray(got.re), np.asarray(want.re), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.im), np.asarray(want.im), atol=2e-4)


def test_forward_partial_tile(rng):
    """A frame count that is not a FRAME_TILE multiple pads then trims."""
    x = jnp.asarray(rng.standard_normal((1, 2016)).astype(np.float32))  # 64 frames
    with jax.default_matmul_precision("highest"):
        want = ref.stft(x, CFG)
        got = stft_pallas(x, CFG, True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got.re), np.asarray(want.re), atol=2e-4)


def test_gradient_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((2016,)).astype(np.float32))

    def loss_p(v):
        s = stft_pallas(v, CFG, True)
        return jnp.sum(s.re ** 2 + 0.5 * s.im ** 2)

    def loss_r(v):
        s = ref.stft(v, CFG)
        return jnp.sum(s.re ** 2 + 0.5 * s.im ** 2)

    with jax.default_matmul_precision("highest"):
        gp = jax.grad(loss_p)(x)
        gr = jax.grad(loss_r)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=1e-3, atol=2e-3)
