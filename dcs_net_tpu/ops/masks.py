"""Complex ratio-mask math (reference C9: /root/reference/network_functions.py:62-96).

All ops are elementwise VPU work on CArray (re, im) pairs; XLA fuses them into
the surrounding matmul epilogues.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dcs_net_tpu.utils.carray import CArray


def crm(S: CArray, Y: CArray, eps: float = 1e-8) -> CArray:
    """Complex ratio mask M = (Y* . S) / (|Y|^2 + eps), component-wise.

    S: target spectrogram, Y: noisy spectrogram
    (/root/reference/network_functions.py:62-75). Note the reference adds eps
    to the denominator of each component separately — identical here since the
    denominator is shared.
    """
    denom = Y.re * Y.re + Y.im * Y.im + eps
    m_re = (Y.re * S.re + Y.im * S.im) / denom
    m_im = (Y.re * S.im - Y.im * S.re) / denom
    return CArray(m_re, m_im)


def bound_crm(M: CArray, atan2_eps: float) -> CArray:
    """tanh-compress the magnitude, preserve (eps-shifted) phase.

    Reproduces /root/reference/network_functions.py:77-88 exactly, including
    the double atan2 round-trip: phase is computed as
    atan2(tanh(|M|) sin(theta), tanh(|M|) cos(theta) + eps) where
    theta = atan2(M.im, M.re + eps). The eps shifts make this NOT idempotent,
    which matters because the reference bounds the network output twice
    (Quirks.double_bound_mask).
    """
    mag_t = jnp.tanh(M.abs())
    theta = jnp.arctan2(M.im, M.re + atan2_eps)
    re1 = mag_t * jnp.cos(theta)
    im1 = mag_t * jnp.sin(theta)
    phase = jnp.arctan2(im1, re1 + atan2_eps)
    return CArray(mag_t * jnp.cos(phase), mag_t * jnp.sin(phase))


def complex_mat_mult(A: CArray, B: CArray) -> CArray:
    """Elementwise complex multiply (/root/reference/network_functions.py:90-96)."""
    return A * B


def real_subtractive_target(noise_mag: jnp.ndarray, noisy_mag: jnp.ndarray) -> jnp.ndarray:
    """sigmoid(|N| / |Y|) — the real-path target mask
    (/root/reference/network_functions.py:225). Division is unguarded in the
    reference; |Y| > 0 a.e. for real audio, and sigmoid(inf) saturates to 1."""
    return jax.nn.sigmoid(noise_mag / noisy_mag)


def check_finite(x, name: str = "tensor") -> None:
    """Host-side NaN/Inf tripwire (reference C7,
    /root/reference/network_functions.py:15-22). Call outside jit on concrete
    arrays; inside jit use train.debug.nan_guard."""
    import numpy as np

    arrs = [x.re, x.im] if isinstance(x, CArray) else [x]
    for a in arrs:
        a = np.asarray(a)
        if not np.all(np.isfinite(a)):
            raise FloatingPointError(f"Found inf/-inf/nan in {name}")

