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

    The atan2/cos/sin round trips are evaluated in rational form via the
    exact identities cos(atan2(b, a)) = a/hypot(a, b) and
    sin(atan2(b, a)) = b/hypot(a, b): six transcendentals per element (and
    their AD duals) become two rsqrts — the mask bound runs at full
    spectrogram resolution on four tensors per step (target, prediction,
    double-bound, network output) and profiled as one of the larger
    elementwise fusions. At (a, b) == (0, 0) — only hit when M.re == -eps and
    M.im == 0 exactly — atan2 defines the angle as 0 (cos 1, sin 0); the
    guarded rational form yields 0 instead of tanh(|M|) ~ 1e-6 there, far
    inside the test tolerances on a measure-zero set.
    """
    mag_t = jnp.tanh(M.abs())

    def unit(a, b):  # (cos, sin) of atan2(b, a), rational
        h2 = a * a + b * b
        inv = jnp.where(h2 > 0, jax.lax.rsqrt(jnp.where(h2 > 0, h2, 1.0)), 0.0)
        return a * inv, b * inv

    c1, s1 = unit(M.re + atan2_eps, M.im)
    re1 = mag_t * c1
    im1 = mag_t * s1
    c2, s2 = unit(re1 + atan2_eps, im1)
    return CArray(mag_t * c2, mag_t * s2)


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

