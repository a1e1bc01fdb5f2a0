"""Complex tensors as (real, imag) pairs of real arrays.

TPU-first design decision: XLA:TPU lowers complex64 poorly (no MXU mapping),
so every "complex" tensor in this framework is a :class:`CArray` — a pytree of
two real arrays. Complex ops (conv/BN/LSTM/attention) are then expressed as
real MXU/VPU ops over packed channels; see dcs_net_tpu.ops.

This replaces torch complex dtypes used throughout the reference
(/root/reference/data.py:117, c_network.py, network_functions.py:62-96).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple, Union

import jax.numpy as jnp

Array = Any


class CArray(NamedTuple):
    """A complex tensor stored as two real arrays (a pytree by construction)."""

    re: Array
    im: Array

    # -- shape/dtype --------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        return self.re.shape

    @property
    def ndim(self) -> int:
        return self.re.ndim

    @property
    def dtype(self):
        return self.re.dtype

    def astype(self, dtype) -> "CArray":
        return CArray(self.re.astype(dtype), self.im.astype(dtype))

    def reshape(self, *shape) -> "CArray":
        return CArray(self.re.reshape(*shape), self.im.reshape(*shape))

    def transpose(self, *axes) -> "CArray":
        return CArray(self.re.transpose(*axes), self.im.transpose(*axes))

    def __getitem__(self, idx) -> "CArray":
        return CArray(self.re[idx], self.im[idx])

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, other: Union["CArray", Array]) -> "CArray":
        if isinstance(other, CArray):
            return CArray(self.re + other.re, self.im + other.im)
        return CArray(self.re + other, self.im)

    def __sub__(self, other: Union["CArray", Array]) -> "CArray":
        if isinstance(other, CArray):
            return CArray(self.re - other.re, self.im - other.im)
        return CArray(self.re - other, self.im)

    def __mul__(self, other: Union["CArray", Array]) -> "CArray":
        if isinstance(other, CArray):
            # (a+bi)(c+di) = (ac - bd) + (ad + bc)i
            # == complex_mat_mult semantics (/root/reference/network_functions.py:90-96)
            return CArray(
                self.re * other.re - self.im * other.im,
                self.re * other.im + self.im * other.re,
            )
        return CArray(self.re * other, self.im * other)

    __rmul__ = __mul__

    def __neg__(self) -> "CArray":
        return CArray(-self.re, -self.im)

    def conj(self) -> "CArray":
        return CArray(self.re, -self.im)

    # -- polar --------------------------------------------------------------
    def abs(self) -> Array:
        """|z| with torch's subgradient convention at z == 0.

        The naive sqrt(re^2 + im^2) has a NaN GRADIENT at exactly (0, 0)
        (d sqrt(0) = inf, times zero cotangent). torch defines
        abs'(0) = sgn(0) = 0 for complex tensors, and the reference trains
        through abs of values that ARE exactly zero: ComplexDropout zeroes
        re and im independently (c_network.py:195-204), so ~rate^2 of the
        network-output elements hit (0, 0) every train step before the
        bound_crm |M| (network_functions.py:77-88). Root cause of the
        round-5 soak finding that every dcs train step NaN-gated (finite
        loss, all-NaN grads — bench/nan_probe.py). The double-where keeps
        the forward bit-identical and pins the zero-measure gradient to
        torch's 0."""
        h2 = self.re * self.re + self.im * self.im
        nz = h2 > 0
        return jnp.where(nz, jnp.sqrt(jnp.where(nz, h2, 1.0)), 0.0)

    def abs2(self) -> Array:
        return self.re * self.re + self.im * self.im

    def angle(self, eps: float = 0.0) -> Array:
        """atan2(im, re + eps) — the reference's epsilon-shifted phase
        (/root/reference/network_functions.py:214 etc.)."""
        return jnp.arctan2(self.im, self.re + eps)

    # -- conversions --------------------------------------------------------
    @staticmethod
    def from_polar(mag: Array, phase: Array) -> "CArray":
        return CArray(mag * jnp.cos(phase), mag * jnp.sin(phase))

    @staticmethod
    def from_complex(z: Array) -> "CArray":
        return CArray(jnp.real(z), jnp.imag(z))

    def to_complex(self) -> Array:
        return jnp.asarray(self.re) + 1j * jnp.asarray(self.im)

    @staticmethod
    def zeros(shape, dtype=jnp.float32) -> "CArray":
        return CArray(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def pack_channels(self, axis: int = -1) -> Array:
        """Concatenate [re, im] along `axis` (the MXU lane-packing layout)."""
        return jnp.concatenate([self.re, self.im], axis=axis)

    @staticmethod
    def unpack_channels(x: Array, axis: int = -1) -> "CArray":
        re, im = jnp.split(x, 2, axis=axis)
        return CArray(re, im)


def as_carray(x: Union[CArray, Array]) -> CArray:
    if isinstance(x, CArray):
        return x
    if jnp.iscomplexobj(x):
        return CArray.from_complex(x)
    return CArray(x, jnp.zeros_like(x))
