"""Pallas TPU kernel: VMEM-resident tap-accumulated stride-1 VALID conv.

The decoder's fused upsample+conv stages reduce (ops/conv_engine.py,
upsampled_conv2d_multi) to ONE stride-1 VALID correlation

    y[b, h, w, n] = sum_{dh, dw, ci} x[b, h+dh, w+dw, ci] * w[(dh, dw), ci, n]

with a small D x D unified tap window, Cin in the hundreds and N = lanes up
to 128+. The XLA formulation materializes the D*D*Cin patch tensor Q in HBM
(dec5: 226 MB/step written + read twice more in the VJP); at these shapes
one batch element's x slab AND its f32 accumulator fit VMEM comfortably
(<= ~3 MB of the ~16 MB/core), so this kernel grids over the batch, DMAs
each x[b] in once, runs the D*D tap dots MXU-side from VMEM, and writes y[b]
once: HBM traffic collapses to exactly read-x + write-y.

Forward-only: conv_engine wraps it in a custom_vjp whose backward runs the
XLA dot formulations (the backward is a different contraction pattern;
measured costs there are attacked separately).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-core VMEM is ~16 MB; leave headroom for double-buffered pipelining of
# the x/y blocks plus the weight block
_VMEM_BUDGET = 10 * 1024 * 1024


def _bytes(shape, dtype):
    n = 1
    for s in shape:
        n *= s
    return n * jnp.dtype(dtype).itemsize


def tapconv_applicable(x_shape, w_shape, interpret: bool = False,
                       x_dtype=jnp.bfloat16, w_dtype=jnp.bfloat16) -> bool:
    """Static gate: one batch element's working set fits VMEM and the lane
    dims are healthy MXU shapes. x (B, Hp, Wp, Cin); w (Dh*Dw, Cin, N).
    Pass the REAL operand dtypes — f32 operands double the x/w footprints
    vs the bf16 default (advisor r4)."""
    if len(x_shape) != 4 or len(w_shape) != 3:
        return False
    b, hp, wp, cin = x_shape
    taps, cin_w, n = w_shape
    if cin != cin_w:
        return False
    # per-tap contraction must be deep enough that tap-looped dots beat the
    # XLA patch-dot's HBM round-trips (M/8-cycle MXU row rate makes shallow
    # Cin tap loops M-bound — measured; see conv_engine gating rationale)
    if cin < 64 or n < 16:
        return False
    vmem = (_bytes((hp, wp, cin), x_dtype)
            + _bytes(w_shape, w_dtype)
            + 2 * _bytes((hp, wp, n), jnp.float32))
    return vmem <= _VMEM_BUDGET


def _kernel(x_ref, w_ref, o_ref, *, dh_n, dw_n, ho, wo, cin, n):
    acc = None
    for dh in range(dh_n):
        for dw in range(dw_n):
            xs = x_ref[0, dh:dh + ho, dw:dw + wo, :]
            xs = xs.reshape(ho * wo, cin)
            wt = w_ref[dh * dw_n + dw]
            d = jax.lax.dot_general(
                xs, wt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    o_ref[0] = acc.reshape(ho, wo, n).astype(o_ref.dtype)


def tapconv_valid(x: jnp.ndarray, w: jnp.ndarray, dh_n: int, dw_n: int,
                  interpret: bool = False) -> jnp.ndarray:
    """x (B, Hp, Wp, Cin), w (Dh*Dw, Cin, N) tap-major -> y (B, HO, WO, N)
    with HO = Hp - Dh + 1, WO = Wp - Dw + 1; f32 accumulation, x.dtype out."""
    b, hp, wp, cin = x.shape
    taps, _, n = w.shape
    assert taps == dh_n * dw_n
    ho, wo = hp - dh_n + 1, wp - dw_n + 1
    kern = functools.partial(_kernel, dh_n=dh_n, dw_n=dw_n, ho=ho, wo=wo,
                             cin=cin, n=n)
    flops = 2 * b * ho * wo * taps * cin * n
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((taps, cin, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ho, wo, n), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=_bytes(x.shape, x.dtype) + _bytes(w.shape, w.dtype)
            + _bytes((b, ho, wo, n), x.dtype),
            transcendentals=0),
        interpret=interpret,
    )(x, w.astype(x.dtype))
