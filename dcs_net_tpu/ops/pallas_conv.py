"""Pallas TPU kernel: stride-1 'same' conv2d for small output channels.

Why this exists (VERDICT r1 #5 / BASELINE roofline): the decoder convT layers
of this family (all stride (1,1), k=3 — /root/reference/config.py:100) have
tiny output-channel counts (dec6: cout=2 packed complex). XLA lowers those to
an im2col matmul whose patch tensor (B,H,W,K*K*Cin) round-trips HBM — measured
~2.0 ms forward at the dec6 shape (32,256,256,32)->(...,2) on a v5e vs a
~0.1 ms HBM roofline (read x once + write y once).

This kernel keeps everything in VMEM per (batch, row-tile) grid step:

    T   = X_tile @ W2            one MXU contraction, W2 (Cin, K*K*Cout)
    y   = sum over taps of shifted T slices   (VPU adds, W on the lane dim)

i.e. the tap-packed reformulation: read X once from HBM, write y once, no
patch/im2col materialization. The tap sum runs on (TH, W) planes so the VPU
sees full 128-lane utilization even when Cout == 2 (a (TH, W, Cout) layout
would idle 126/128 lanes).

Layout notes (Mosaic constraints): the scratch row width is padded to a
multiple of 128 lanes so the (taps*Cout, P) -> (taps*Cout, rows, WS) reshape
splits the minor dim on whole vregs; the kernel emits y PLANAR (B,Cout,H,W) —
W stays on lanes end-to-end — and the caller transposes to NHWC in XLA (y is
the small tensor; that pass is ~2% of the traffic the kernel saves).

Backward stays on XLA: dgrad's im2col has only K*K*Cout entries per pixel
(small by construction here) and wgrad reduces to a (K,K,Cin,Cout) output —
both measured near roofline already. custom_vjp wires them up.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(x_hbm, w2_ref, out_ref, xs, sem, *, K, TH, H, W, WS, Cin,
            Cout, out_dtype):
    """Grid (B, H // TH). xs scratch: (TH+2p, WS, Cin); columns [p, W+p) hold
    the DMA'd rows, the rest stays zero (the 'same' W halo + lane padding)."""
    p = K // 2
    b = pl.program_id(0)
    j = pl.program_id(1)
    nH = pl.num_programs(1)
    h0 = j * TH

    # zero the halo/pad columns once (scratch persists across grid steps)
    @pl.when(jnp.logical_and(b == 0, j == 0))
    def _():
        xs[:, 0:p, :] = jnp.zeros((TH + 2 * p, p, Cin), xs.dtype)
        xs[:, W + p:WS, :] = jnp.zeros((TH + 2 * p, WS - W - p, Cin),
                                       xs.dtype)

    # rows [h0-p, h0+TH+p) of x, clipped to [0, H); out-of-range rows zeroed.
    # Static-size DMA per branch keeps copy shapes compile-time constant.
    def dma(src_lo, dst_lo, rows):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src_lo, rows), :, :],
            xs.at[pl.ds(dst_lo, rows), pl.ds(p, W), :],
            sem)
        cp.start()
        cp.wait()

    if H // TH == 1:  # single tile: both edges clipped
        dma(0, p, TH)
        xs[0:p, p:W + p, :] = jnp.zeros((p, W, Cin), xs.dtype)
        xs[TH + p:TH + 2 * p, p:W + p, :] = jnp.zeros((p, W, Cin), xs.dtype)
    else:
        @pl.when(jnp.logical_and(j > 0, j < nH - 1))
        def _():
            dma(h0 - p, 0, TH + 2 * p)

        @pl.when(j == 0)
        def _():
            dma(0, p, TH + p)
            xs[0:p, p:W + p, :] = jnp.zeros((p, W, Cin), xs.dtype)

        @pl.when(j == nH - 1)
        def _():
            dma(h0 - p, 0, TH + p)
            xs[TH + p:TH + 2 * p, p:W + p, :] = jnp.zeros(
                (p, W, Cin), xs.dtype)

    # tap-packed contraction: ((TH+2p)*WS, Cin) @ (Cin, K*K*Cout), f32 acc
    P = (TH + 2 * p) * WS
    t = jnp.dot(xs[:].reshape(P, Cin), w2_ref[:],
                preferred_element_type=jnp.float32)
    # one relayout so the tap sum has W on lanes; WS % 128 == 0 keeps the
    # minor-dim split on whole vregs
    tt = jnp.transpose(t, (1, 0)).reshape(K * K * Cout, TH + 2 * p, WS)
    acc = jnp.zeros((Cout, TH, W), jnp.float32)
    for dy in range(K):
        for dx in range(K):
            tap = dy * K + dx
            acc = acc + tt[tap * Cout:(tap + 1) * Cout,
                           dy:dy + TH, dx:dx + W]
    out_ref[0] = acc.astype(out_dtype)


def _pick_th(H: int, WS: int, K: int, Cin: int, Cout: int,
             itemsize: int) -> int:
    """Largest row tile dividing H that keeps xs + T + T^t in ~10 MB VMEM."""
    p = K // 2
    for th in (128, 64, 32, 16, 8):
        if H % th:
            continue
        rows = th + 2 * p
        vmem = (rows * WS * max(Cin, 8) * itemsize          # xs
                + 2 * rows * WS * max(K * K * Cout, 8) * 4)  # t + tt (f32)
        if vmem <= 10 * 1024 * 1024:
            return th
    return min(H, 8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv_fwd_pallas(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    B, H, W, Cin = x.shape
    K, _, _, Cout = w.shape
    p = K // 2
    WS = _round_up(W + 2 * p, 128)
    TH = _pick_th(H, WS, K, Cin, Cout, jnp.dtype(x.dtype).itemsize)
    # W2: (Cin, K*K*Cout), column order (tap-major, cout-minor)
    w2 = jnp.transpose(w, (2, 0, 1, 3)).reshape(Cin, K * K * Cout)
    w2 = w2.astype(x.dtype)
    kern = functools.partial(_kernel, K=K, TH=TH, H=H, W=W, WS=WS, Cin=Cin,
                             Cout=Cout, out_dtype=x.dtype)
    flops = 2 * B * H * W * Cin * K * K * Cout
    y_planar = pl.pallas_call(
        kern,
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W2
        ],
        out_specs=pl.BlockSpec(
            (1, Cout, TH, W), lambda b, j: (b, 0, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cout, H, W), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * p, WS, Cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + B * H * W * Cout * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, w2)
    # NCHW -> NHWC + bias (y is the small tensor; XLA fuses these)
    return jnp.transpose(y_planar, (0, 2, 3, 1)) + bias.astype(x.dtype)


def _conv_fwd_xla(x, w, bias):
    p = w.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(y.dtype)


def _dgrad(g, w):
    """dx for stride-1 'same' cross-correlation: conv of g with the spatially
    flipped kernel, cin/cout swapped."""
    p = w.shape[0] // 2
    w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    return jax.lax.conv_general_dilated(
        g, w_t.astype(g.dtype), window_strides=(1, 1),
        padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _wgrad(g, x, K):
    """dw[kh,kw,ci,co] = sum_{b,h,w} x[b,h+kh-p,w+kw-p,ci] g[b,h,w,co] — a
    conv with batch as the contraction (standard wgrad-as-conv)."""
    p = K // 2
    lhs = jnp.transpose(x, (3, 1, 2, 0))   # (Cin, H, W, B): N=Cin, C=B
    rhs = jnp.transpose(g, (1, 2, 0, 3))   # (H, W, B, Cout): I=B, O=Cout
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    # out (Cin, K, K, Cout) -> (K, K, Cin, Cout)
    return jnp.transpose(out, (1, 2, 0, 3))


@jax.custom_vjp
def conv2d_same_small_cout(x, w, bias):
    """Stride-1 'same' cross-correlation (torch Conv2d, padding=k//2) with a
    Pallas forward tuned for small Cout. x (B,H,W,Cin), w (K,K,Cin,Cout),
    bias (Cout,). Gradients via XLA convs (near-roofline for these shapes)."""
    return _conv_fwd_pallas(x, w, bias)


def _fwd(x, w, bias):
    return _conv_fwd_pallas(x, w, bias), (x, w)


def _bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    dx = _dgrad(g, w).astype(x.dtype)
    dw = _wgrad(g, x, w.shape[0]).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(bias_dtype(g))
    return dx, dw, db


def bias_dtype(g):
    return jnp.float32


conv2d_same_small_cout.defvjp(_fwd, _bwd)


def pallas_conv_applicable(shape: Tuple[int, ...], kernel_size: int,
                           stride: Tuple[int, int], padding: int,
                           cout: int) -> bool:
    """Route a conv through the Pallas kernel when it is the shape class XLA
    handles poorly AND the kernel's constraints hold: stride 1, 'same' odd
    kernel, small cout, spatial extent big enough to matter, row count
    tileable, running on a real TPU backend."""
    if len(shape) != 4:
        return False
    B, H, W, Cin = shape
    if stride != (1, 1) or kernel_size % 2 == 0 or padding != kernel_size // 2:
        return False
    if cout > 16 or H * W < 64 * 64 or H % 8 or W % 8:
        return False
    from dcs_net_tpu.utils.platform import is_tpu_backend

    return is_tpu_backend()
