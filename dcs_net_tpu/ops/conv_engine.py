"""Shape-aware conv dispatch: matmul reformulations for degenerate channels.

Why (VERDICT r2 task 1/2; BASELINE.md roofline): the decoder convTs and CBAM
spatial-attention convs of this family have tiny channel counts at huge
spatial extents (dec6: 32->2 @ 256x256, SA: 4->2 k=7). XLA:TPU lowers those
through im2col-style convolutions whose MXU tiles are almost empty and whose
operands get relayouted around the conv — the device profile of the real
train step (bench/xprof.py, batch 32 bf16) showed, per step:

    dec6 convT forward   1.79 ms   (HBM roofline ~0.18 ms)
    dec6 wgrad           1.78 ms
    dec6 dgrad + split   2.43 ms
    SA conv wgrads       1.45/1.16/0.35/... ms each

This module reformulates stride-1 'same' odd-kernel convs so every direction
is ONE large dot_general plus cheap data movement, choosing per direction:

  forward   cout*K*K small -> "tap-fold": T = x_pad @ W2 (Cin contracted,
            K*K*Cout lanes), y = sum of K*K shifted slices of T. Reads x
            once; no Cin*K*K patch blowup. (ops/pallas_conv.py is the
            VMEM-resident version of the same formulation for the TPU.)
  dx        cout*K*K small -> patches(g) (K*K*Cout lanes, small by
            construction) @ V, one dot straight to (B,H,W,Cin).
  dw        cout*K*K small -> x^T @ patches(g): one dot contracting the
            B*H*W axis (the huge dimension becomes the MXU contraction).

Everything else falls back to lax.conv_general_dilated. Selection is static
(shape-driven) so jit traces exactly one implementation.

Patch feature order: conv_general_dilated_patches yields features as
(channel-major, then kh, kw) — verified in tests/test_conv_engine.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# max lane width for the reformulated side: ~one MXU tile. K*K*Cout above
# this and the standard conv lowering is no longer the bottleneck shape class.
# 144 (not 128) so the dec5-class convT (k=3, cout=16 packed-complex) is
# captured: its dgrad+split+wgrad measured 0.81+0.46+0.44 ms under XLA.
_MAX_PACKED_LANES = 144


def _f32(x):
    return x.astype(jnp.float32)


def use_tuned(kernel_size: int, stride: Tuple[int, int], padding: int,
              cout: int) -> bool:
    """Static predicate: route through conv2d_same_tuned?"""
    return (stride == (1, 1) and kernel_size > 1 and kernel_size % 2 == 1
            and padding == kernel_size // 2
            and kernel_size * kernel_size * cout <= _MAX_PACKED_LANES)


def _conv_xla(x, w):
    K = w.shape[0]
    p = K // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _fwd_tapfold(x, w):
    """y = conv(x, w) via T = x_pad @ W2 then a K*K-tap shifted-slice sum."""
    K, _, Cin, Cout = w.shape
    p = K // 2
    B, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    w2 = jnp.transpose(w, (2, 0, 1, 3)).reshape(Cin, K * K * Cout)
    t = jax.lax.dot_general(xp, w2, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    t = t.astype(x.dtype)  # (B, H+2p, W+2p, K*K*Cout)
    acc = jnp.zeros((B, H, W, Cout), jnp.float32)
    for kh in range(K):
        for kw in range(K):
            tap = kh * K + kw
            sl = jax.lax.slice(
                t, (0, kh, kw, tap * Cout),
                (B, kh + H, kw + W, (tap + 1) * Cout))
            acc = acc + _f32(sl)
    return acc.astype(x.dtype)


def _patches(g, K):
    """'same' K x K patches as shifted slices + concat; features TAP-major:
    index = (kh*K + kw)*C + c.

    NOT conv_general_dilated_patches: XLA:TPU lowers that through a gather
    plus a layout copy (profiled at 0.59 + 0.68 ms for the dec6 dgrad
    patches alone); K*K shifted slices of one padded buffer fuse into a
    single kLoop read instead."""
    p = K // 2
    B, H, W, C = g.shape
    gp = jnp.pad(g, ((0, 0), (p, p), (p, p), (0, 0)))
    cols = []
    for kh in range(K):
        for kw in range(K):
            cols.append(jax.lax.slice(
                gp, (0, kh, kw, 0), (B, kh + H, kw + W, C)))
    return jnp.concatenate(cols, axis=-1)


def _dgrad_patchdot(g, w):
    """dx[b,h,w,ci] = sum_{kh,kw,co} g_pad[b,h+kh-p,w+kw-p,co] *
    flip(w)[kh,kw,ci,co]  — one dot over the small K*K*Cout axis."""
    K, _, Cin, Cout = w.shape
    pg = _patches(g, K)  # (B, H, W, K*K*Cout), tap-major
    v = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)  # (K, K, Cout, Cin)
    v = v.reshape(K * K * Cout, Cin).astype(g.dtype)
    dx = jax.lax.dot_general(pg, v, (((3,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return dx


def _wgrad_patchdot(x, g, K):
    """dw[kh,kw,ci,co] = sum_{b,h,w} x[b,h,w,ci] *
    g_pad[b,h-kh+p,w-kw+p,co]  — one dot contracting B*H*W."""
    pg = _patches(g, K)  # (B, H, W, K*K*Cout), tap-major, tap (K-1-kh, ...)
    Cout = g.shape[-1]
    m = jax.lax.dot_general(x, pg, (((0, 1, 2), (0, 1, 2)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = m.reshape(x.shape[-1], K, K, Cout)        # (Cin, kh', kw', Cout)
    m = jnp.flip(m, (1, 2))                       # kh' = K-1-kh -> kh
    return jnp.transpose(m, (1, 2, 0, 3))          # (K, K, Cin, Cout)


def _wgrad_rowdot(x, g, K):
    """dw for the stride-1 'same' conv WITHOUT materializing the K*K*Cout
    patch tensor (at batch 128 the SA convs' patches(g) concat alone measured
    2.08 ms each, a 411 MB intermediate).

    Per kernel row kh: ONE dot contracting (B, H) gives
        R[w', ci, w, co] = sum_{b,h} x_pad[b, h+kh, w', ci] * g[b, h, w, co]
    and dw[kh, kw] = sum_w R[w+kw, :, w, :] — K tiny diagonal sums of a
    (W+2p, Cin, W, Cout) table. K dots total, each with full-depth B*H
    contraction; no blown-up intermediate."""
    p = K // 2
    B, H, W, cin = x.shape
    cout = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    out_rows = []
    for kh in range(K):
        lhs = jax.lax.slice(xp, (0, kh, 0, 0), (B, kh + H, W + 2 * p, cin))
        r = jax.lax.dot_general(lhs, g, (((0, 1), (0, 1)), ((), ())),
                                preferred_element_type=jnp.float32)
        taps = []
        for kw in range(K):
            d = jnp.diagonal(r, offset=-kw, axis1=0, axis2=2)  # (ci, co, W)
            taps.append(jnp.sum(d, axis=-1))
        out_rows.append(jnp.stack(taps))                       # (K, ci, co)
    return jnp.stack(out_rows)                                 # (K, K, ci, co)


# bwd implementation for conv2d_same_tuned (the SA convs are its only
# product users: k7, Cin<=4, Cout<=2). "rowdot" = XLA dgrad conv +
# _wgrad_rowdot; "patchdot" = the r3 shared-patches formulation. Chosen by
# the stage A/B at batch 128 (bench/stage_ab.py --stages sa*, BASELINE.md).
SAME_BWD = "rowdot"


def _dgrad_xla(g, w):
    K = w.shape[0]
    p = K // 2
    w_t = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
    return jax.lax.conv_general_dilated(
        g, w_t.astype(g.dtype), (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _wgrad_xla(x, g, K):
    p = K // 2
    lhs = jnp.transpose(x, (3, 1, 2, 0))
    rhs = jnp.transpose(g, (1, 2, 0, 3))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jnp.transpose(out, (1, 2, 0, 3))


@jax.custom_vjp
def conv2d_same_tuned(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 'same' odd-K cross-correlation, NHWC/HWIO, no bias.

    Only call when use_tuned(...) is True (K*K*Cout <= _MAX_PACKED_LANES);
    forward and both gradients then run as single large dot_generals
    (docstring above)."""
    return _fwd_dispatch(x, w)


# Route eligible forwards through the Pallas VMEM-resident kernel. Off until
# the kernel's HBM->VMEM DMA handles narrow Cin on real hardware (Mosaic
# rejects slices whose minor dim isn't lane-aligned: "Slice shape along
# dimension 3 must be aligned to tiling (128), but is 4" for the SA conv).
PALLAS_FWD = False


def _fwd_dispatch(x, w):
    K, _, _, Cout = w.shape
    if PALLAS_FWD:
        from dcs_net_tpu.ops.pallas_conv import pallas_conv_applicable

        if pallas_conv_applicable(x.shape, K, (1, 1), K // 2, Cout):
            from dcs_net_tpu.ops.pallas_conv import _conv_fwd_pallas

            return _conv_fwd_pallas(x, w.astype(x.dtype),
                                    jnp.zeros((Cout,), jnp.float32))
    # tap-fold re-reads T K*K times: a win only for small kernels (dec6-class
    # k=3 -> 9 shifted reads of an 18-lane tensor). For k=7 (SA convs) the 49
    # re-reads cost more than XLA's conv — and unrolling 49 slice+adds per SA
    # module blows up compile time. There the gains live in the gradients.
    if K * K * Cout <= 32:
        return _fwd_tapfold(x, w)
    return _conv_xla(x, w)


def _vjp_fwd(x, w):
    return _fwd_dispatch(x, w), (x, w)


def _vjp_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    if SAME_BWD == "rowdot":
        dx = _dgrad_xla(g, w).astype(x.dtype)
        dw = _wgrad_rowdot(x, g, w.shape[0]).astype(w.dtype)
    else:
        dx = _dgrad_patchdot(g, w).astype(x.dtype)
        dw = _wgrad_patchdot(x, g, w.shape[0]).astype(w.dtype)
    return dx, dw


conv2d_same_tuned.defvjp(_vjp_fwd, _vjp_bwd)


# ---- strided conv with a phase-decomposed input gradient --------------------
#
# The encoder's strided convs have tiny Cin (enc0: 2) so their INPUT gradient
# is the degenerate direction: XLA lowers dx = conv(lhs_dilated(g), flip(w)^T)
# with K*K*Cout contraction onto near-empty MXU tiles (profiled: enc0 dgrad
# 1.09 ms, enc1 0.55, enc2 0.40 per step). Decompose dx by output phase
# (h mod s_h, w mod s_w): each phase is a STRIDE-1 correlation of g with the
# matching sub-kernel of w — exactly the degenerate-shape class the tuned
# machinery above handles — and the phases interleave back with one reshape.


def _phase_taps(K: int, p: int, s: int, a: int):
    """Taps kh contributing to output phase a (h ≡ a mod s), as
    (kernel_rows, o_min): dx_a[h'] = sum_j g[h' + o_min + j] * w[kh(j)],
    kh(j) = a + p - s*(o_min + j)."""
    taps = [(kh, (a + p - kh) // s) for kh in range(K)
            if (a + p - kh) % s == 0]
    if not taps:
        return [], 0
    offs = sorted(o for _, o in taps)
    o_min = offs[0]
    assert offs == list(range(o_min, o_min + len(offs))), "non-contiguous taps"
    kh_by_j = {o: kh for kh, o in taps}
    return [kh_by_j[o_min + j] for j in range(len(taps))], o_min


def _corr_general(g, kern, pads):
    """Stride-1 VALID correlation of pre-padded g with kern (nh, nw, ci, co);
    pads = ((plh, prh), (plw, prw)) applied to g first. Routed through the
    tap-fold dot when the packed lane count is small, else lax conv."""
    nh, nw, _, co = kern.shape
    gp = jnp.pad(g, ((0, 0), pads[0], pads[1], (0, 0)))
    if nh * nw * co <= 32:
        B = g.shape[0]
        HO = gp.shape[1] - nh + 1
        WO = gp.shape[2] - nw + 1
        w2 = jnp.transpose(kern, (2, 0, 1, 3)).reshape(
            g.shape[-1], nh * nw * co).astype(g.dtype)
        t = jax.lax.dot_general(gp, w2, (((3,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        t = t.astype(g.dtype)
        acc = jnp.zeros((B, HO, WO, co), jnp.float32)
        for jh in range(nh):
            for jw in range(nw):
                tap = jh * nw + jw
                acc = acc + _f32(jax.lax.slice(
                    t, (0, jh, jw, tap * co),
                    (B, jh + HO, jw + WO, (tap + 1) * co)))
        return acc
    return jax.lax.conv_general_dilated(
        gp, kern.astype(g.dtype), (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _dgrad_strided_phase(g, w, stride, padding, x_shape):
    """dx for a strided 'conv2d(x, w, stride, pad)' via per-phase stride-1
    correlations. g: (B, HO, WO, Cout); returns (B, H, W, Cin) f32."""
    K = w.shape[0]
    Cin = w.shape[2]
    s_h, s_w = stride
    p = padding
    B, H, W, _ = x_shape
    HO, WO = g.shape[1], g.shape[2]
    rows = []
    for a in range(s_h):
        cols = []
        kh_js, oh_min = _phase_taps(K, p, s_h, a)
        for b in range(s_w):
            kw_js, ow_min = _phase_taps(K, p, s_w, b)
            Ha = -(-(H - a) // s_h)   # ceil((H-a)/s_h): rows in this phase
            Wb = -(-(W - b) // s_w)
            if not kh_js or not kw_js:
                cols.append(jnp.zeros((B, Ha, Wb, Cin), jnp.float32))
                continue
            # dx_ab[h'] needs g[h' + oh_min .. h' + oh_min + nh - 1]
            nh, nw = len(kh_js), len(kw_js)
            plh = max(-oh_min, 0)
            prh = max(Ha - 1 + oh_min + nh - 1 - (HO - 1), 0)
            plw = max(-ow_min, 0)
            prw = max(Wb - 1 + ow_min + nw - 1 - (WO - 1), 0)
            # also trim when o_min > 0 (skip leading g rows)
            g_ab = g
            if oh_min > 0:
                g_ab = jax.lax.slice_in_dim(g_ab, oh_min, HO, axis=1)
            if ow_min > 0:
                g_ab = jax.lax.slice_in_dim(g_ab, ow_min, WO, axis=2)
            kern = w[jnp.ix_(jnp.asarray(kh_js), jnp.asarray(kw_js))]
            kern = jnp.transpose(kern, (0, 1, 3, 2))  # (nh, nw, co, ci)
            dx_ab = _corr_general(g_ab, kern, ((plh, prh), (plw, prw)))
            cols.append(dx_ab[:, :Ha, :Wb])
        rows.append(cols)
    # interleave phases: (B, Ha, s_w, Wb, Cin) ... -> (B, H, W, Cin).
    # Phases can have unequal sizes when H % s != 0, so place by dynamic
    # update on a strided view instead: build via concatenate-of-stacks only
    # when uniform, else scatter into zeros.
    if H % s_h == 0 and W % s_w == 0:
        # concat+reshape interleave (see _interleave_phases): no 6-D transpose
        return _interleave_phases(
            [rows[a][b].astype(jnp.float32) for a in range(s_h)
             for b in range(s_w)], s_h, s_w, Cin)
    out = jnp.zeros((B, H, W, Cin), jnp.float32)
    for a in range(s_h):
        for b in range(s_w):
            out = out.at[:, a::s_h, b::s_w].set(rows[a][b])
    return out


def _strided_patches(x, K, stride, padding):
    """S[h', w', (th, tw, ci)] = x_pad[s_h*h' + th, s_w*w' + tw, ci] — taps
    (th major, tw, ci minor) matching w.reshape(K*K*Cin, Cout)'s row order.

    NO strided slices: a strided lax.slice over H AND W measured 1.33 ms
    EACH on the chip (the gather runs at lane granularity; 49 taps = 65
    ms/step). Instead the stride phases fold onto the LANE axis first —
    the W fold is a free reshape ((w, c) -> (w/s_w, s_w*c) reinterprets the
    same memory), the H fold is ONE space-to-depth relayout per conv — and
    every tap then reads a stride-1 spatial slice + a lane block."""
    s_h, s_w = stride
    B, H, W, C = x.shape
    p = padding
    HO = (H + 2 * p - K) // s_h + 1
    WO = (W + 2 * p - K) // s_w + 1
    nh = (K - 1) // s_h + HO          # phase-grid rows the taps reach
    nw = (K - 1) // s_w + WO
    xp = jnp.pad(x, ((0, 0), (p, s_h * nh - H - p),
                     (p, s_w * nw - W - p), (0, 0)))
    cl = C
    if s_w > 1:
        xp = xp.reshape(B, s_h * nh, nw, s_w * C)   # free: (w, c) merge
        cl = s_w * C
    if s_h > 1:
        xp = xp.reshape(B, nh, s_h, nw, cl)
        xp = jnp.transpose(xp, (0, 1, 3, 2, 4)).reshape(B, nh, nw, s_h * cl)
    cols = []
    for th in range(K):
        for tw in range(K):
            base = ((th % s_h) * s_w + (tw % s_w)) * C
            cols.append(jax.lax.slice(
                xp, (0, th // s_h, tw // s_w, base),
                (B, th // s_h + HO, tw // s_w + WO, base + C)))
    return jnp.concatenate(cols, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_strided_tuned(x: jnp.ndarray, w: jnp.ndarray,
                         stride: Tuple[int, int], padding: int) -> jnp.ndarray:
    """Strided conv (torch Conv2d semantics) whose dgrad runs phase-decomposed
    (docstring above); forward and wgrad stay on XLA.

    Round-4 note: a full patch-dot reformulation (S = strided tap patches,
    y = S @ w2, dw = S^T @ g; see _strided_patches/_strided_fwd_dot) was
    built and measured — it LOSES to XLA's own lowering at every encoder
    shape (bench/stage_ab.py: enc1 fwd 3.7 ms vs 0 (sub-RTT), bwd 2.2 vs
    0.45; enc0 fwd 0.8 vs 0) because the S materialization costs
    K^2/(s_h*s_w) x the input's HBM bytes while XLA's direct emitter keeps
    the window in registers. Kept (flag below + parity tests) as the
    measured record."""
    if STRIDED_PATCHDOT:
        s = _strided_patches(x, w.shape[0], stride, padding)
        return _strided_fwd_dot(s, w)
    return jax.lax.conv_general_dilated(
        x, w, stride, ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


STRIDED_PATCHDOT = False


def _strided_fwd_dot(s, w):
    K, _, cin, cout = w.shape
    w2 = w.reshape(K * K * cin, cout).astype(s.dtype)
    return jax.lax.dot_general(
        s, w2, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(s.dtype)


def _vjp_fwd_strided(x, w, stride, padding):
    return conv2d_strided_tuned(x, w, stride, padding), (x, w)


def _wgrad_xla_strided(x, g, K, stride, padding):
    p = padding
    lhs = jnp.transpose(x, (3, 1, 2, 0))
    rhs = jnp.transpose(g, (1, 2, 0, 3))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (1, 1), ((p, p), (p, p)), rhs_dilation=stride,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    # the dilated-rhs conv yields K + s - 1 spatial taps; only the leading K
    # are real kernel positions
    return jnp.transpose(out[:, :K, :K], (1, 2, 0, 3))


def _vjp_bwd_strided(stride, padding, res, g):
    x, w = res
    g = g.astype(x.dtype)
    dx = _dgrad_strided_phase(g, w, stride, padding, x.shape).astype(x.dtype)
    dw = _wgrad_xla_strided(x, g, w.shape[0], stride, padding).astype(w.dtype)
    return dx, dw


conv2d_strided_tuned.defvjp(_vjp_fwd_strided, _vjp_bwd_strided)


def _s2d_pad(x, K, stride, padding):
    """Space-to-depth with the strided conv's geometry: (B, H, W, C) ->
    (B, nh, nw, s_h*s_w*C) where lane order is ((a, b), ci) for input phase
    (a, b) = (h mod s_h, w mod s_w), padded so a VALID stride-1 conv with
    the folded ceil(K/s) kernel reproduces conv2d(x, w, stride, 'same').

    W phases fold via a FREE reshape ((w, c) -> (w/s_w, s_w*c) reinterprets
    the same memory); H phases cost one relayout. Same geometry as
    _strided_patches, shared constants."""
    s_h, s_w = stride
    B, H, W, C = x.shape
    p = padding
    HO = (H + 2 * p - K) // s_h + 1
    WO = (W + 2 * p - K) // s_w + 1
    nh = (K - 1) // s_h + HO
    nw = (K - 1) // s_w + WO
    xp = jnp.pad(x, ((0, 0), (p, s_h * nh - H - p),
                     (p, s_w * nw - W - p), (0, 0)))
    if s_w > 1:
        # (w, c) merge is free, but lane order must be (b, ci) per chunk,
        # which IS the natural layout
        xp = xp.reshape(B, s_h * nh, nw, s_w * C)
    cl = xp.shape[-1]
    if s_h > 1:
        xp = xp.reshape(B, nh, s_h, nw, cl)
        xp = jnp.transpose(xp, (0, 1, 3, 2, 4)).reshape(B, nh, nw, s_h * cl)
    return xp, (HO, WO)


def _fold_kernel_s2d(w, stride):
    """(K, K, C, Cout) -> (ceil(K/s_h), ceil(K/s_w), s_h*s_w*C, Cout) with
    wf[dh, dw, ((a*s_w + b)*C + ci), co] = w[s_h*dh + a, s_w*dw + b, ci, co]
    (zero where the source index exceeds K-1) — matching _s2d_pad's lanes."""
    s_h, s_w = stride
    K, Kw, C, Cout = w.shape
    kh = -(-K // s_h)
    kw = -(-Kw // s_w)
    wp = jnp.pad(w, ((0, kh * s_h - K), (0, kw * s_w - Kw), (0, 0), (0, 0)))
    wp = wp.reshape(kh, s_h, kw, s_w, C, Cout)
    wp = jnp.transpose(wp, (0, 2, 1, 3, 4, 5))
    return wp.reshape(kh, kw, s_h * s_w * C, Cout)


def conv2d_strided_s2d(x: jnp.ndarray, w: jnp.ndarray,
                       stride: Tuple[int, int], padding: int) -> jnp.ndarray:
    """conv2d(x, w, stride, 'same'-ish padding) as space-to-depth + a VALID
    stride-1 conv with the phase-folded kernel — the classic TPU trick for
    strided stem convs: every direction (fwd, dgrad, wgrad via plain AD)
    becomes a stride-1 conv over s_h*s_w-times-fatter channels, which XLA's
    direct emitters handle well, replacing the phase-decomposed custom VJP
    whose tap dots at batch 128 drew ~5 ms/step of batch-minor relayout
    copies at enc0 alone."""
    xs, (HO, WO) = _s2d_pad(x, w.shape[0], stride, padding)
    wf = _fold_kernel_s2d(w, stride).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xs, wf, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[:, :HO, :WO]


# strided conv routing: "s2d" (space-to-depth + stride-1 conv, plain AD) vs
# "phase" (XLA fwd/wgrad + phase-decomposed dgrad custom VJP, the r3 path).
# Chosen per the batch-128 stage A/B (bench/stage_ab.py; BASELINE.md r4).
STRIDED_MODE = "s2d"


def use_tuned_strided(kernel_size: int, stride: Tuple[int, int], padding: int,
                      cin: int, cout: int) -> bool:
    """Phase-dgrad pays off when Cin is small (the dx side is degenerate).
    Round 4 re-verified the r3 gate: widening it to every strided conv (with
    either XLA or patch-dot forwards) measured slower at enc1-enc4
    (bench/stage_ab.py); the XLA direct emitters win once Cin*K*K > 128."""
    return (kernel_size % 2 == 1 and padding == kernel_size // 2
            and stride != (1, 1) and max(stride) <= 2
            and cin * kernel_size * kernel_size <= 128)


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: Tuple[int, int],
           padding: int) -> jnp.ndarray:
    """Conv with shape-aware dispatch (no bias). Drop-in for the
    lax.conv_general_dilated calls in ops/real_layers.py /
    ops/complex_layers.py."""
    K, _, cin, cout = w.shape
    if use_tuned(K, stride, padding, cout):
        return conv2d_same_tuned(x, w)
    if stride != (1, 1) and max(stride) <= 2 and STRIDED_MODE == "s2d":
        return conv2d_strided_s2d(x, w, stride, padding)
    if use_tuned_strided(K, stride, padding, cin, cout):
        return conv2d_strided_tuned(x, w, stride, padding)
    return jax.lax.conv_general_dilated(
        x, w, stride, ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---- multi-input conv: sum_j conv(x_j, w_j) without channel concat ----------
#
# conv(concat(xs, -1), concat(ws, axis=2)) concatenates on the CHANNEL axis —
# on TPU that is a layout-hostile materialization (the device profile shows
# the complex packs lowered as pad+maximum kLoop fusions costing 0.3-0.6 ms
# each at full resolution, plus relayout copies in the backward). Summing
# per-input convs is mathematically identical and reads every operand in
# place; for the tap-fold path the per-input dots accumulate into ONE shared
# T so the K^2 slice-sum runs once.


def _fwd_dispatch_multi(xs, ws):
    K, _, _, Cout = ws[0].shape
    p = K // 2
    if K * K * Cout <= 32:
        B, H, W, _ = xs[0].shape
        t = None
        for x, w in zip(xs, ws):
            Cin = w.shape[2]
            xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            w2 = jnp.transpose(w, (2, 0, 1, 3)).reshape(Cin, K * K * Cout)
            # per-dot cast: f32 T intermediates double this branch's HBM
            # traffic (see upsampled tap-fold note)
            tj = jax.lax.dot_general(
                xp, w2.astype(x.dtype), (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype)
            t = tj if t is None else t + tj
        acc = jnp.zeros((B, H, W, Cout), jnp.float32)
        for kh in range(K):
            for kw in range(K):
                tap = kh * K + kw
                acc = acc + _f32(jax.lax.slice(
                    t, (0, kh, kw, tap * Cout),
                    (B, kh + H, kw + W, (tap + 1) * Cout)))
        return acc.astype(xs[0].dtype)
    y = None
    for x, w in zip(xs, ws):
        yj = _conv_xla(x, w.astype(x.dtype))
        y = yj if y is None else y + yj
    return y


@jax.custom_vjp
def conv2d_same_tuned_multi(xs: Tuple[jnp.ndarray, ...],
                            ws: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """sum_j conv2d_same(x_j, w_j) for stride-1 'same' odd-K; the gradient
    patches(g) tensor is built once and shared across all inputs."""
    return _fwd_dispatch_multi(xs, ws)


def _vjp_fwd_multi(xs, ws):
    return _fwd_dispatch_multi(xs, ws), (xs, ws)


def _vjp_bwd_multi(res, g):
    xs, ws = res
    g = g.astype(xs[0].dtype)
    K = ws[0].shape[0]
    Cout = g.shape[-1]
    pg = _patches(g, K)  # shared across inputs
    dxs, dws = [], []
    for x, w in zip(xs, ws):
        v = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)
        v = v.reshape(K * K * Cout, w.shape[2]).astype(g.dtype)
        dxs.append(jax.lax.dot_general(
            pg, v, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype))
        m = jax.lax.dot_general(x, pg, (((0, 1, 2), (0, 1, 2)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = m.reshape(x.shape[-1], K, K, Cout)
        dws.append(jnp.transpose(jnp.flip(m, (1, 2)), (1, 2, 0, 3))
                   .astype(w.dtype))
    return tuple(dxs), tuple(dws)


conv2d_same_tuned_multi.defvjp(_vjp_fwd_multi, _vjp_bwd_multi)


def _conv_xla_strided(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), stride, ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_strided_tuned_multi(xs: Tuple[jnp.ndarray, ...],
                               ws: Tuple[jnp.ndarray, ...],
                               stride: Tuple[int, int],
                               padding: int) -> jnp.ndarray:
    """sum_j conv(x_j, w_j, stride) with phase-decomposed input gradients."""
    y = None
    for x, w in zip(xs, ws):
        yj = _conv_xla_strided(x, w, stride, padding)
        y = yj if y is None else y + yj
    return y


def _vjp_fwd_strided_multi(xs, ws, stride, padding):
    return conv2d_strided_tuned_multi(xs, ws, stride, padding), (xs, ws)


def _vjp_bwd_strided_multi(stride, padding, res, g):
    xs, ws = res
    g = g.astype(xs[0].dtype)
    dxs = tuple(
        _dgrad_strided_phase(g, w, stride, padding, x.shape).astype(x.dtype)
        for x, w in zip(xs, ws))
    dws = tuple(
        _wgrad_xla_strided(x, g, w.shape[0], stride, padding).astype(w.dtype)
        for x, w in zip(xs, ws))
    return dxs, dws


conv2d_strided_tuned_multi.defvjp(_vjp_fwd_strided_multi,
                                  _vjp_bwd_strided_multi)


# ---- fused nearest-upsample + stride-1 'same' conv --------------------------
#
# Every decoder stage of this family is [concat(skip) -> x2-nearest-upsample
# -> convT(stride 1, k=3, 'same')] (/root/reference/r_network.py:155-168,
# config.py:100,105). Materializing the upsampled tensor costs a broadcast +
# relayout copy per stage (profiled ~0.5 ms at full res), and the conv then
# reads 4x the pixels. Because nearest upsampling repeats x[j//s], the conv
# output decomposes by OUTPUT PHASE (J mod s): phase r is a stride-1 VALID
# correlation of x itself with a folded kernel
#     K_r[d] = sum_{t : floor((r+t-p)/s) == d} w[t]
# (per spatial dim, taps t in [0,K)), so each phase reads x once at the
# SMALL resolution and the phases interleave back with one reshape. The
# multi-input form also absorbs the skip concat (w rows split per input).


def _phase_fold(K: int, p: int, s: int):
    """Per output phase r: (d_min, fold) with fold[a][t] == 1 iff tap t lands
    on relative input offset d_min + a."""
    out = []
    for r in range(s):
        buckets = {}
        for t in range(K):
            d = (r + t - p) // s
            buckets.setdefault(d, []).append(t)
        ds = sorted(buckets)
        assert ds == list(range(ds[0], ds[0] + len(ds)))
        fold = [[1.0 if t in buckets[d] else 0.0 for t in range(K)]
                for d in ds]
        out.append((ds[0], fold))
    return out


def _unified_fold(K: int, p: int, s: int):
    """Fold matrix over the UNION window of all s phases.

    Returns (d_min, F) with F (s, D, K): F[r, d_idx, t] == 1 iff tap t of
    output phase r reads relative input offset d_min + d_idx, i.e.
    floor((r + t - p)/s) == d_min + d_idx. D is the union width (3 for the
    family's k=3 upsample stages regardless of s in {1, 2})."""
    import numpy as np

    ds = [(r + t - p) // s for r in range(s) for t in range(K)]
    d_min, d_max = min(ds), max(ds)
    D = d_max - d_min + 1
    F = np.zeros((s, D, K), np.float32)
    for r in range(s):
        for t in range(K):
            F[r, (r + t - p) // s - d_min, t] = 1.0
    return d_min, F


def upsampled_conv2d_multi(xs, ws, scale: Tuple[int, int]) -> jnp.ndarray:
    """conv2d_same(nearest_upsample(concat(xs, -1), scale), concat(ws, 2)).

    xs: inputs (B, H, W, Cin_j); ws: (K, K, Cin_j, Cout), K odd, padding K//2;
    scale in {1, 2} per dim. Returns (B, s_h*H, s_w*W, Cout).

    ONE unified patch-dot (round 4; replaces the per-phase tap-fold whose
    ~28 narrow dots per decoder stage measured 3.0 ms at dec5): every output
    phase r reads input offsets d = floor((r + t - p)/s) from the SAME union
    window [d_min, d_min + D) (D = 3 for k = 3, s in {1, 2}), so
        Yp[h', w', (r_h, r_w, co)]
          = sum_{d_h, d_w, ci} Q[h', w', (d_h, d_w, ci)]
              * Kbig[(d_h, d_w, ci), (r_h, r_w, co)]
    with Q = the D x D shifted-slice patches of X (all inputs' channels
    concatenated on lanes) and Kbig = the fold-combined kernel
    (Kbig[d, r] = sum_{t: floor((r+t-p)/s) == d} w[t]). Contraction is
    D*D*sum(Cin) (hundreds — full MXU depth), lanes are s_h*s_w*Cout. The
    phase interleave is lane slices + the concat+reshape interleave. JAX AD
    gives the efficient adjoints automatically: dKbig = Q^T @ dYp (one fat
    dot contracting B*H*W), dQ = dYp @ Kbig^T followed by a D*D overlap-add
    (the transpose of the patch slices)."""
    xs, ws = tuple(xs), tuple(ws)
    K = ws[0].shape[0]
    p = K // 2
    s_h, s_w = scale
    if (s_h, s_w) == (1, 1):
        return conv2d_multi(xs, ws, (1, 1), p)
    if UNIFIED_UPDOT:
        return _upsampled_unified(xs, ws, scale)
    B, H, W, _ = xs[0].shape
    Cout = ws[0].shape[-1]
    folds_h = _phase_fold(K, p, s_h)
    folds_w = _phase_fold(K, p, s_w)
    phases = []
    for dh_min, fh in folds_h:
        fh = jnp.asarray(fh)                      # (ndh, K)
        ndh = fh.shape[0]
        for dw_min, fw in folds_w:
            fw = jnp.asarray(fw)                  # (ndw, K)
            ndw = fw.shape[0]
            kerns = [jnp.einsum("ak,bl,klio->abio", fh, fw,
                                w.astype(jnp.float32)).astype(w.dtype)
                     for w in ws]
            plh, prh = max(-dh_min, 0), max(dh_min + ndh - 1, 0)
            plw, prw = max(-dw_min, 0), max(dw_min + ndw - 1, 0)
            if ndh * ndw * Cout <= _MAX_PACKED_LANES:
                t = None
                for x, kern in zip(xs, kerns):
                    Cin = x.shape[-1]
                    xp = jnp.pad(x, ((0, 0), (plh, prh), (plw, prw), (0, 0)))
                    w2 = jnp.transpose(kern, (2, 0, 1, 3)).reshape(
                        Cin, ndh * ndw * Cout).astype(x.dtype)
                    # T back in x.dtype per-dot: at batch 128 the f32 T
                    # intermediates of this branch measured 0.42 ms x 8 dots
                    # at dec5 (138 MB each written to HBM); the MXU still
                    # accumulates each dot in f32 internally
                    tj = jax.lax.dot_general(
                        xp, w2, (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(x.dtype)
                    t = tj if t is None else t + tj
                acc = jnp.zeros((B, H, W, Cout), jnp.float32)
                for jh in range(ndh):
                    for jw in range(ndw):
                        tap = jh * ndw + jw
                        acc = acc + _f32(jax.lax.slice(
                            t, (0, jh, jw, tap * Cout),
                            (B, jh + H, jw + W, (tap + 1) * Cout)))
                ph = acc.astype(xs[0].dtype)
            else:
                y = None
                for x, kern in zip(xs, kerns):
                    xp = jnp.pad(x, ((0, 0), (plh, prh), (plw, prw), (0, 0)))
                    yj = jax.lax.conv_general_dilated(
                        xp, kern.astype(x.dtype), (1, 1), ((0, 0), (0, 0)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    y = yj if y is None else y + yj
                ph = y
            phases.append(ph)
    return _interleave_phases(phases, s_h, s_w, Cout)


# Round-4 A/B verdict (bench/stage_ab.py, committed to BASELINE.md): the
# per-phase tap-fold above BEATS the unified patch-dot at every decoder
# stage — dec5 fwd+bwd 0.42 ms (tapfold) vs 3.67 ms (unified XLA Q-dot) vs
# 3.68 ms (Pallas fwd + XLA bwd; the fwd kernel itself ties at 0.19 vs
# 0.36 ms, but the Q-rebuild backward sinks it). The unified path stays
# available (flag below + parity tests) as the measured record.
UNIFIED_UPDOT = False


def _upsampled_unified(xs, ws, scale):
    """Unified one-dot formulation (see _updot); kept for A/B + tests."""
    K = ws[0].shape[0]
    p = K // 2
    s_h, s_w = scale
    Cout = ws[0].shape[-1]
    dt = xs[0].dtype
    dh_min, Fh = _unified_fold(K, p, s_h)
    dw_min, Fw = _unified_fold(K, p, s_w)
    Dh, Dw = Fh.shape[1], Fw.shape[1]
    fh = jnp.asarray(Fh)
    fw = jnp.asarray(Fw)
    blocks = []
    for dh in range(Dh):
        for dw in range(Dw):
            per_tap = [jnp.einsum("at,bv,tvio->iabo", fh[:, dh], fw[:, dw],
                                  w.astype(jnp.float32))
                       .reshape(w.shape[2], s_h * s_w * Cout) for w in ws]
            blocks.append(jnp.concatenate(per_tap, axis=0))
    kbig = jnp.stack(blocks, axis=0).astype(dt)  # (Dh*Dw, cin_tot, s2*cout)
    xcat = jnp.concatenate(xs, axis=-1) if len(xs) > 1 else xs[0]
    pads = ((0, 0), (-dh_min, dh_min + Dh - 1), (-dw_min, dw_min + Dw - 1),
            (0, 0))
    xp = jnp.pad(xcat, pads)
    yp = _updot(xp, kbig, (Dh, Dw))
    phases = [jax.lax.slice_in_dim(yp, r * Cout, (r + 1) * Cout, axis=3)
              for r in range(s_h * s_w)]
    return _interleave_phases(phases, s_h, s_w, Cout)


def _pallas_fwd_enabled() -> bool:
    """The VMEM tapconv kernel runs on real TPU, single-device only (a
    pallas_call is not auto-partitioned by GSPMD; the DP product path is
    batch-sharded, so multi-device meshes keep the XLA dot formulation)."""
    return jax.default_backend() == "tpu" and len(jax.devices()) == 1


def _updot_patches(xp, taps):
    """Q: (B, HO, WO, Dh*Dw*Cin) shifted-slice patches, tap-major rows."""
    dh_n, dw_n = taps
    B, Hp, Wp, C = xp.shape
    HO, WO = Hp - dh_n + 1, Wp - dw_n + 1
    cols = []
    for dh in range(dh_n):
        for dw in range(dw_n):
            cols.append(jax.lax.slice(
                xp, (0, dh, dw, 0), (B, dh + HO, dw + WO, C)))
    return jnp.concatenate(cols, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _updot(xp: jnp.ndarray, kbig: jnp.ndarray,
           taps: Tuple[int, int]) -> jnp.ndarray:
    """Stride-1 VALID tap conv: xp (B, Hp, Wp, Cin) x kbig (Dh*Dw, Cin, N)
    -> (B, HO, WO, N). Forward rides the VMEM Pallas kernel on a single
    real TPU (x read once, y written once — no Q in HBM), else one XLA
    patch-dot. Backward: dKbig = Q^T @ g (one fat dot contracting B*HO*WO;
    Q rebuilt, not saved — slices are cheaper than 200+ MB residuals) and
    dxp = overlap-add of g @ kbig^T (the patch transpose, a Dh*Dw pad+add
    tree XLA fuses)."""
    dh_n, dw_n = taps
    from dcs_net_tpu.ops.pallas_tapconv import tapconv_applicable, tapconv_valid

    if (_pallas_fwd_enabled()
            and tapconv_applicable(xp.shape, kbig.shape,
                                   x_dtype=xp.dtype, w_dtype=kbig.dtype)):
        return tapconv_valid(xp, kbig, dh_n, dw_n)
    q = _updot_patches(xp, taps)
    cin = xp.shape[-1]
    k2 = kbig.reshape(dh_n * dw_n * cin, kbig.shape[-1])
    return jax.lax.dot_general(q, k2, (((3,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32
                               ).astype(xp.dtype)


def _updot_fwd(xp, kbig, taps):
    return _updot(xp, kbig, taps), (xp, kbig)


def _updot_bwd(taps, res, g):
    xp, kbig = res
    dh_n, dw_n = taps
    B, Hp, Wp, cin = xp.shape
    n = kbig.shape[-1]
    HO, WO = Hp - dh_n + 1, Wp - dw_n + 1
    g = g.astype(xp.dtype)
    q = _updot_patches(xp, taps)
    dk = jax.lax.dot_general(q, g, (((0, 1, 2), (0, 1, 2)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk = dk.reshape(dh_n * dw_n, cin, n).astype(kbig.dtype)
    k2 = kbig.reshape(dh_n * dw_n * cin, n)
    dq = jax.lax.dot_general(g, k2, (((3,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dxp = jnp.zeros((B, Hp, Wp, cin), jnp.float32)
    for dh in range(dh_n):
        for dw in range(dw_n):
            tap = dh * dw_n + dw
            dxp = dxp + jnp.pad(
                dq[..., tap * cin:(tap + 1) * cin],
                ((0, 0), (dh, dh_n - 1 - dh), (dw, dw_n - 1 - dw), (0, 0)))
    return dxp.astype(xp.dtype), dk


_updot.defvjp(_updot_fwd, _updot_bwd)


def _interleave_phases(phases, s_h, s_w, cout):
    """phases: list of (B, H, W, C) ordered (r_h major, r_w minor) ->
    (B, s_h*H, s_w*W, C) nearest-phase interleave via concat+reshape."""
    B, H, W, _ = phases[0].shape
    rows = []
    for a in range(s_h):
        row = phases[a * s_w:(a + 1) * s_w]
        r = row[0] if s_w == 1 else jnp.concatenate(row, axis=-1).reshape(
            B, H, s_w * W, cout)
        rows.append(r)
    if s_h == 1:
        return rows[0]
    return jnp.concatenate(rows, axis=2).reshape(B, s_h * H, s_w * W, cout)


def conv2d_multi(xs, ws, stride: Tuple[int, int], padding: int) -> jnp.ndarray:
    """sum_j conv2d(x_j, w_j, stride, padding) — channel-concat-free.

    All w_j must share (K, K, *, Cout); inputs share (B, H, W, *)."""
    xs, ws = tuple(xs), tuple(ws)
    if len(xs) == 1:
        return conv2d(xs[0], ws[0], stride, padding)
    K = ws[0].shape[0]
    cout = ws[0].shape[-1]
    if use_tuned(K, stride, padding, cout):
        return conv2d_same_tuned_multi(xs, ws)
    # strided dispatch mirrors conv2d(): s2d mode folds each input's phases
    # and sums the per-input stride-1 convs (dead in the product topology —
    # the decoder only calls multi at stride 1 — but keeps multi- and
    # single-input routing consistent for any config that strides a
    # multi-input conv)
    if stride != (1, 1) and max(stride) <= 2 and STRIDED_MODE == "s2d":
        y = None
        for x, w in zip(xs, ws):
            yj = conv2d_strided_s2d(x, w, stride, padding)
            y = yj if y is None else y + yj
        return y
    cin_max = max(w.shape[2] for w in ws)
    if use_tuned_strided(K, stride, padding, cin_max, cout):
        return conv2d_strided_tuned_multi(xs, ws, stride, padding)
    y = None
    for x, w in zip(xs, ws):
        yj = _conv_xla_strided(x, w, stride, padding)
        y = yj if y is None else y + yj
    return y
