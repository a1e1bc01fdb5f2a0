"""Pallas TPU kernel for the STFT front-end.

The XLA path (dsp/stft.py) materializes the frame tensor (T, n_fft) in HBM
(256x512 floats per stream per item) before the DFT matmul. This kernel fuses
framing + windowing + the cos/sin basis matmuls: each grid step DMAs one
contiguous chunk of samples from HBM into VMEM (overlapped chunks — hence a
manual async copy, not BlockSpec blocking), builds the overlapped frames as
VMEM slices (hop | n_fft), multiplies by the window, and issues two MXU
contractions against the resident DFT bases. Frames never touch HBM.

Grid: (batch, frame_tiles); a tile of FRAME_TILE frames spans
hop*(FRAME_TILE-1) + n_fft samples. The bases (n_fft x F) stay in VMEM.

The op is linear; the custom VJP computes the adjoint with the XLA reference
helpers (basis-transpose matmul + window + overlap-add + reflect-pad fold),
so training differentiates through the kernel.

STATUS: validated in interpret mode (tests/test_stft_pallas.py) and kept as
the kernel-language reference implementation. The compiled Mosaic path is
blocked on hop(32)-granular HBM access vs the 128-lane tiling ("slice shape
along dim 2 must be aligned to tiling"); meanwhile the XLA path lowers the
same computation to one MXU matmul at ~0.05 ms per 3x32x8160 batch — already
at memory speed-of-light — so the default pipeline uses dsp.stft. Revisit if
hop ever becomes >=128 or Mosaic gains sub-lane DMA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcs_net_tpu.core.config import STFTConfig
from dcs_net_tpu.dsp import stft as ref
from dcs_net_tpu.utils.carray import CArray

FRAME_TILE = 128  # frames per grid step (MXU tile rows)


def _kernel(x_hbm, cosb_ref, sinb_ref, win_ref, re_ref, im_ref,
            scratch, sem, *, hop: int, n_fft: int):
    # x_hbm is pre-reshaped to (B, total_rows, hop): a tile's samples are the
    # rows [t*FT, t*FT + FT + r - 1) — a clean 2D DMA (Mosaic rejects 1D
    # VMEM staging).
    b = pl.program_id(0)
    t = pl.program_id(1)
    r = n_fft // hop
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * FRAME_TILE, FRAME_TILE + r - 1), :], scratch, sem)
    dma.start()
    dma.wait()

    # Mosaic cannot lower a 16-way lane-concat of shifted slices, so express
    # frames @ basis as a sum of r shifted sub-matmuls:
    #   OUT = sum_i  v[i : i+FT, :] @ (win * basis)[i*hop : (i+1)*hop, :]
    # The window is folded into the bases host-side (win_ref retained for the
    # interpret-mode identity check only).
    del win_ref
    v = scratch[:]
    F = cosb_ref.shape[1]
    acc_re = jnp.zeros((FRAME_TILE, F), jnp.float32)
    acc_im = jnp.zeros((FRAME_TILE, F), jnp.float32)
    for i in range(r):
        piece = v[i:i + FRAME_TILE, :]                      # (FT, hop)
        acc_re += jnp.dot(piece, cosb_ref[i * hop:(i + 1) * hop, :],
                          preferred_element_type=jnp.float32)
        acc_im += jnp.dot(piece, sinb_ref[i * hop:(i + 1) * hop, :],
                          preferred_element_type=jnp.float32)
    re_ref[0] = acc_re
    im_ref[0] = acc_im


def _padded_input(x: jnp.ndarray, cfg: STFTConfig) -> Tuple[jnp.ndarray, int, int]:
    if cfg.center:
        pad = cfg.n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)],
                    mode=cfg.pad_mode)
    n = x.shape[-1]
    n_frames = 1 + (n - cfg.n_fft) // cfg.hop
    n_tiles = -(-n_frames // FRAME_TILE)
    needed = cfg.hop * (n_tiles * FRAME_TILE - 1) + cfg.n_fft
    if needed > n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, needed - n)])
    return x, n_frames, n_tiles


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def stft_pallas(x: jnp.ndarray, cfg: STFTConfig, interpret: bool = False) -> CArray:
    """(..., n) -> CArray (..., F, T); torch-parity semantics like dsp.stft."""
    return _forward(x, cfg, interpret)


def _forward(x: jnp.ndarray, cfg: STFTConfig, interpret: bool) -> CArray:
    assert cfg.n_fft % cfg.hop == 0, "pallas stft requires hop | n_fft"
    batch_shape = x.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    xs = x.reshape(B, x.shape[-1])
    xp, n_frames, n_tiles = _padded_input(xs, cfg)
    r = cfg.n_fft // cfg.hop
    rows_per_tile = FRAME_TILE + r - 1
    total_rows = n_tiles * FRAME_TILE + r - 1
    # free layout change: (B, n) -> (B, rows, hop); tile t reads rows
    # [t*FT, t*FT + FT + r - 1)
    xp = xp[:, : total_rows * cfg.hop].reshape(B, total_rows, cfg.hop)

    cos_b, sin_b = ref._dft_basis(cfg.n_fft, cfg.drop_dc)
    scale = cfg.n_fft ** -0.5 if cfg.normalized else 1.0
    win = ref.window_np(cfg)[:, None]  # fold the window into the bases
    cos_b = jnp.asarray(cos_b * win * scale, jnp.float32)
    sin_b = jnp.asarray(sin_b * win * scale, jnp.float32)
    window = jnp.asarray(ref.window_np(cfg), jnp.float32)[None, :]
    F = cos_b.shape[1]

    kernel = functools.partial(_kernel, hop=cfg.hop, n_fft=cfg.n_fft)
    re, im = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # samples stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos basis, resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin basis
            pl.BlockSpec(memory_space=pltpu.VMEM),  # window
        ],
        out_specs=(
            pl.BlockSpec((1, FRAME_TILE, F), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FRAME_TILE, F), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_tiles * FRAME_TILE, F), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles * FRAME_TILE, F), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_per_tile, cfg.hop), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, cos_b, sin_b, window)

    re = re[:, :n_frames, :].reshape(batch_shape + (n_frames, F))
    im = im[:, :n_frames, :].reshape(batch_shape + (n_frames, F))
    # (..., T, F) -> (..., F, T) reference layout
    return CArray(jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2))


def _adjoint(g: CArray, cfg: STFTConfig, x_shape) -> jnp.ndarray:
    """Adjoint of the linear STFT (XLA): basis-transpose matmul, window,
    overlap-add, transpose of the reflect center-padding."""
    cos_b, sin_b = ref._dft_basis(cfg.n_fft, cfg.drop_dc)
    scale = cfg.n_fft ** -0.5 if cfg.normalized else 1.0
    gre = jnp.swapaxes(g.re, -1, -2)  # (..., T, F)
    gim = jnp.swapaxes(g.im, -1, -2)
    frames = (gre @ jnp.asarray(cos_b.T * scale)
              + gim @ jnp.asarray(sin_b.T * scale))
    frames = frames * ref.get_window(cfg)
    n_frames = frames.shape[-2]
    total = cfg.n_fft + cfg.hop * (n_frames - 1)
    acc = ref._overlap_add(frames, cfg, total)
    if not cfg.center:
        return acc.reshape(x_shape)
    pad = cfg.n_fft // 2
    n = x_shape[-1]
    core = acc[..., pad:pad + n]
    left = acc[..., :pad]
    right = acc[..., pad + n:pad + n + pad]
    # reflect-pad transpose: padded[i] came from x[pad - i] (left) and
    # x[n - 2 - j] (right); fold gradients back.
    core = core.at[..., 1:pad + 1].add(left[..., ::-1])
    core = core.at[..., n - 1 - right.shape[-1]:n - 1].add(right[..., ::-1])
    return core.reshape(x_shape)


def _fwd(x, cfg, interpret):
    return _forward(x, cfg, interpret), (x.shape,)


def _bwd(cfg, interpret, res, g):
    (x_shape,) = res
    return (_adjoint(g, cfg, x_shape),)


stft_pallas.defvjp(_fwd, _bwd)
