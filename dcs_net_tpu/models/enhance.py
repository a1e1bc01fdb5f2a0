"""Utterance enhancement: full-utterance and streaming-chunked inference.

The reference evaluates on fixed 0.51 s random crops even at test time
(/root/reference/data.py:95-104) — it has no long-utterance path. This module
is the TPU-idiomatic extension (SURVEY.md §5 long-context note): the on-device
STFT makes utterance length a runtime dimension, and long utterances stream
through fixed-size chunks so the compiled program shape is constant.

Chunking: the spectrogram is cut into ``chunk_frames`` windows overlapping by
``overlap`` frames; each chunk runs the full U-Net (a lax.scan over chunks —
one compilation, arbitrary length); predicted masks are blended with a linear
crossfade in the overlapped region before mask application and iSTFT. Frames
are padded to the model's stride granularity (8) and trimmed after synthesis.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcs_net_tpu.core.config import Config
from dcs_net_tpu.dsp import stft as dsp
from dcs_net_tpu.ops import masks as M
from dcs_net_tpu.utils.carray import CArray


def _apply_mask_pipeline(spec: CArray, mask, cfg: Config) -> CArray:
    """Masked clean-spectrogram estimate per variant (C14 semantics)."""
    if cfg.model.complex_valued:
        if cfg.quirks.double_bound_mask:
            mask = M.bound_crm(mask, cfg.model.atan2_eps)
        if cfg.model.subtractive:
            return spec - spec * mask
        return spec * mask
    mag = spec.abs()
    phase = spec.angle(cfg.model.atan2_eps)
    clean_mag = mag - mag * mask if cfg.model.subtractive else mag * mask
    return CArray.from_polar(clean_mag, phase)


def _model_input(spec: CArray, cfg: Config):
    return spec if cfg.model.complex_valued else spec.abs()


def enhance_full(model, variables, wave: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """(B, n) noisy -> (B, n) enhanced, single forward over the whole
    spectrogram (pads frames to stride granularity 8)."""
    n = wave.shape[-1]
    spec = dsp.stft(wave, cfg.stft)  # (B, F, T)
    T = spec.shape[-1]
    pad = (-T) % 8
    if pad:
        spec_p = CArray(
            jnp.pad(spec.re, ((0, 0), (0, 0), (0, pad))),
            jnp.pad(spec.im, ((0, 0), (0, 0), (0, pad))))
    else:
        spec_p = spec
    mask = model.apply(variables, _model_input(spec_p, cfg), train=False)
    if pad:
        mask = mask[..., :T] if not isinstance(mask, CArray) else CArray(
            mask.re[..., :T], mask.im[..., :T])
    clean_spec = _apply_mask_pipeline(spec, mask, cfg)
    return dsp.spec_to_wave(
        clean_spec, cfg.stft, atan2_eps=cfg.model.atan2_eps,
        pad_top=cfg.quirks.istft_pad_top_bin, length=n)


def zero_lstm_state(cfg: Config, batch: int):
    """The streaming LSTM carry at sequence start (all-zero (h, c)).

    Shapes mirror ops/lstm.py: real nets carry (h, c) each (L*D, B, H);
    complex nets carry a pair of such states on the 2B-stacked (re, im)
    batch (ops/lstm.py ComplexLSTM).
    """
    m = cfg.model
    D = 2 if m.lstm_bidir else 1
    H = m.lstm_hidden

    def one(b):
        z = jnp.zeros((m.lstm_layers * D, b, H), jnp.float32)
        return (z, jnp.zeros_like(z))

    return (one(2 * batch), one(2 * batch)) if m.complex_valued else one(batch)


def enhance_streaming(
    model, variables, wave: jnp.ndarray, cfg: Config,
    chunk_frames: int = 256, overlap: int = 64,
    carry_lstm_state: bool = False, chunk_batch: int = 8,
) -> jnp.ndarray:
    """(B, n) noisy -> (B, n) enhanced via fixed-shape chunks.

    One compile regardless of utterance length; chunk masks crossfaded over
    the overlap. chunk_frames must be a multiple of 8.

    ``carry_lstm_state=True`` threads the LSTM (h, c) through the chunk scan
    (SURVEY.md §5 "overlap-add state carry"): each chunk's latent sequence
    continues the previous chunk's instead of restarting from zeros. Requires
    a unidirectional LSTM (``lstm_bidir=False``; a backward pass cannot
    stream), and is exact — chunked == full pass — when the latent is flattened
    time-major (``lstm_time_major=True``) and chunks tile without overlap.

    Without the carry, chunks are INDEPENDENT (eval-mode BN uses running
    stats; attention pools per chunk), so they run BATCHED in groups of
    ``chunk_batch`` — a scan over groups keeps the compiled shape fixed
    while each group fills the chip the way a batch-``chunk_batch`` forward
    does, instead of serializing latency-bound batch-1 chunk dispatches
    (round-5 enhance profile: serial chunks left the 30 s utterance at
    587 audio-s/s/chip on an idle chip)."""
    if chunk_frames % 8 != 0 or not 0 <= overlap < chunk_frames:
        raise ValueError(
            f"chunk_frames must be a multiple of 8 and overlap in "
            f"[0, chunk_frames): got chunk_frames={chunk_frames}, "
            f"overlap={overlap}")
    if carry_lstm_state and cfg.model.lstm_bidir:
        raise ValueError(
            "LSTM state carry requires a unidirectional (streaming) model")
    n = wave.shape[-1]
    spec = dsp.stft(wave, cfg.stft)  # (B, F, T)
    B, F, T = spec.shape
    hop = chunk_frames - overlap
    n_chunks = max(1, int(np.ceil(max(T - overlap, 1) / hop)))
    total = overlap + n_chunks * hop
    padded = CArray(
        jnp.pad(spec.re, ((0, 0), (0, 0), (0, total - T))),
        jnp.pad(spec.im, ((0, 0), (0, 0), (0, total - T))))

    if carry_lstm_state or n_chunks == 1:
        starts = jnp.arange(n_chunks) * hop

        def run_chunk(carry, start):
            chunk = CArray(
                jax.lax.dynamic_slice_in_dim(
                    padded.re, start, chunk_frames, axis=2),
                jax.lax.dynamic_slice_in_dim(
                    padded.im, start, chunk_frames, axis=2))
            if carry_lstm_state:
                mask, carry = model.apply(
                    variables, _model_input(chunk, cfg), train=False,
                    lstm_state=carry, return_lstm_state=True)
            else:
                mask = model.apply(variables, _model_input(chunk, cfg),
                                   train=False)
            if isinstance(mask, CArray):
                out = jnp.stack([mask.re, mask.im])
            else:
                out = mask[None]
            return carry, out

        init = zero_lstm_state(cfg, B) if carry_lstm_state else None
        _, chunk_masks = jax.lax.scan(run_chunk, init, starts)
    else:
        G = max(min(chunk_batch, n_chunks), 1)
        n_groups = -(-n_chunks // G)
        n_pad = n_groups * G
        # all chunk windows as one gather: (B, F, n_pad, chunk_frames);
        # out-of-range windows (the padding group) clip to the last frame
        # and are dropped after the scan
        idx = np.arange(n_pad)[:, None] * hop + np.arange(chunk_frames)
        idx = np.minimum(idx, total - 1)
        win_re = padded.re[..., jnp.asarray(idx)]
        win_im = padded.im[..., jnp.asarray(idx)]
        # (n_groups, G*B, F, chunk_frames), chunk-major within a group
        def regroup(x):
            x = jnp.moveaxis(x, 2, 0)  # (n_pad, B, F, chunk)
            return x.reshape(n_groups, G * B, F, chunk_frames)
        win_re, win_im = regroup(win_re), regroup(win_im)

        def run_group(_, grp):
            chunk = CArray(grp[0], grp[1])
            mask = model.apply(variables, _model_input(chunk, cfg),
                               train=False)
            if isinstance(mask, CArray):
                out = jnp.stack([mask.re, mask.im])
            else:
                out = mask[None]
            return None, out  # (P, G*B, F, chunk)

        _, gmasks = jax.lax.scan(run_group, None,
                                 jnp.stack([win_re, win_im], axis=1))
        P = gmasks.shape[1]
        gmasks = gmasks.reshape(n_groups, P, G, B, F, chunk_frames)
        chunk_masks = jnp.moveaxis(gmasks, 2, 1).reshape(
            n_groups * G, P, B, F, chunk_frames)[:n_chunks]
    # chunk_masks: (n_chunks, P, B, F, chunk_frames) with P in {1, 2}

    # crossfade weights: ramp up over the overlap, flat, ramp handled by the
    # next chunk's ramp-up (weights are normalized by their OLA sum).
    w = jnp.ones((chunk_frames,))
    if overlap > 0:
        ramp = (jnp.arange(overlap) + 1.0) / (overlap + 1.0)
        w = w.at[:overlap].set(ramp).at[-overlap:].set(ramp[::-1])

    P = chunk_masks.shape[1]
    acc = jnp.zeros((P, B, F, total))
    wacc = jnp.zeros((total,))
    for c in range(n_chunks):  # static unroll: n_chunks is host-derived
        sl = slice(c * hop, c * hop + chunk_frames)
        acc = acc.at[..., sl].add(chunk_masks[c] * w)
        wacc = wacc.at[sl].add(w)
    blended = acc / jnp.maximum(wacc, 1e-8)
    mask = (CArray(blended[0], blended[1]) if P == 2 else blended[0])[..., :T]

    clean_spec = _apply_mask_pipeline(spec, mask, cfg)
    return dsp.spec_to_wave(
        clean_spec, cfg.stft, atan2_eps=cfg.model.atan2_eps,
        pad_top=cfg.quirks.istft_pad_top_bin, length=n)
