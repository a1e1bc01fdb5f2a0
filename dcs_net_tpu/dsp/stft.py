"""On-device STFT / iSTFT.

TPU-first design: framing is a gather, the DFT is a single real matmul against
a precomputed (n_fft, n_bins) cos/sin basis — one MXU contraction per batch —
instead of calling an FFT. For n_fft=512 this is faster on TPU than XLA's FFT
lowering and it fuses with the surrounding elementwise work. A jnp.fft path is
kept for cross-checking.

Semantics match ``torch.stft``/``torch.istft`` as used by the reference:
  * center=True reflect padding of n_fft//2 on both ends
    (/root/reference/data.py:112-134)
  * normalized=True == multiply by n_fft**-0.5 (verified empirically vs torch)
  * the DC bin is dropped after analysis, keeping bins [1..n_fft/2]
  * resynthesis ``polar_to_wave`` reproduces the reference's
    pad-one-zero-TOP-bin quirk (/root/reference/network_functions.py:144)
    behind ``Quirks.istft_pad_top_bin``: the 256 network bins are written to
    positions [0..255] and a zero goes to the Nyquist slot, shifting all
    content down one bin. Idiomatic mode re-inserts a zero DC bin instead.

Exact-reconstruction: hann(512)/hop 32 satisfies NOLA; iSTFT divides by the
overlap-added squared-window envelope and trims the center padding, which makes
``istft(stft(x)) == x`` to float32 precision (test_stft.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcs_net_tpu.core.config import STFTConfig
from dcs_net_tpu.utils.carray import CArray


@functools.lru_cache(maxsize=8)
def window_np(cfg: STFTConfig) -> np.ndarray:
    """Host-side window (numpy, float64)."""
    if cfg.window != "hann":
        raise NotImplementedError(f"window {cfg.window!r}")
    # torch.hann_window(periodic=True): 0.5 - 0.5 cos(2 pi n / N)
    n = np.arange(cfg.win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / cfg.win_length)
    if cfg.win_length < cfg.n_fft:  # torch center-pads the window to n_fft
        pad = (cfg.n_fft - cfg.win_length) // 2
        w = np.pad(w, (pad, cfg.n_fft - cfg.win_length - pad))
    return w


def get_window(cfg: STFTConfig, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(window_np(cfg), dtype)


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int, drop_dc: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag analysis bases, shape (n_fft, n_bins).

    X[k] = sum_n x[n] (cos(-2 pi k n / N) + i sin(-2 pi k n / N))
    """
    n_bins_full = n_fft // 2 + 1
    k = np.arange(n_bins_full)
    n = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft  # (n_fft, bins)
    cos_b, sin_b = np.cos(ang), np.sin(ang)
    if drop_dc:
        cos_b, sin_b = cos_b[:, 1:], sin_b[:, 1:]
    return cos_b.astype(np.float32), sin_b.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_basis_eff(cfg: "STFTConfig") -> Tuple[np.ndarray, np.ndarray]:
    """Analysis bases with the Hann window and the `normalized` 1/sqrt(N)
    scale FOLDED IN (f64 at fold time): dotting RAW frames against these ==
    (frames * window) @ basis * scale, minus two full-resolution passes the
    profiler showed as multiply+relayout fusions per stream (round 5)."""
    n_bins_full = cfg.n_fft // 2 + 1
    k = np.arange(n_bins_full)
    n = np.arange(cfg.n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / cfg.n_fft  # (n_fft, bins)
    w = window_np(cfg).astype(np.float64)[:, None]
    scale = cfg.n_fft ** -0.5 if cfg.normalized else 1.0
    cos_b, sin_b = np.cos(ang) * w * scale, np.sin(ang) * w * scale
    if cfg.drop_dc:
        cos_b, sin_b = cos_b[:, 1:], sin_b[:, 1:]
    return cos_b.astype(np.float32), sin_b.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _idft_basis(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse bases, shape (n_bins_full, n_fft), including the rfft
    hermitian-doubling weights: x[n] = (1/N) sum_k w_k (Re X_k cos + ...)."""
    n_bins_full = n_fft // 2 + 1
    k = np.arange(n_bins_full)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft  # (bins, n_fft)
    weights = np.full((n_bins_full, 1), 2.0)
    weights[0] = weights[-1] = 1.0  # DC and Nyquist appear once
    cos_b = weights * np.cos(ang) / n_fft
    sin_b = -weights * np.sin(ang) / n_fft  # X conj-symmetric: x = Re(ifft)
    return cos_b.astype(np.float32), sin_b.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _idft_basis_eff(cfg: "STFTConfig") -> Tuple[np.ndarray, np.ndarray]:
    """Inverse bases with the `normalized` sqrt(N) pre-scale and the
    synthesis window POST-multiply folded in (f64 at fold time):
    spec @ basis_eff == ((spec * sqrt(N)) @ basis) * window. Kills the
    full-res `frames * window` pass and its f32 relayout copy per stream
    (xprof round 5: copy.10062/10045 + the stft.py:175 mul fusions,
    ~2 ms/step at batch 128)."""
    n_bins_full = cfg.n_fft // 2 + 1
    k = np.arange(n_bins_full)
    n = np.arange(cfg.n_fft)
    ang = 2.0 * np.pi * np.outer(k, n) / cfg.n_fft  # (bins, n_fft)
    weights = np.full((n_bins_full, 1), 2.0)
    weights[0] = weights[-1] = 1.0
    w = window_np(cfg).astype(np.float64)[None, :]
    scale = cfg.n_fft ** 0.5 if cfg.normalized else 1.0
    cos_b = weights * np.cos(ang) / cfg.n_fft * w * scale
    sin_b = -weights * np.sin(ang) / cfg.n_fft * w * scale
    return cos_b.astype(np.float32), sin_b.astype(np.float32)


def frame_signal(x: jnp.ndarray, cfg: STFTConfig) -> jnp.ndarray:
    """(..., n) -> (..., T, n_fft) frames, with center reflect padding.

    When hop | n_fft (the default 32 | 512) framing is a reshape plus
    n_fft//hop static slices — no gather — which XLA turns into pure layout
    ops; the general case falls back to an advanced-index gather.
    """
    if cfg.center:
        pad = cfg.n_fft // 2
        widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, widths, mode=cfg.pad_mode)
    n = x.shape[-1]
    n_frames = 1 + (n - cfg.n_fft) // cfg.hop
    if cfg.n_fft % cfg.hop == 0:
        r = cfg.n_fft // cfg.hop
        usable = cfg.hop * (n_frames + r - 1)
        v = x[..., :usable].reshape(x.shape[:-1] + (n_frames + r - 1, cfg.hop))
        return jnp.concatenate(
            [v[..., i:i + n_frames, :] for i in range(r)], axis=-1)
    starts = np.arange(n_frames) * cfg.hop
    idx = starts[:, None] + np.arange(cfg.n_fft)[None, :]  # (T, n_fft)
    return x[..., idx]


def stft(x: jnp.ndarray, cfg: STFTConfig, *, use_fft: bool = False) -> CArray:
    """STFT of (..., n) real signal -> CArray of shape (..., F, T).

    F = cfg.n_bins (DC dropped when cfg.drop_dc). Matches
    torch.stft(..., normalized=cfg.normalized, return_complex=True)[1:257].
    """
    if use_fft:
        window = get_window(cfg, x.dtype)
        frames = frame_signal(x, cfg) * window  # (..., T, n_fft)
        scale = cfg.n_fft ** -0.5 if cfg.normalized else 1.0
        spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)  # (..., T, bins_full)
        if cfg.drop_dc:
            spec = spec[..., 1:]
        re = jnp.real(spec) * scale
        im = jnp.imag(spec) * scale
    else:
        # window + normalization scale folded into the basis constants
        # (f64 at fold time, _dft_basis_eff) — the dot consumes RAW frames;
        # operands in cfg.dft_dtype, f32 accumulation
        cos_b, sin_b = _dft_basis_eff(cfg)
        dt = jnp.dtype(cfg.dft_dtype)
        fr = frame_signal(x, cfg).astype(dt)
        re = jax.lax.dot_general(
            fr, jnp.asarray(cos_b, dt), (((fr.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        im = jax.lax.dot_general(
            fr, jnp.asarray(sin_b, dt), (((fr.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
    # (..., T, F) -> (..., F, T): reference layout (data.py:111 "F x T")
    return CArray(jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2))


def istft(
    spec: CArray,
    cfg: STFTConfig,
    *,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """iSTFT of a FULL-bin spectrogram (..., n_fft//2+1, T) -> (..., n).

    Matches torch.istft(center=True, normalized=cfg.normalized). Callers with
    DC-dropped (256-bin) spectrograms go through :func:`polar_to_wave` /
    :func:`pad_bins`, which re-create the 257th bin first.
    """
    n_bins_full = cfg.n_fft // 2 + 1
    if spec.shape[-2] != n_bins_full:
        raise ValueError(
            f"istft expects {n_bins_full} bins, got {spec.shape[-2]}; "
            "use pad_bins()/polar_to_wave() for DC-dropped spectrograms")
    re = jnp.swapaxes(spec.re, -1, -2)  # (..., T, bins)
    im = jnp.swapaxes(spec.im, -1, -2)
    # normalization pre-scale + synthesis window post-multiply folded into
    # the basis constants (_idft_basis_eff) — the dots' f32 accumulators go
    # straight to overlap-add
    cos_b, sin_b = _idft_basis_eff(cfg)
    dt = jnp.dtype(cfg.dft_dtype)
    dn = (((re.ndim - 1,), (0,)), ((), ()))
    frames = (jax.lax.dot_general(
        re.astype(dt), jnp.asarray(cos_b, dt), dn,
        preferred_element_type=jnp.float32)
        + jax.lax.dot_general(
            im.astype(dt), jnp.asarray(sin_b, dt), dn,
            preferred_element_type=jnp.float32)).astype(spec.re.dtype)

    n_frames = frames.shape[-2]
    total = cfg.n_fft + cfg.hop * (n_frames - 1)
    batch_shape = frames.shape[:-2]
    out = _overlap_add(frames, cfg, total)  # (..., total)

    # reciprocal multiply instead of divide (env is a host constant)
    env = jnp.asarray(1.0 / _window_envelope(cfg, n_frames), frames.dtype)
    out = out * env

    if cfg.center:
        half = cfg.n_fft // 2
        out = out[..., half:total - half]
    if length is not None:
        out = out[..., :length]
    return out.reshape(batch_shape + (out.shape[-1],))


def _overlap_add(frames: jnp.ndarray, cfg: STFTConfig, total: int) -> jnp.ndarray:
    """(..., T, n_fft) -> (..., total). Scatter-free when hop | n_fft: each
    frame is split into n_fft//hop hop-sized pieces and the r diagonals are
    summed via static pads — XLA fuses this into shifted adds."""
    n_frames = frames.shape[-2]
    if cfg.n_fft % cfg.hop == 0:
        r = cfg.n_fft // cfg.hop
        pieces = frames.reshape(frames.shape[:-1] + (r, cfg.hop))
        rows = n_frames + r - 1  # total // hop
        acc = jnp.zeros(frames.shape[:-2] + (rows, cfg.hop), frames.dtype)
        for i in range(r):
            widths = [(0, 0)] * (frames.ndim - 2) + [(i, rows - n_frames - i), (0, 0)]
            acc = acc + jnp.pad(pieces[..., i, :], widths)
        return acc.reshape(frames.shape[:-2] + (total,))
    starts = np.arange(n_frames) * cfg.hop
    idx = starts[:, None] + np.arange(cfg.n_fft)[None, :]
    flat = frames.reshape((-1, n_frames, cfg.n_fft))
    out = jnp.zeros((flat.shape[0], total), flat.dtype)
    out = out.at[:, idx.reshape(-1)].add(flat.reshape(flat.shape[0], -1))
    return out.reshape(frames.shape[:-2] + (total,))


@functools.lru_cache(maxsize=8)
def _window_envelope(cfg: STFTConfig, n_frames: int) -> np.ndarray:
    """Host-precomputed OLA of squared windows (data-independent)."""
    w = window_np(cfg) ** 2
    total = cfg.n_fft + cfg.hop * (n_frames - 1)
    env = np.zeros(total)
    for t in range(n_frames):
        env[t * cfg.hop:t * cfg.hop + cfg.n_fft] += w
    return np.maximum(env, 1e-11).astype(np.float32)


def pad_bins(spec: CArray, cfg: STFTConfig, *, pad_top: bool) -> CArray:
    """Recreate a full (n_fft//2+1)-bin spectrogram from the DC-dropped one.

    pad_top=True reproduces the reference quirk: F.pad(comp, (0,0,0,1))
    appends the zero at the TOP (Nyquist slot), so the 256 content bins land in
    positions [0..255] — one bin lower than where they were analyzed
    (/root/reference/network_functions.py:144). pad_top=False re-inserts the
    zero at the DC slot (the analysis-consistent inverse).
    """
    zeros = jnp.zeros(spec.shape[:-2] + (1,) + spec.shape[-1:], spec.dtype)
    if pad_top:
        return CArray(
            jnp.concatenate([spec.re, zeros], axis=-2),
            jnp.concatenate([spec.im, zeros], axis=-2))
    return CArray(
        jnp.concatenate([zeros, spec.re], axis=-2),
        jnp.concatenate([zeros, spec.im], axis=-2))


def polar_to_wave(
    mag: jnp.ndarray,
    phase: jnp.ndarray,
    cfg: STFTConfig,
    *,
    pad_top: bool = True,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """mag/phase (.., F=256, T) -> waveform; the reference's ``mag_phase_2_wave``
    (/root/reference/network_functions.py:140-150) minus its CUDA pinning."""
    spec = CArray.from_polar(mag, phase)
    return istft(pad_bins(spec, cfg, pad_top=pad_top), cfg, length=length)


def spec_to_wave(
    spec: CArray,
    cfg: STFTConfig,
    *,
    atan2_eps: float,
    pad_top: bool = True,
    length: Optional[int] = None,
    polar: bool = True,
) -> jnp.ndarray:
    """CArray spectrogram -> waveform.

    polar=True routes through the reference's mag/atan2(+eps) polar
    decomposition (network_functions.py:213-221, 244-247); the eps-shifted
    atan2 makes that NOT quite the identity on the complex values, so
    bit-faithful parity requires it. polar=False feeds the spectrogram to the
    iSTFT directly — mathematically mag*e^{i*atan2(im, re)} == (re, im), so
    the two differ only by the eps shift (O(eps) relative, ~1e-6), while the
    polar path costs 4 extra full-resolution f32 passes (abs, atan2, sin/cos
    + muls) per stream plus their AD transposes (Quirks.polar_resynthesis)."""
    if polar:
        return polar_to_wave(
            spec.abs(), spec.angle(atan2_eps), cfg,
            pad_top=pad_top, length=length)
    return istft(pad_bins(spec, cfg, pad_top=pad_top), cfg, length=length)


def expected_length(cfg: STFTConfig, n_frames: int) -> int:
    if cfg.center:
        return cfg.hop * (n_frames - 1)
    return cfg.n_fft + cfg.hop * (n_frames - 1)
