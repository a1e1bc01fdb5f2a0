"""Analysis utilities and classical baselines (reference C23,
/root/reference/misc.py): noisy-input metric baseline, spectral-subtraction
and Wiener-filter baselines, receptive-field calculator, cRM reconstruction
sanity check. These anchor learned-model metrics the way the reference's
commented-out harnesses did (misc.py:32-61, 359-497).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from dcs_net_tpu.core.config import Config, STFTConfig
from dcs_net_tpu.dsp import stft as dsp
from dcs_net_tpu.ops import masks as M
from dcs_net_tpu.utils.carray import CArray


def receptive_field(kernels: Sequence[int], strides: Sequence[int]) -> int:
    """Encoder receptive field in input pixels (misc.py:64-126)."""
    rf, jump = 1, 1
    for k, s in zip(kernels, strides):
        rf = rf + (k - 1) * jump
        jump *= s
    return rf


def noisy_baseline(clean: np.ndarray, noisy: np.ndarray, sr: int,
                   pesq_fn=None) -> Dict[str, float]:
    """Metrics of the untouched noisy signal (misc.py:32-61)."""
    from dcs_net_tpu.metrics.harness import calc_metric, si_sdr, stoi_metric

    out = {
        "stoi": calc_metric(clean, noisy, sr, stoi_metric),
        "si_sdr": float(np.mean([si_sdr(c, n) for c, n in zip(clean, noisy)])),
    }
    if pesq_fn is not None:
        out["pesq"] = calc_metric(clean, noisy, sr, pesq_fn)
    return out


def spectral_subtraction(noisy: jnp.ndarray, cfg: STFTConfig,
                         noise_frames: int = 6,
                         oversubtract: float = 1.0,
                         floor: float = 0.02) -> jnp.ndarray:
    """Classical magnitude spectral subtraction (misc.py:468-497 capability):
    estimate the noise magnitude from the first frames, subtract, floor,
    resynthesize with the noisy phase."""
    spec = dsp.stft(noisy, cfg)
    mag = spec.abs()
    phase = spec.angle()
    noise_mag = jnp.mean(mag[..., :noise_frames], axis=-1, keepdims=True)
    clean_mag = jnp.maximum(mag - oversubtract * noise_mag, floor * mag)
    full = dsp.pad_bins(CArray.from_polar(clean_mag, phase), cfg, pad_top=False)
    return dsp.istft(full, STFTConfig(**{**cfg.__dict__, "drop_dc": False})
                     if cfg.drop_dc else cfg)


def wiener_filter(noisy: jnp.ndarray, cfg: STFTConfig,
                  noise_frames: int = 6, iterations: int = 1) -> jnp.ndarray:
    """Single-channel Wiener gain from a leading-frames noise PSD estimate
    (the norbert-based baseline capability, misc.py:359-466)."""
    spec = dsp.stft(noisy, cfg)
    power = spec.abs2()
    noise_psd = jnp.mean(power[..., :noise_frames], axis=-1, keepdims=True)
    gain = jnp.maximum(power - noise_psd, 1e-10) / (power + 1e-10)
    for _ in range(iterations - 1):
        speech_psd = gain * power
        gain = speech_psd / (speech_psd + noise_psd + 1e-10)
    filtered = CArray(spec.re * gain, spec.im * gain)
    full = dsp.pad_bins(filtered, cfg, pad_top=False)
    return dsp.istft(full, STFTConfig(**{**cfg.__dict__, "drop_dc": False})
                     if cfg.drop_dc else cfg)


def crm_reconstruction_check(clean: jnp.ndarray, noisy: jnp.ndarray,
                             cfg: Config) -> float:
    """Oracle-mask sanity (misc.py:710-804): build the unbounded cRM from
    clean/noisy, apply it, resynthesize, return max abs waveform error —
    should be tiny (the mask is exact up to eps)."""
    s_clean = dsp.stft(clean, cfg.stft)
    s_noisy = dsp.stft(noisy, cfg.stft)
    mask = M.crm(s_clean, s_noisy, cfg.loss.crm_eps)
    rec_spec = s_noisy * mask
    full = dsp.pad_bins(rec_spec, cfg.stft, pad_top=False)
    rec = dsp.istft(full, STFTConfig(**{**cfg.stft.__dict__, "drop_dc": False}))
    want = dsp.istft(dsp.pad_bins(s_clean, cfg.stft, pad_top=False),
                     STFTConfig(**{**cfg.stft.__dict__, "drop_dc": False}))
    return float(jnp.abs(rec - want).max())
