"""Time-domain and mask-domain losses + the variant-aware dispatcher.

Reference C8 + C13 (/root/reference/network_functions.py:24-60, 168-208).
All losses are pure jnp; the dispatcher is trace-time static over the config
(no data-dependent control flow inside jit).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from dcs_net_tpu.core.config import Config
from dcs_net_tpu.utils.carray import CArray


def sisnr(clean: jnp.ndarray, estimate: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SNR, dot-projection form, batch mean
    (/root/reference/network_functions.py:30-42). Signals are (..., n)."""
    dot = jnp.sum(estimate * clean, axis=-1, keepdims=True)
    norm = jnp.sum(clean * clean, axis=-1, keepdims=True)
    s_target = dot * clean / (norm + eps)
    e_noise = estimate - s_target
    t = jnp.sum(s_target * s_target, axis=-1, keepdims=True)
    n = jnp.sum(e_noise * e_noise, axis=-1, keepdims=True)
    snr = 10.0 * jnp.log10(t / (n + eps) + eps)
    return jnp.mean(snr)


def wsdr(mixed: jnp.ndarray, clean: jnp.ndarray, clean_est: jnp.ndarray,
         eps: float = 2e-8) -> jnp.ndarray:
    """Weighted SDR with energy-ratio alpha, batch mean
    (/root/reference/network_functions.py:45-60)."""

    def msdr(orig, est):
        corr = jnp.sum(orig * est, axis=-1)
        energies = jnp.linalg.norm(orig, axis=-1) * jnp.linalg.norm(est, axis=-1)
        return -(corr / (energies + eps))

    noise = mixed - clean
    noise_est = mixed - clean_est
    ce = jnp.sum(clean ** 2, axis=-1)
    ne = jnp.sum(noise ** 2, axis=-1)
    a = ce / (ce + ne + eps)
    return jnp.mean(a * msdr(clean, clean_est) + (1 - a) * msdr(noise, noise_est))


def l1(a, b) -> jnp.ndarray:
    """nn.L1Loss over real arrays or CArray masks. For CArray, the reference
    feeds torch complex tensors to L1Loss, whose |.| is the complex modulus —
    mean(|a - b|) with complex abs."""
    if isinstance(a, CArray):
        d = a - b
        return jnp.mean(d.abs())
    return jnp.mean(jnp.abs(a - b))


def mse_split(a, b) -> jnp.ndarray:
    """MSE; for complex masks the reference computes mse(re)+mse(im)
    (/root/reference/network_functions.py:188-190)."""
    if isinstance(a, CArray):
        return jnp.mean((a.re - b.re) ** 2) + jnp.mean((a.im - b.im) ** 2)
    return jnp.mean((a - b) ** 2)


def noise_loss_menu(
    loss_type: int,
    *,
    target_mask,
    predict_mask,
    noise_audio: jnp.ndarray,
    noisy_audio: jnp.ndarray,
    predict_noise_audio: jnp.ndarray,
    cfg: Config,
) -> jnp.ndarray:
    """The 7 selectable noise losses (/root/reference/network_functions.py:171-195)."""
    c = cfg.loss
    if loss_type == 0:
        return l1(target_mask, predict_mask)
    if loss_type == 1:
        return wsdr(noisy_audio, noise_audio, predict_noise_audio, c.wsdr_eps)
    if loss_type == 2:
        return l1(target_mask, predict_mask) + l1(noise_audio, predict_noise_audio)
    if loss_type == 3:
        return (wsdr(noisy_audio, noise_audio, predict_noise_audio, c.wsdr_eps)
                + l1(noise_audio, predict_noise_audio))
    if loss_type == 4:
        return (wsdr(noisy_audio, noise_audio, predict_noise_audio, c.wsdr_eps)
                + l1(target_mask, predict_mask))
    if loss_type == 5:
        return (wsdr(noisy_audio, noise_audio, predict_noise_audio, c.wsdr_eps)
                + mse_split(target_mask, predict_mask))
    if loss_type == 6:
        return -sisnr(noise_audio, predict_noise_audio, c.sisnr_eps)
    raise ValueError(f"unknown noise_loss_type {loss_type}")


def calc_loss(
    cfg: Config,
    *,
    clean_audio: jnp.ndarray,
    predict_clean_audio: jnp.ndarray,
    target_mask=None,
    predict_mask=None,
    noise_audio: Optional[jnp.ndarray] = None,
    noisy_audio: Optional[jnp.ndarray] = None,
    predict_noise_audio: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Variant-aware loss combination (/root/reference/network_functions.py:168-208).

    Subtractive variants return {noise_loss, speech_loss, loss}; plain variants
    return {speech_loss, loss} with loss == speech_loss.

    Quirk ``loss_one_minus_alpha``: the reference combines as the literal
    ``noise_loss = 1 - alpha * L`` (network_functions.py:196); idiomatic mode
    uses ``(1 - alpha) * L``.
    """
    alpha = cfg.loss.speech_alpha

    if cfg.loss.speech_loss_type == 0:
        speech_orig = -sisnr(clean_audio, predict_clean_audio, cfg.loss.sisnr_eps)
    else:
        raise ValueError(f"unknown speech_loss_type {cfg.loss.speech_loss_type}")
    speech_loss = alpha * speech_orig

    if not cfg.model.subtractive:
        return {"speech_loss": speech_loss, "loss": speech_loss}

    noise_orig = noise_loss_menu(
        cfg.loss.noise_loss_type,
        target_mask=target_mask,
        predict_mask=predict_mask,
        noise_audio=noise_audio,
        noisy_audio=noisy_audio,
        predict_noise_audio=predict_noise_audio,
        cfg=cfg,
    )
    if cfg.quirks.loss_one_minus_alpha:
        noise_loss = 1.0 - alpha * noise_orig
    else:
        noise_loss = (1.0 - alpha) * noise_orig
    return {
        "noise_loss": noise_loss,
        "speech_loss": speech_loss,
        "loss": noise_loss + speech_loss,
    }
