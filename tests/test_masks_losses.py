"""Parity of mask math and losses vs the reference formulas computed in torch."""

import numpy as np
import torch

import jax.numpy as jnp

from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.ops import masks
from dcs_net_tpu.train import losses
from dcs_net_tpu.utils.carray import CArray

ATAN2_EPS = 1e-6


def _carr(rng, shape):
    re = rng.standard_normal(shape).astype(np.float32)
    im = rng.standard_normal(shape).astype(np.float32)
    return CArray(jnp.asarray(re), jnp.asarray(im)), torch.complex(
        torch.from_numpy(re), torch.from_numpy(im))


def _torch_crm(S, Y, eps=1e-8):
    num_r = Y.real * S.real + Y.imag * S.imag
    num_i = Y.real * S.imag - Y.imag * S.real
    den = Y.real ** 2 + Y.imag ** 2 + eps
    return torch.complex(num_r / den, num_i / den)


def _torch_bound(M, eps=ATAN2_EPS):
    mag_t = torch.tanh(torch.abs(M))
    re1 = mag_t * torch.cos(torch.atan2(M.imag, M.real + eps))
    im1 = mag_t * torch.sin(torch.atan2(M.imag, M.real + eps))
    ph = torch.atan2(im1, re1 + eps)
    return torch.complex(mag_t * torch.cos(ph), mag_t * torch.sin(ph))


def test_crm_parity(rng):
    S, S_t = _carr(rng, (4, 16, 16))
    Y, Y_t = _carr(rng, (4, 16, 16))
    ours = masks.crm(S, Y)
    ref = _torch_crm(S_t, Y_t)
    np.testing.assert_allclose(np.asarray(ours.re), ref.real.numpy(), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.im), ref.imag.numpy(), rtol=2e-5, atol=1e-5)


def test_bound_crm_parity(rng):
    M, M_t = _carr(rng, (4, 16, 16))
    ours = masks.bound_crm(M, ATAN2_EPS)
    ref = _torch_bound(M_t)
    np.testing.assert_allclose(np.asarray(ours.re), ref.real.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.im), ref.imag.numpy(), rtol=1e-4, atol=1e-5)


def test_bound_crm_double_application_differs():
    """The eps-shifted atan2 makes bound_crm non-idempotent; the double-bound
    quirk must therefore be reproduced, not skipped."""
    M = CArray(jnp.asarray([[-0.3]], np.float32), jnp.asarray([[0.0]], np.float32))
    once = masks.bound_crm(M, ATAN2_EPS)
    twice = masks.bound_crm(once, ATAN2_EPS)
    assert abs(float(once.re[0, 0]) - float(twice.re[0, 0])) > 1e-9 or \
           abs(float(once.im[0, 0]) - float(twice.im[0, 0])) > 0


def test_complex_mat_mult_parity(rng):
    A, A_t = _carr(rng, (8, 8))
    B, B_t = _carr(rng, (8, 8))
    ours = masks.complex_mat_mult(A, B)
    ref = A_t * B_t
    np.testing.assert_allclose(np.asarray(ours.re), ref.real.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.im), ref.imag.numpy(), rtol=1e-5, atol=1e-6)


def _torch_sisnr(clean, est, eps=1e-8):
    dot = torch.sum(est * clean, -1, keepdim=True)
    norm = torch.sum(clean * clean, -1, keepdim=True)
    s_t = dot * clean / (norm + eps)
    e_n = est - s_t
    snr = 10 * torch.log10(torch.sum(s_t * s_t, -1, keepdim=True) /
                           (torch.sum(e_n * e_n, -1, keepdim=True) + eps) + eps)
    return torch.mean(snr)


def _torch_wsdr(mixed, clean, clean_est, eps=2e-8):
    bsum = lambda x: torch.sum(x, dim=1)

    def msdr(orig, est):
        corr = bsum(orig * est)
        energies = torch.norm(orig, p=2, dim=1) * torch.norm(est, p=2, dim=1)
        return -(corr / (energies + eps))

    noise = mixed - clean
    a = bsum(clean ** 2) / (bsum(clean ** 2) + bsum(noise ** 2) + eps)
    return torch.mean(a * msdr(clean, clean_est) + (1 - a) * msdr(noise, mixed - clean_est))


def test_sisnr_parity(rng):
    c = rng.standard_normal((4, 800)).astype(np.float32)
    e = (c + 0.1 * rng.standard_normal((4, 800))).astype(np.float32)
    ours = float(losses.sisnr(jnp.asarray(c), jnp.asarray(e)))
    ref = float(_torch_sisnr(torch.from_numpy(c), torch.from_numpy(e)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_wsdr_parity(rng):
    c = rng.standard_normal((4, 800)).astype(np.float32)
    n = 0.5 * rng.standard_normal((4, 800)).astype(np.float32)
    mixed = c + n
    est = (c + 0.2 * rng.standard_normal((4, 800))).astype(np.float32)
    ours = float(losses.wsdr(jnp.asarray(mixed), jnp.asarray(c), jnp.asarray(est)))
    ref = float(_torch_wsdr(torch.from_numpy(mixed), torch.from_numpy(c), torch.from_numpy(est)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_calc_loss_subtractive_quirk(rng):
    """noise_loss = 1 - alpha * (-SiSNR) literally (network_functions.py:196)."""
    cfg = config_for_variant("dcs")
    n = rng.standard_normal((2, 400)).astype(np.float32)
    pn = (n + 0.1 * rng.standard_normal((2, 400))).astype(np.float32)
    c = rng.standard_normal((2, 400)).astype(np.float32)
    pc = (c + 0.1 * rng.standard_normal((2, 400))).astype(np.float32)
    out = losses.calc_loss(
        cfg,
        clean_audio=jnp.asarray(c), predict_clean_audio=jnp.asarray(pc),
        noise_audio=jnp.asarray(n), noisy_audio=jnp.asarray(c + n),
        predict_noise_audio=jnp.asarray(pn))
    noise_orig = -float(losses.sisnr(jnp.asarray(n), jnp.asarray(pn)))
    speech_orig = -float(losses.sisnr(jnp.asarray(c), jnp.asarray(pc)))
    np.testing.assert_allclose(float(out["noise_loss"]), 1 - 0.7 * noise_orig, rtol=1e-5)
    np.testing.assert_allclose(float(out["speech_loss"]), 0.7 * speech_orig, rtol=1e-5)
    np.testing.assert_allclose(
        float(out["loss"]), float(out["noise_loss"]) + float(out["speech_loss"]), rtol=1e-6)
    # idiomatic mode: (1 - alpha) * L
    cfg_i = config_for_variant("dcs", faithful=False)
    out_i = losses.calc_loss(
        cfg_i,
        clean_audio=jnp.asarray(c), predict_clean_audio=jnp.asarray(pc),
        noise_audio=jnp.asarray(n), noisy_audio=jnp.asarray(c + n),
        predict_noise_audio=jnp.asarray(pn))
    np.testing.assert_allclose(float(out_i["noise_loss"]), 0.3 * noise_orig, rtol=1e-4)


def test_calc_loss_plain(rng):
    cfg = config_for_variant("dc")
    c = rng.standard_normal((2, 400)).astype(np.float32)
    pc = (c + 0.1 * rng.standard_normal((2, 400))).astype(np.float32)
    out = losses.calc_loss(cfg, clean_audio=jnp.asarray(c), predict_clean_audio=jnp.asarray(pc))
    assert set(out) == {"speech_loss", "loss"}
    np.testing.assert_allclose(float(out["loss"]), float(out["speech_loss"]))


def test_mask_loss_types(rng):
    """Exercise every entry of the noise-loss menu."""
    cfg = config_for_variant("dcs")
    M, _ = _carr(rng, (2, 8, 8))
    P, _ = _carr(rng, (2, 8, 8))
    n = rng.standard_normal((2, 400)).astype(np.float32)
    y = rng.standard_normal((2, 400)).astype(np.float32)
    pn = rng.standard_normal((2, 400)).astype(np.float32)
    for t in range(7):
        v = losses.noise_loss_menu(
            t, target_mask=M, predict_mask=P,
            noise_audio=jnp.asarray(n), noisy_audio=jnp.asarray(y),
            predict_noise_audio=jnp.asarray(pn), cfg=cfg)
        assert np.isfinite(float(v)), f"loss type {t} not finite"


def test_check_finite():
    import pytest
    masks.check_finite(jnp.ones(4), "ok")
    with pytest.raises(FloatingPointError):
        masks.check_finite(jnp.asarray([1.0, np.nan]), "bad")


def test_complex_abs_zero_subgradient_matches_torch():
    """|z| gradient at exactly (0, 0) is torch's sgn(0) = 0, not NaN.

    ComplexDropout zeroes re and im independently (c_network.py:195-204), so
    the network output REACHES bound_crm's |M| with exact complex zeros every
    train step; the naive sqrt(re^2+im^2) backward is NaN there and poisoned
    every dcs gradient (round-5 soak finding, bench/nan_probe.py)."""
    import jax

    def f(re, im):
        return jnp.sum(CArray(re, im).abs())

    re = jnp.asarray([0.0, 3.0, -1.0])
    im = jnp.asarray([0.0, 4.0, 0.0])
    g_re, g_im = jax.grad(f, argnums=(0, 1))(re, im)
    # torch oracle
    z = torch.complex(torch.tensor([0.0, 3.0, -1.0]),
                      torch.tensor([0.0, 4.0, 0.0])).requires_grad_(True)
    torch.abs(z).sum().backward()
    gt = z.grad  # == z/|z| elementwise (0 at z == 0) in torch's convention
    np.testing.assert_allclose(np.asarray(g_re), gt.real.numpy(),
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(g_im), gt.imag.numpy(),
                               rtol=1e-6, atol=0)
    assert np.all(np.isfinite(np.asarray(g_re)))
    # forward unchanged
    np.testing.assert_allclose(np.asarray(f(re, im)), 5.0 + 1.0, rtol=1e-7)


def test_bound_crm_grads_finite_with_exact_zero_elements():
    """End-of-pipeline repro of the soak NaN: a mask input containing exact
    (0, 0) pairs (dropout-zeroed network output) must yield FINITE gradients
    through bound_crm -> mask apply -> sisnr."""
    import jax

    rng = np.random.default_rng(0)
    re = rng.standard_normal((2, 8, 8)).astype(np.float32)
    im = rng.standard_normal((2, 8, 8)).astype(np.float32)
    # dropout-style exact zeros, independent for re and im, incl. overlaps
    re[:, ::3, ::2] = 0.0
    im[:, ::3, ::4] = 0.0
    noisy = CArray(jnp.asarray(rng.standard_normal((2, 8, 8), ).astype(np.float32)),
                   jnp.asarray(rng.standard_normal((2, 8, 8)).astype(np.float32)))
    target = jnp.asarray(rng.standard_normal((2, 8 * 8 * 2)).astype(np.float32))

    def loss(re, im):
        m = masks.bound_crm(CArray(re, im), ATAN2_EPS)
        pred_noise = noisy * m
        wave = jnp.concatenate([pred_noise.re.reshape(2, -1),
                                pred_noise.im.reshape(2, -1)], axis=-1)
        return -losses.sisnr(target, wave)

    g_re, g_im = jax.grad(loss, argnums=(0, 1))(jnp.asarray(re),
                                                jnp.asarray(im))
    assert np.all(np.isfinite(np.asarray(g_re)))
    assert np.all(np.isfinite(np.asarray(g_im)))
