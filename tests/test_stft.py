"""STFT/iSTFT parity vs torch (the numerical oracle for reference semantics).

Reference behaviors covered: torch.stft normalized/center/reflect + DC drop
(/root/reference/data.py:112-134), torch.istft resynthesis and the
pad-one-zero-top-bin quirk (/root/reference/network_functions.py:140-150).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dcs_net_tpu.core.config import STFTConfig
from dcs_net_tpu.dsp import stft as dsp


CFG = STFTConfig()


def _torch_stft(x: np.ndarray, drop_dc: bool = True) -> torch.Tensor:
    w = torch.hann_window(CFG.win_length)
    s = torch.stft(torch.from_numpy(x), CFG.n_fft, CFG.hop, CFG.win_length, w,
                   return_complex=True, normalized=CFG.normalized)
    return s[1:, :] if drop_dc else s


@pytest.mark.parametrize("use_fft", [False, True])
def test_stft_matches_torch(rng, use_fft):
    x = rng.standard_normal(8160).astype(np.float32)
    ours = dsp.stft(jnp.asarray(x), CFG, use_fft=use_fft)
    ref = _torch_stft(x)
    assert ours.shape == (256, 256)
    with jax.default_matmul_precision("highest"):
        ours = dsp.stft(jnp.asarray(x), CFG, use_fft=use_fft)
    np.testing.assert_allclose(np.asarray(ours.re), ref.real.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(ours.im), ref.imag.numpy(), atol=3e-4)


def test_stft_batched(rng):
    x = rng.standard_normal((3, 8160)).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        ours = dsp.stft(jnp.asarray(x), CFG)
    assert ours.shape == (3, 256, 256)
    for i in range(3):
        ref = _torch_stft(x[i])
        np.testing.assert_allclose(np.asarray(ours.re[i]), ref.real.numpy(), atol=3e-4)


def test_istft_roundtrip(rng):
    x = rng.standard_normal((2, 8160)).astype(np.float32)
    cfg_full = STFTConfig(drop_dc=False)
    with jax.default_matmul_precision("highest"):
        spec = dsp.stft(jnp.asarray(x), cfg_full)
        y = dsp.istft(spec, cfg_full)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), x, atol=2e-4)


def test_istft_matches_torch(rng):
    """Full 257-bin iSTFT == torch.istft."""
    x = rng.standard_normal(8160).astype(np.float32)
    ref_spec = _torch_stft(x, drop_dc=False)
    from dcs_net_tpu.utils.carray import CArray
    spec = CArray(jnp.asarray(ref_spec.real.numpy()), jnp.asarray(ref_spec.imag.numpy()))
    with jax.default_matmul_precision("highest"):
        ours = dsp.istft(spec, CFG.__class__(drop_dc=False))
    w = torch.hann_window(CFG.win_length)
    ref = torch.istft(ref_spec, CFG.n_fft, CFG.hop, CFG.win_length, w,
                      normalized=CFG.normalized)
    assert ours.shape[-1] == ref.shape[-1] == 8160
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)


def test_polar_to_wave_quirk_matches_reference(rng):
    """mag_phase_2_wave parity: 256-bin mag/phase + zero bin padded on TOP
    (the reference's one-bin-shift quirk), vs torch doing the same."""
    x = rng.standard_normal(8160).astype(np.float32)
    spec = _torch_stft(x, drop_dc=True)  # 256 bins [1:257]
    mag, phase = spec.abs(), torch.atan2(spec.imag, spec.real + 1e-6)
    # reference path: polar -> complex -> F.pad (0,0,0,1) -> istft
    comp = torch.polar(mag, phase)
    comp = torch.nn.functional.pad(comp, (0, 0, 0, 1))
    w = torch.hann_window(CFG.win_length)
    ref = torch.istft(comp, CFG.n_fft, CFG.hop, CFG.win_length, w,
                      normalized=CFG.normalized)
    with jax.default_matmul_precision("highest"):
        ours = dsp.polar_to_wave(
            jnp.asarray(mag.numpy()), jnp.asarray(phase.numpy()), CFG, pad_top=True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)


def test_pad_bins_modes(rng):
    x = rng.standard_normal(8160).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        spec = dsp.stft(jnp.asarray(x), CFG)
        full_dc = dsp.pad_bins(spec, CFG, pad_top=False)
        # idiomatic mode (zero DC re-inserted) reconstructs x closely:
        # the true DC energy of a zero-mean-ish frame is small.
        y = dsp.istft(full_dc, STFTConfig(drop_dc=False))
        # quirk mode shifts bins; reconstruction differs substantially
        full_top = dsp.pad_bins(spec, CFG, pad_top=True)
        y_shift = dsp.istft(full_top, STFTConfig(drop_dc=False))
    err_dc = float(jnp.abs(y - x).max())
    err_shift = float(jnp.abs(y_shift - jnp.asarray(x)).max())
    assert err_dc < 0.15          # only missing true-DC content
    assert err_shift > err_dc     # the quirk is audible/numerically distinct


def test_stft_jit_and_grad():
    cfg = STFTConfig()
    x = jnp.linspace(-1, 1, 8160)

    @jax.jit
    def loss(x):
        s = dsp.stft(x, cfg)
        return jnp.sum(s.abs2())

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_spec_to_wave_direct_matches_polar(rng):
    """Quirks.polar_resynthesis=False (direct iSTFT) deviates from the
    faithful polar round trip only by the atan2 eps shift: O(eps) relative
    (the quirk's contract; core/config.py Quirks docstring)."""
    from dcs_net_tpu.utils.carray import CArray

    cfg = STFTConfig()
    spec = CArray(
        jnp.asarray(rng.standard_normal((2, 256, 9)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((2, 256, 9)).astype(np.float32)))
    eps = 1e-6
    w_polar = dsp.spec_to_wave(spec, cfg, atan2_eps=eps, polar=True)
    w_direct = dsp.spec_to_wave(spec, cfg, atan2_eps=eps, polar=False)
    scale = float(jnp.abs(w_polar).max())
    assert float(jnp.abs(w_polar - w_direct).max()) < 50 * eps * scale
    # and with a zero eps the polar path IS the identity decomposition
    w_polar0 = dsp.spec_to_wave(spec, cfg, atan2_eps=0.0, polar=True)
    np.testing.assert_allclose(np.asarray(w_polar0), np.asarray(w_direct),
                               rtol=1e-5, atol=1e-6)


def test_stft_bf16_basis_close_to_f32(rng):
    """dft_dtype='bfloat16' stays within the bf16 rounding class (~4e-3
    relative) of the f32 transform, forward and round trip."""
    import dataclasses

    from dcs_net_tpu.utils.carray import CArray

    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.3)
    cfg32 = STFTConfig()
    cfg16 = dataclasses.replace(cfg32, dft_dtype="bfloat16")
    s32 = dsp.stft(x, cfg32)
    s16 = dsp.stft(x, cfg16)
    scale = float(jnp.abs(s32.re).max())
    assert float(jnp.abs(s16.re - s32.re).max()) < 2e-2 * scale
    assert float(jnp.abs(s16.im - s32.im).max()) < 2e-2 * scale
    w32 = dsp.spec_to_wave(s32, cfg32, atan2_eps=1e-6, polar=False)
    w16 = dsp.spec_to_wave(s16, cfg16, atan2_eps=1e-6, polar=False)
    wscale = float(jnp.abs(w32).max())
    assert float(jnp.abs(w16 - w32).max()) < 2e-2 * wscale
