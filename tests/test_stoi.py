"""STOI property tests (pystoi is unavailable; the implementation follows the
published Taal 2011 algorithm — these tests pin its qualitative contract)."""

import numpy as np
import pytest

from dcs_net_tpu.metrics.stoi import stoi


def _speechish(rng, n, sr):
    """AM-modulated broadband noise: energy in all 15 third-octave bands with
    a speech-rate (≈3 Hz) envelope — what STOI's band-envelope correlation
    actually measures. (A pure harmonic tone leaves most bands empty and
    legitimately scores low.)"""
    t = np.arange(n) / sr
    carrier = rng.standard_normal(n)
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 3.1 * t)
    return (carrier * env).astype(np.float64)


def test_identity_is_perfect():
    rng = np.random.default_rng(0)
    x = _speechish(rng, 32000, 16000)
    s = stoi(x, x, 16000)
    assert s > 0.99


def test_monotonic_in_snr():
    rng = np.random.default_rng(1)
    x = _speechish(rng, 32000, 16000)
    noise = rng.standard_normal(32000)
    noise /= np.abs(noise).max()
    scores = []
    for snr_db in (20, 5, -5):
        scale = np.sqrt(np.mean(x ** 2) / np.mean(noise ** 2) / 10 ** (snr_db / 10))
        scores.append(stoi(x, x + scale * noise, 16000))
    assert scores[0] > scores[1] > scores[2], scores
    assert scores[0] > 0.9
    assert scores[2] < 0.8


def test_scale_invariance():
    rng = np.random.default_rng(2)
    x = _speechish(rng, 32000, 16000)
    y = x + 0.1 * rng.standard_normal(32000)
    np.testing.assert_allclose(stoi(x, y, 16000), stoi(x, 3.7 * y, 16000), atol=1e-3)


def test_short_signal_nan():
    x = np.zeros(1000)
    assert np.isnan(stoi(x, x, 16000))


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        stoi(np.zeros(100), np.zeros(101), 16000)
