"""Native PESQ module contract (P.862-structured estimator; see
native/pesq/pesq.cc — monotonicity/calibration tests, not ITU bit-exactness)."""

import numpy as np
import pytest

from dcs_net_tpu.metrics.pesq import pesq


def _speechish(rng, n, sr=16000, level=0.1):
    t = np.arange(n) / sr
    return (rng.standard_normal(n) * (0.55 + 0.45 * np.sin(2 * np.pi * 3 * t))
            ).astype(np.float32) * level


def test_identity_max():
    rng = np.random.default_rng(0)
    x = _speechish(rng, 32000)
    assert pesq(x, x, 16000) >= 4.4


def test_monotonic_in_snr():
    rng = np.random.default_rng(1)
    x = _speechish(rng, 32000)
    scores = []
    for snr in (30, 15, 5, -5):
        noise = rng.standard_normal(32000).astype(np.float32)
        noise *= np.sqrt(np.mean(x ** 2) / np.mean(noise ** 2) / 10 ** (snr / 10))
        scores.append(pesq(x, x + noise, 16000))
    assert scores == sorted(scores, reverse=True), scores
    assert scores[0] > 3.8
    assert scores[-1] < 1.5


def test_level_invariance():
    rng = np.random.default_rng(2)
    x = _speechish(rng, 32000)
    y = x + 0.03 * rng.standard_normal(32000).astype(np.float32)
    a = pesq(x, y, 16000)
    b = pesq(x, 3.0 * y, 16000)
    assert abs(a - b) < 0.15, (a, b)


def test_alignment_robustness():
    """A 100 ms delay of the degraded signal must barely change the score."""
    rng = np.random.default_rng(3)
    x = _speechish(rng, 48000)
    y = x + 0.02 * rng.standard_normal(48000).astype(np.float32)
    base = pesq(x[:32000], y[:32000], 16000)
    delayed = pesq(x[:32000], np.concatenate(
        [np.zeros(1600, np.float32), y[:32000]]), 16000)
    assert abs(base - delayed) < 0.35, (base, delayed)


def test_invalid_inputs():
    x = np.zeros(100, np.float32)
    assert np.isnan(pesq(x, x, 16000))
    with np.errstate(all="ignore"):
        assert np.isnan(pesq(np.zeros(32000, np.float32),
                             np.zeros(32000, np.float32), 44100))


def test_batched_harness():
    from dcs_net_tpu.metrics.harness import calc_metric, pesq_metric

    rng = np.random.default_rng(4)
    clean = np.stack([_speechish(rng, 32000) for _ in range(2)])
    noisy = clean + 0.01 * rng.standard_normal(clean.shape).astype(np.float32)
    v = calc_metric(clean, noisy, 16000, pesq_metric)
    assert 1.0 < v <= 4.5
