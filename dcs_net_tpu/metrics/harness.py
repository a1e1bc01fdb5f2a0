"""Batched objective-metric harness (reference C12,
/root/reference/network_functions.py:152-166): loop a batch, per-utterance
metric, drop NaNs and failures, return the batch mean.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


def calc_metric(
    clean_audio: np.ndarray,
    predict_audio: np.ndarray,
    sr: int,
    metric: Callable[[np.ndarray, np.ndarray, int], float],
) -> float:
    """Mean of metric(clean_i, predict_i, sr) over the batch, NaN-dropped.

    Empty/failed batches return 0.0 (the reference divides by max(len, 1))."""
    clean_audio = np.asarray(clean_audio)
    predict_audio = np.asarray(predict_audio)
    vals = []
    for i in range(predict_audio.shape[0]):
        try:
            v = metric(clean_audio[i], predict_audio[i], sr)
        except Exception:
            continue
        if not np.isnan(v):
            vals.append(float(v))
    return float(sum(vals)) / max(len(vals), 1)


def stoi_metric(clean: np.ndarray, predicted: np.ndarray, sr: int) -> float:
    from dcs_net_tpu.metrics.stoi import stoi

    return stoi(clean, predicted, sr)


def pesq_metric(clean: np.ndarray, predicted: np.ndarray, sr: int) -> float:
    """Raw P.862 PESQ MOS via the native module (metrics/pesq). Matches the
    reference's linux pypesq call signature (clean, deg, sr)."""
    from dcs_net_tpu.metrics.pesq import pesq

    return pesq(clean, predicted, sr)


def si_sdr(clean: np.ndarray, predicted: np.ndarray, sr: int = 0) -> float:
    """Scale-invariant SDR (the BASELINE.json parity triple includes SI-SDR)."""
    clean = np.asarray(clean, np.float64)
    predicted = np.asarray(predicted, np.float64)
    alpha = np.dot(predicted, clean) / (np.dot(clean, clean) + 1e-12)
    target = alpha * clean
    noise = predicted - target
    return float(10 * np.log10(
        (np.sum(target ** 2) + 1e-12) / (np.sum(noise ** 2) + 1e-12)))
