"""Auxiliary subsystems: obs writer, metric harness, analysis baselines,
debug tripwires."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from dcs_net_tpu.core.config import STFTConfig, config_for_variant
from dcs_net_tpu.metrics.harness import calc_metric, si_sdr, stoi_metric
from dcs_net_tpu.obs.logging import ThroughputMeter, Writer
from dcs_net_tpu.train.debug import sanitize_batch
from dcs_net_tpu.utils import analysis


def test_writer_jsonl_fallback(tmp_path):
    w = Writer(str(tmp_path), use_tensorboard=False)
    w.scalar("train/loss", 1.5, 10)
    w.scalars({"a": 1.0, "b": 2.0}, 11, prefix="val_")
    w.flush()
    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path), "events.jsonl"))]
    tags = {l["tag"] for l in lines}
    assert {"train/loss", "val_a", "val_b"} <= tags
    w.close()


def test_throughput_meter():
    m = ThroughputMeter(audio_seconds_per_step=16.32)
    assert m.steps_per_sec is None
    import time

    m.tick()
    time.sleep(0.02)
    m.tick()
    assert m.steps_per_sec > 0
    assert m.audio_seconds_per_sec == pytest.approx(
        m.steps_per_sec * 16.32)


def test_si_sdr_properties():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(8000)
    assert si_sdr(x, x) > 80
    assert si_sdr(x, 2.5 * x) > 80  # scale-invariant
    noisy = x + rng.standard_normal(8000)
    assert si_sdr(x, noisy) < 10


def test_calc_metric_nan_drop():
    def metric(c, p, sr):
        return float("nan") if p[0] > 0 else 3.0

    clean = np.zeros((3, 100))
    pred = np.zeros((3, 100))
    pred[0, 0] = 1.0  # first returns NaN -> dropped
    assert calc_metric(clean, pred, 16000, metric) == 3.0


def test_receptive_field():
    # reference encoder kernels/strides on the time axis
    rf = analysis.receptive_field((7, 7, 5, 5, 3, 3, 3), (2, 2, 2, 1, 1, 1, 1))
    assert rf > 40


def test_classical_baselines_improve_snr():
    """Both estimators assume a noise-only lead-in (their noise PSD comes from
    the first frames) — construct the test signal accordingly."""
    rng = np.random.default_rng(1)
    sr = 16000
    cfg = STFTConfig()
    n = 12000
    t = np.arange(n) / sr
    clean = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    clean[: n // 3] = 0.0  # noise-only lead
    noise = (0.05 * rng.standard_normal(n)).astype(np.float32)
    noisy = jnp.asarray((clean + noise)[None])
    speech = slice(n // 3, n - 500)
    for fn in (analysis.spectral_subtraction, analysis.wiener_filter):
        out = np.asarray(fn(noisy, cfg, noise_frames=60))[0]
        in_sdr = si_sdr(clean[speech], np.asarray(noisy)[0][speech])
        out_sdr = si_sdr(clean[speech], out[speech])
        assert out_sdr > in_sdr, (fn.__name__, in_sdr, out_sdr)


def test_crm_reconstruction_sanity():
    rng = np.random.default_rng(2)
    cfg = config_for_variant("dcs")
    clean = jnp.asarray(rng.standard_normal((1, 8160)).astype(np.float32) * 0.1)
    noise = jnp.asarray(rng.standard_normal((1, 8160)).astype(np.float32) * 0.03)
    err = analysis.crm_reconstruction_check(clean, clean + noise, cfg)
    assert err < 1e-3, err


def test_sanitize_batch():
    sanitize_batch({"a": np.ones(3)})
    with pytest.raises(FloatingPointError):
        sanitize_batch({"bad": np.asarray([1.0, np.inf])})
