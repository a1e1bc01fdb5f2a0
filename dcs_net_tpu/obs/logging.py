"""Observability: TensorBoard-compatible writer, throughput counters, profiler.

Covers the reference's TB surface (C16-C18, SURVEY.md §5): scalar metrics,
per-epoch audio samples, input histograms, grad-norm probes — plus the
framework-native audio-seconds/s/chip counter (the BASELINE.json north-star
metric) and jax.profiler trace hooks the reference never had.

tensorboardX is used when importable; otherwise scalars fall back to a JSONL
event log so headless environments still record everything.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class Writer:
    """Scalar/audio/histogram writer with a JSONL fallback."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 enabled: bool = True):
        """``enabled=False`` turns every method into a no-op — multi-host
        training logs from process 0 only (SURVEY.md §5 host-0 logging)."""
        self.enabled = enabled
        self.log_dir = log_dir
        self._tb = None
        self._jsonl = None
        if not enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
        self._jsonl = open(os.path.join(log_dir, "events.jsonl"), "a")

    def scalar(self, tag: str, value: float, step: int) -> None:
        if not self.enabled:
            return
        value = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(json.dumps(
            {"t": time.time(), "tag": tag, "value": value, "step": step}) + "\n")

    def scalars(self, metrics: Dict[str, float], step: int,
                prefix: str = "") -> None:
        for k, v in metrics.items():
            self.scalar(prefix + k, v, step)

    def audio(self, tag: str, wave: np.ndarray, step: int, sr: int) -> None:
        if not self.enabled:
            return
        w = np.asarray(wave, np.float32).reshape(-1)
        peak = np.abs(w).max()
        if peak > 1.0:
            w = w / peak
        if self._tb is not None:
            try:
                self._tb.add_audio(tag, w[None, :], step, sample_rate=sr)
                return
            except Exception:
                pass  # tensorboardX audio needs soundfile; fall through
        from dcs_net_tpu.data.audio_io import write_wav

        safe = tag.replace("/", "_").replace("(", "_").replace(")", "_")
        out_dir = os.path.join(self.log_dir, "audio")
        os.makedirs(out_dir, exist_ok=True)
        write_wav(os.path.join(out_dir, f"{safe}_step{step}.wav"), w, sr)

    def histogram(self, tag: str, values: np.ndarray, step: int) -> None:
        if not self.enabled:
            return
        if self._tb is not None:
            self._tb.add_histogram(tag, np.asarray(values).ravel(), step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        if self._jsonl is not None:
            self._jsonl.flush()

    def close(self) -> None:
        self.flush()
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()


class ThroughputMeter:
    """audio-seconds/s and steps/s over a sliding window."""

    def __init__(self, audio_seconds_per_step: float, window: int = 50):
        self.aps = audio_seconds_per_step
        self.window = window
        self._times = []

    def tick(self) -> None:
        self._times.append(time.perf_counter())
        if len(self._times) > self.window + 1:
            self._times.pop(0)

    @property
    def steps_per_sec(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / dt if dt > 0 else None

    @property
    def audio_seconds_per_sec(self) -> Optional[float]:
        sps = self.steps_per_sec
        return None if sps is None else sps * self.aps


def log_epoch_audio(writer: Writer, audio: Dict[str, np.ndarray], step: int,
                    sr: int, phase: str, rng: np.random.Generator,
                    sample_size: int = 1) -> None:
    """Per-epoch random audio samples to TB (reference C16,
    /root/reference/network_functions.py:450-498)."""
    streams = {k: np.asarray(v) for k, v in audio.items()}
    if not streams:
        return
    batch = next(iter(streams.values())).shape[0]
    for j, idx in enumerate(rng.choice(batch, size=min(sample_size, batch),
                                       replace=False)):
        for name, wav in streams.items():
            writer.audio(f"{name}({phase})/{j}", wav[idx], step, sr)


def log_input_histograms(writer: Writer, batch, step: int) -> None:
    """InputMonitor equivalent (reference C17,
    /root/reference/network_functions.py:500-515)."""
    for name in ("noise", "noisy", "clean"):
        spec = getattr(batch, name)
        writer.histogram(f"{name} data real", np.asarray(spec.re), step)
        writer.histogram(f"{name} data imag", np.asarray(spec.im), step)


def profile_trace(log_dir: str):
    """Context manager capturing a jax.profiler trace viewable in TB/XProf."""
    import contextlib

    import jax

    @contextlib.contextmanager
    def ctx():
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    return ctx()
