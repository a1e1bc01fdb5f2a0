"""Enhance-path throughput + latency on the chip (VERDICT r4 task 3: the
north star is train + ENHANCE audio-s/s/chip; enhance was first measured by
the judge in round 4 at 4-587 audio-s/s/chip and never profiled).

Two numbers per config, both D2H-fenced:
  * throughput — K repetitions inside ONE jit (lax.scan), like the train
    bench: measures device work with the ~30 ms axon dispatch RTT amortized
    away. This is what a pipelined serving deployment gets.
  * latency    — one un-pipelined dispatch, RTT included: what a single
    synchronous request experiences on THIS network-attached chip.

Configs: crops (0.51 s, the reference's test unit) at batch 1/32/128;
one long utterance full-pass and streaming (grouped-batch chunks).

Usage: python bench/enhance_bench.py [--dtype bfloat16] [--long-seconds 30]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="dcs")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--long-seconds", type=float, default=30.0)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--chunk-batch", type=int, default=8)
    args = ap.parse_args()

    from dcs_net_tpu.core.config import config_for_variant
    from dcs_net_tpu.dsp import stft as dsp
    from dcs_net_tpu.models.enhance import enhance_full, enhance_streaming
    from dcs_net_tpu.models.unet import DCSNet
    from dcs_net_tpu.utils.platform import enable_fast_rng

    enable_fast_rng()

    cfg = config_for_variant(args.variant)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, compute_dtype=args.dtype),
        stft=dataclasses.replace(cfg.stft, dft_dtype=args.dtype),
        quirks=cfg.quirks.perf())
    model = DCSNet(cfg.model, cfg.quirks)
    sr = cfg.data.sr
    crop = cfg.data.crop_samples

    dummy = jnp.zeros((1, crop), jnp.float32)
    variables = jax.jit(lambda r, w: model.init(
        {"params": r, "dropout": r}, dsp.stft(w, cfg.stft), train=False)
    )(jax.random.PRNGKey(0), dummy)

    def fence(w):
        return float(np.asarray(jnp.sum(w[..., :4])))

    def timed(fn, wave, reps):
        """(throughput audio-s/s, device ms/call, latency ms) via an in-jit
        K-rep scan + one single-dispatch latency sample."""
        def scanned(w):
            def body(carry, i):
                out = fn(w + carry * jnp.float32(1e-30))
                # chain a scalar through the carry so XLA cannot batch or
                # dead-code-eliminate the repetitions
                return jnp.sum(out[..., :1]), out
            last, outs = jax.lax.scan(body, jnp.float32(0.0),
                                      jnp.arange(reps))
            return outs[-1] + last * jnp.float32(1e-30)

        jt = jax.jit(scanned)
        jf = jax.jit(fn)
        fence(jt(wave))  # compile
        fence(jf(wave))
        t0 = time.perf_counter()
        fence(jt(wave))
        dt = (time.perf_counter() - t0) / reps
        t1 = time.perf_counter()
        fence(jf(wave))
        lat = time.perf_counter() - t1
        audio_s = wave.shape[0] * wave.shape[1] / sr
        return audio_s / dt, dt * 1e3, lat * 1e3

    rng = np.random.default_rng(0)
    results = {}

    for b in (1, 32, 128):
        wave = jnp.asarray(
            rng.standard_normal((b, crop)).astype(np.float32) * 0.1)
        rate, dev_ms, lat_ms = timed(
            lambda w: enhance_full(model, variables, w, cfg), wave, args.reps)
        results[f"crop_b{b}"] = dict(audio_s_per_s=round(rate, 1),
                                     device_ms=round(dev_ms, 2),
                                     latency_ms=round(lat_ms, 2))
        print(f"enhance_full  crops  batch {b:3d}: {rate:10.1f} audio-s/s/chip"
              f"  ({dev_ms:.2f} ms/call device, {lat_ms:.2f} ms latency)",
              flush=True)

    n_long = int(args.long_seconds * sr) // 256 * 256
    wave = jnp.asarray(
        rng.standard_normal((1, n_long)).astype(np.float32) * 0.1)
    rate, dev_ms, lat_ms = timed(
        lambda w: enhance_full(model, variables, w, cfg), wave,
        max(args.reps // 2, 3))
    results["long_full_b1"] = dict(audio_s_per_s=round(rate, 1),
                                   device_ms=round(dev_ms, 2),
                                   latency_ms=round(lat_ms, 2))
    print(f"enhance_full  long {args.long_seconds:.0f}s batch 1: "
          f"{rate:10.1f} audio-s/s/chip  ({dev_ms:.2f} ms device, "
          f"{lat_ms:.2f} ms latency)", flush=True)

    rate, dev_ms, lat_ms = timed(
        lambda w: enhance_streaming(model, variables, w, cfg,
                                    chunk_frames=256, overlap=64,
                                    chunk_batch=args.chunk_batch),
        wave, max(args.reps // 2, 3))
    results[f"long_stream_g{args.chunk_batch}_b1"] = dict(
        audio_s_per_s=round(rate, 1), device_ms=round(dev_ms, 2),
        latency_ms=round(lat_ms, 2))
    print(f"enhance_strm  long {args.long_seconds:.0f}s batch 1 "
          f"(groups of {args.chunk_batch}): {rate:10.1f} audio-s/s/chip  "
          f"({dev_ms:.2f} ms device, {lat_ms:.2f} ms latency)", flush=True)

    print(json.dumps({"enhance": results}))
    os._exit(0)


if __name__ == "__main__":
    main()
