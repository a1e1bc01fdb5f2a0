"""Enhance-path throughput on the chip (VERDICT r3 item 6: the north star is
train + ENHANCE audio-s/s/chip; only training had ever been measured).

Measures, with the D2H-fence timing pattern:
  - enhance_full  at batch 1 and batch 32 on 0.51 s crops (the reference's
    test-mode unit of work, /root/reference/test.py:10 + data.py:95-104)
  - enhance_full  on one long utterance (batch 1, --long-seconds)
  - enhance_streaming (chunk 256 / overlap 64) on the same long utterance
Prints one line per config: audio-s/s/chip.

Usage: python bench/enhance_bench.py [--dtype bfloat16] [--long-seconds 30]
"""
from __future__ import annotations

import argparse
import dataclasses
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
    args = ap.parse_args()

    from dcs_net_tpu.core.config import config_for_variant
    from dcs_net_tpu.dsp import stft as dsp
    from dcs_net_tpu.models.enhance import enhance_full, enhance_streaming
    from dcs_net_tpu.models.unet import DCSNet

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

    def timed(fn, wave, reps, scale=1):
        jf = jax.jit(fn)
        fence(jf(wave))  # compile
        t0 = time.perf_counter()
        out = None
        for i in range(reps):
            out = jf(wave + jnp.float32(i) * 1e-30)
        fence(out)
        dt = (time.perf_counter() - t0) / reps
        audio_s = wave.shape[0] * wave.shape[1] / sr * scale
        return audio_s / dt, dt

    rng = np.random.default_rng(0)
    results = {}

    for b in (1, 32):
        wave = jnp.asarray(
            rng.standard_normal((b, crop)).astype(np.float32) * 0.1)
        rate, dt = timed(lambda w: enhance_full(model, variables, w, cfg),
                         wave, args.reps)
        results[f"enhance_full_crop_b{b}"] = (rate, dt)
        print(f"enhance_full  crops  batch {b:3d}: {rate:10.1f} audio-s/s/chip"
              f"  ({dt * 1e3:.2f} ms/call)", flush=True)

    n_long = int(args.long_seconds * sr) // 256 * 256
    wave = jnp.asarray(
        rng.standard_normal((1, n_long)).astype(np.float32) * 0.1)
    rate, dt = timed(lambda w: enhance_full(model, variables, w, cfg),
                     wave, max(args.reps // 2, 3))
    results["enhance_full_long_b1"] = (rate, dt)
    print(f"enhance_full  long {args.long_seconds:.0f}s batch 1: "
          f"{rate:10.1f} audio-s/s/chip  ({dt * 1e3:.2f} ms/call)", flush=True)

    rate, dt = timed(
        lambda w: enhance_streaming(model, variables, w, cfg,
                                    chunk_frames=256, overlap=64),
        wave, max(args.reps // 2, 3))
    results["enhance_streaming_long_b1"] = (rate, dt)
    print(f"enhance_strm  long {args.long_seconds:.0f}s batch 1: "
          f"{rate:10.1f} audio-s/s/chip  ({dt * 1e3:.2f} ms/call)", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
