"""Probe: does lane (minor-dim) width drive elementwise fusion cost on TPU?

The xprof profile of the train step (BASELINE.md) shows 58% of device time in
elementwise/reduction fusions over NHWC activations whose channel dim is
1..32 — far below the 128-lane vector width. This probe times an identical
elementwise chain over the same element count at different minor-dim widths,
plus the reshape that would merge (T, C) minor dims, to decide whether a
layout change pays before building it.

Usage: python bench/layout_probe.py [--reps 50]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax"))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "bench"))
import segments as seg


def chain(x):
    # representative BN+act+dropout-ish elementwise chain: 2 reads, 1 write
    y = jnp.maximum(x * 1.01 + 0.5, 0.0)
    return jnp.where(y > 0.25, y * 1.1, y)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=50)
    args = p.parse_args()

    seg.RTT = 0.0
    trivial = jax.jit(lambda x: x + 1)
    float(np.asarray(trivial(jnp.float32(0))))  # compile outside the timing
    t0 = time.perf_counter()
    for _ in range(5):
        float(np.asarray(trivial(jnp.float32(0))))
    seg.RTT = (time.perf_counter() - t0) / 5
    print(f"RTT {seg.RTT*1e3:.1f} ms")

    n = 32 * 256 * 256 * 2  # enc-input-scale element count (4.2M), bf16
    rng = jax.random.PRNGKey(0)
    base = jax.random.normal(rng, (n,), jnp.float32).astype(jnp.bfloat16)

    shapes = [
        (32, 256, 256, 2),    # model reality: C=2 lanes
        (32, 256, 256, 8),    # enc0-out-like per-plane C (scaled elems!)
        (32, 256, 512),       # (T, C) merged onto lanes
        (32, 512, 256),       # T on lanes
        (n // 128, 128),      # flat 128-lane
    ]
    for s in shapes:
        cnt = int(np.prod(s))
        x = base[:cnt].reshape(s)
        ms = seg.time_op(f"chain {s}", chain, (x,), args.reps)
        gbs = cnt * 2 * 2 / max(ms, 1e-6) * 1e3 / 1e9  # ~2B * (r+w) per elem
        print(f"    -> {gbs:7.1f} GB/s effective")

    # reshape cost: merge minor dims then chain then split back
    x4 = base.reshape(32, 256, 256, 2)

    def chain_via_merge(x):
        m = x.reshape(32, 256, 256 * 2)
        return chain(m).reshape(32, 256, 256, 2)

    seg.time_op("chain via merge-reshape (256,2)->512", chain_via_merge,
                (x4,), args.reps)

    def chain_via_flat(x):
        m = x.reshape(-1, 128)
        return chain(m).reshape(32, 256, 256, 2)

    seg.time_op("chain via flat reshape", chain_via_flat, (x4,), args.reps)

    # per-channel affine (BN-like): needs C distinguishable after merge
    g = jnp.arange(2, dtype=jnp.bfloat16) + 1.0

    def bn_like_nhwc(x):
        return jnp.maximum(x * g + 0.5, 0)

    seg.time_op("bn-like NHWC C=2", bn_like_nhwc, (x4,), args.reps)

    gT = jnp.tile(g, 256)

    def bn_like_merged(x):
        m = x.reshape(32, 256, 256 * 2)
        return jnp.maximum(m * gT + 0.5, 0).reshape(32, 256, 256, 2)

    seg.time_op("bn-like merged (g tiled on T*C)", bn_like_merged,
                (x4,), args.reps)
    os._exit(0)


if __name__ == "__main__":
    main()
