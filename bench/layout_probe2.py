"""Decisive lane-layout probe (fixes layout_probe.py's bf16-underflow bug).

layout_probe.py perturbed scan iterations with ``c * 1e-30`` which underflows
to 0 in bfloat16, so XLA hoisted the timed op out of the scan and every bf16
row read ~0 ms. This probe perturbs with a representable scale and times:

  * an elementwise chain over the SAME elements at different trailing shapes
    (narrow-C NHWC vs merged-minor vs flat-128)
  * the merge-reshape round trip itself
  * a BN-like per-channel affine in narrow vs lane-tiled form
  * complex-multiply as 2 planes vs packed+swap form

Usage: python bench/layout_probe2.py [--reps 100]
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

RTT = 0.0


def time_op(name, fn, x, reps, bytes_moved=None):
    """Times fn(x) reps times inside one dispatch; perturbation keeps the op
    live in the loop (scale 2^-7 is exactly representable in bf16)."""

    def scanned(c0, x):
        def body(c, _):
            out = fn(x * (1.0 + c * 0.0078125).astype(x.dtype))
            return c + out.astype(jnp.float32).mean() * 1e-12, None

        c, _ = jax.lax.scan(body, c0, None, length=reps)
        return c

    jf = jax.jit(scanned)
    float(np.asarray(jf(jnp.float32(0), x)))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(jf(jnp.float32(1), x)))
    dt = time.perf_counter() - t0
    ms = max(dt - RTT, 0.0) / reps * 1e3
    note = ""
    if bytes_moved:
        note = f"  {bytes_moved / max(ms, 1e-9) * 1e3 / 1e9:7.1f} GB/s"
    print(f"{name:46s} {ms:9.4f} ms{note}")
    return ms


def main():
    global RTT
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=100)
    args = p.parse_args()

    trivial = jax.jit(lambda x: x + 1)
    float(np.asarray(trivial(jnp.float32(0))))
    t0 = time.perf_counter()
    for _ in range(5):
        float(np.asarray(trivial(jnp.float32(0))))
    RTT = (time.perf_counter() - t0) / 5
    print(f"RTT {RTT * 1e3:.1f} ms")

    def chain(x):
        y = jnp.maximum(x * 1.01 + 0.5, 0.0)
        return jnp.where(y > 0.25, y * 1.1, y)

    rng = jax.random.PRNGKey(0)
    n = 32 * 256 * 256 * 2  # enc-input scale, 4.2M elements
    base = jax.random.normal(rng, (n,), jnp.float32).astype(jnp.bfloat16)
    byt = n * 2 * 2  # read + write

    for s in [(32, 256, 256, 2), (32, 128, 128, 8), (32, 64, 64, 32),
              (32, 256, 512), (n // 128, 128)]:
        cnt = int(np.prod(s))
        time_op(f"chain {s}", chain, base[:cnt].reshape(s), args.reps,
                cnt * 2 * 2)

    x4 = base.reshape(32, 256, 256, 2)

    def chain_merge(x):
        return chain(x.reshape(32, 256, 512)).reshape(32, 256, 256, 2)

    time_op("chain via merge (256,2)->512", chain_merge, x4, args.reps, byt)

    def chain_flat(x):
        return chain(x.reshape(-1, 128)).reshape(32, 256, 256, 2)

    time_op("chain via flat (-1,128)", chain_flat, x4, args.reps, byt)

    # BN-like per-channel affine, C=2
    g2 = (jnp.arange(2, dtype=jnp.float32) + 1.0).astype(jnp.bfloat16)
    time_op("bn-like NHWC C=2", lambda x: jnp.maximum(x * g2 + 0.5, 0),
            x4, args.reps, byt)
    gt = jnp.tile(g2, 128 // 2)

    def bn_flat(x):
        m = x.reshape(-1, 128)
        return jnp.maximum(m * gt + 0.5, 0).reshape(x.shape)

    time_op("bn-like flat-tiled C=2", bn_flat, x4, args.reps, byt)

    # complex multiply by broadcast attention factor: planes vs packed+swap
    C = 8
    xr = base[: 32 * 128 * 128 * C].reshape(32, 128, 128, C)
    xi = (xr * 0.5).astype(jnp.bfloat16)
    ar = jnp.ones((32, 1, 1, C), jnp.bfloat16)
    ai = jnp.full((32, 1, 1, C), 0.25, jnp.bfloat16)

    def cmul_planes(x):
        re = x * ar - xi * ai
        im = x * ai + xi * ar
        return re + im

    time_op(f"cmul planes C={C} (re input, im capt)", cmul_planes, xr,
            args.reps, xr.size * 2 * 2 * 2)

    xp = jnp.concatenate([xr, xi], -1)
    a1 = jnp.concatenate([ar, ar], -1)
    a2 = jnp.concatenate([-ai, ai], -1)

    def cmul_packed(x):
        sw = jnp.roll(x, C, axis=-1)
        return x * a1 + sw * a2

    time_op(f"cmul packed+roll 2C={2 * C}", cmul_packed, xp, args.reps,
            xp.size * 2 * 2)
    os._exit(0)


if __name__ == "__main__":
    main()
