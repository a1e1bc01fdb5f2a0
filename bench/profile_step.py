"""Component-level timing of the DCS train step with hard D2H fences.

Every timed segment is a jitted function whose output is reduced to a scalar
and fetched to host each iteration — the fetch is the fence (block_until_ready
is unreliable on the axon tunnel). Prints per-segment ms plus XLA cost-analysis
FLOPs so MFU per segment is visible.

Usage: python bench/profile_step.py [--variant dcs] [--batch 32] [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax"))

import jax
import jax.numpy as jnp
import numpy as np

from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.models.unet import DCSNet
from dcs_net_tpu.train import steps as S
from dcs_net_tpu.train.optim import make_optimizer

V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s


def timeit(fn, args, iters=20, warmup=3):
    """Time fn(*args) with a D2H scalar fetch per iteration."""
    for _ in range(warmup):
        out = fn(*args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(np.asarray(out))  # fence every iteration
    dt = (time.perf_counter() - t0) / iters
    return dt


def flops_of(fn, *args):
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception as e:  # cost analysis can fail on axon
        print(f"  (cost_analysis failed: {e})")
        return 0.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="dcs")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--crop", type=int, default=8160)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    cfg = config_for_variant(args.variant)
    cfg = cfg.replace(quirks=cfg.quirks.perf())
    cfg = cfg.replace(
        data=cfg.data.__class__(crop_samples=args.crop, batch_size=args.batch),
        model=dataclasses.replace(cfg.model, compute_dtype=args.dtype))

    model = DCSNet(cfg.model, cfg.quirks)
    tx = make_optimizer(cfg.optim)
    rng = jax.random.PRNGKey(0)
    clean = jax.random.normal(rng, (args.batch, args.crop), jnp.float32) * 0.1
    noise = jax.random.normal(jax.random.PRNGKey(1),
                              (args.batch, args.crop), jnp.float32) * 0.02
    noisy = clean + noise

    batch = jax.jit(lambda n, c: S.batch_from_waves(n, c, cfg))(noisy, clean)
    sample = batch.noisy if cfg.model.complex_valued else batch.noisy.abs()
    state = S.init_state(model, cfg, tx, rng, sample)

    segments = {}

    # 1. dispatch round-trip latency (trivial op)
    triv = jax.jit(lambda x: x + 1.0)
    segments["dispatch_roundtrip"] = (timeit(triv, (jnp.float32(0.0),),
                                             iters=50), 0.0)

    # 2. STFT front-end
    def fe(n, c):
        b = S.batch_from_waves(n, c, cfg)
        return b.noisy.re.sum() + b.noisy.im.sum()
    segments["stft_frontend"] = (timeit(jax.jit(fe), (noisy, clean),
                                        args.iters), flops_of(fe, noisy, clean))

    # 3. forward only (train mode, no grad)
    def fwd(params, bs, x):
        y, _ = model.apply({"params": params, "batch_stats": bs}, x,
                           train=True, rngs={"dropout": rng},
                           mutable=["batch_stats"])
        return (y.re.sum() + y.im.sum()) if hasattr(y, "re") else y.sum()
    segments["forward"] = (
        timeit(jax.jit(fwd), (state.params, state.batch_stats, sample),
               args.iters),
        flops_of(fwd, state.params, state.batch_stats, sample))

    # 4. full pipeline fwd (masks + 5 iSTFTs + losses), no grad
    def pipe(params, bs, b):
        def apply_net(x):
            y, _ = model.apply({"params": params, "batch_stats": bs}, x,
                               train=True, rngs={"dropout": rng},
                               mutable=["batch_stats"])
            return y
        out = S.run_model_and_masks(apply_net, b, cfg)
        return S.pipeline_losses(out, cfg)["loss"]
    segments["pipeline_fwd"] = (
        timeit(jax.jit(pipe), (state.params, state.batch_stats, batch),
               args.iters),
        flops_of(pipe, state.params, state.batch_stats, batch))

    # 5. value_and_grad of the pipeline (grads CONSUMED in the output —
    # returning only the value lets XLA DCE the whole backward)
    def vg(params, bs, b):
        l, g = jax.value_and_grad(lambda p: pipe(p, bs, b))(params)
        return l + sum(x.astype(jnp.float32).sum() for x in jax.tree.leaves(g))
    segments["fwd_bwd"] = (
        timeit(jax.jit(vg), (state.params, state.batch_stats, batch),
               args.iters),
        flops_of(vg, state.params, state.batch_stats, batch))

    # 6. full train step (fwd+bwd+adam+nan gate)
    inner = S.make_train_step(model, cfg, tx)
    def full(st, b, r):
        # consume the UPDATED PARAMS, not just the loss — a loss-only output
        # leaves new_state dead and XLA DCEs backward+adam entirely
        st2, m = inner(st, b, r)
        psum = sum(x.astype(jnp.float32).sum()
                   for x in jax.tree.leaves(st2.params))
        return m["loss"] + psum * 1e-12
    segments["train_step_full"] = (
        timeit(jax.jit(full), (state, batch, rng), args.iters),
        flops_of(full, state, batch, rng))

    # 7. scanned K=8 (amortized per step)
    K = 8
    scanned = S.make_scanned_train_step(model, cfg, tx, K)
    nw = jnp.broadcast_to(noisy, (K,) + noisy.shape)
    cw = jnp.broadcast_to(clean, (K,) + clean.shape)
    def sc(st, n, c, r):
        st2, m = scanned(st, n, c, r)
        psum = sum(x.astype(jnp.float32).sum()
                   for x in jax.tree.leaves(st2.params))
        return m["loss"] + psum * 1e-12
    t = timeit(jax.jit(sc), (state, nw, cw, rng), max(args.iters // 2, 5))
    segments["train_step_scan8_per_step"] = (t / K,
                                             flops_of(sc, state, nw, cw, rng) / K)

    print(f"\n{'segment':34s} {'ms':>10s} {'GFLOP':>10s} {'TFLOP/s':>9s} {'MFU%':>6s}")
    for name, (dt, fl) in segments.items():
        tf = fl / dt / 1e12 if dt > 0 else 0
        mfu = 100 * fl / dt / V5E_BF16_PEAK if dt > 0 else 0
        print(f"{name:34s} {dt*1e3:10.3f} {fl/1e9:10.2f} {tf:9.2f} {mfu:6.2f}")


if __name__ == "__main__":
    main()
    os._exit(0)
