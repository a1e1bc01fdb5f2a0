"""Ground-truth per-op device profile of the REAL train step via jax.profiler.

The piecewise benches (segments.py / conv_tune.py) time ops in isolation on a
network-attached chip where the ~30 ms dispatch RTT dominates and hides
sub-ms effects; this script instead captures an XLA device trace of the actual
compiled train step and prints the top HLO ops by self-time — the table
VERDICT r2 task 1 asks to commit to BASELINE.md.

Usage: python bench/xprof.py [--variant dcs] [--batch 32] [--iters 5]
       [--dtype bfloat16] [--top 40] [--logdir /tmp/xprof]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

# tensorboard_plugin_profile ships pre-generated _pb2.py files older than the
# installed protobuf; the pure-python fallback accepts them
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax"))

import jax
import jax.numpy as jnp
import numpy as np


def build_step(variant, batch, crop, dtype):
    import dataclasses

    from dcs_net_tpu.utils.platform import enable_fast_rng

    enable_fast_rng()

    from dcs_net_tpu.core.config import config_for_variant
    from dcs_net_tpu.models.unet import DCSNet
    from dcs_net_tpu.train import steps as S
    from dcs_net_tpu.train.optim import make_optimizer

    cfg = config_for_variant(variant)
    cfg = cfg.replace(quirks=cfg.quirks.perf())
    cfg = cfg.replace(
        data=cfg.data.__class__(crop_samples=crop, batch_size=batch),
        model=dataclasses.replace(cfg.model, compute_dtype=dtype))
    model = DCSNet(cfg.model, cfg.quirks)
    tx = make_optimizer(cfg.optim)
    rng = jax.random.PRNGKey(0)
    clean = jax.random.normal(rng, (batch, crop), jnp.float32) * 0.1
    noise = jax.random.normal(jax.random.PRNGKey(1), (batch, crop)) * 0.02
    batch_ = jax.jit(lambda n, c: S.batch_from_waves(n + c, c, cfg))(noise, clean)
    sample = batch_.noisy if cfg.model.complex_valued else batch_.noisy.abs()
    state = S.init_state(model, cfg, tx, rng, sample)
    inner = S.make_train_step(model, cfg, tx)

    def full(st, b, r):
        st2, m = inner(st, b, r)
        return st2, m["loss"]

    return jax.jit(full, donate_argnums=(0,)), state, batch_, rng


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="dcs")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--crop", type=int, default=8160)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--logdir", default="/tmp/xprof")
    p.add_argument("--csv", default=None)
    p.add_argument("--parse-only", action="store_true",
                   help="skip capture; parse the newest xplane in --logdir")
    args = p.parse_args()

    if not args.parse_only:
        step, state, batch, rng = build_step(args.variant, args.batch,
                                             args.crop, args.dtype)
        # warm up / compile outside the trace
        for i in range(2):
            state, loss = step(state, batch, jax.random.fold_in(rng, i))
        print(f"warm loss={float(np.asarray(loss)):.4f}", file=sys.stderr)

        with jax.profiler.trace(args.logdir):
            for i in range(args.iters):
                state, loss = step(state, batch,
                                   jax.random.fold_in(rng, 100 + i))
            float(np.asarray(loss))  # fence inside the trace

    planes = sorted(glob.glob(os.path.join(
        args.logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not planes:
        print("no xplane captured — device tracing unsupported here?",
              file=sys.stderr)
        os._exit(1)
    xplane = planes[-1]
    print(f"xplane: {xplane}", file=sys.stderr)

    # parse the XSpace proto directly (the tensorboard_plugin_profile native
    # converter is ABI-mismatched with the installed TF in this image)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        xs.ParseFromString(f.read())
    dev = next(p for p in xs.planes if p.name.startswith("/device:TPU"))
    ops_line = next(l for l in dev.lines if l.name == "XLA Ops")
    mod_line = next((l for l in dev.lines if l.name == "XLA Modules"), None)
    stat_names = {k: v.name for k, v in dev.stat_metadata.items()}

    agg = {}   # (tf_op_or_hlo, category) -> us
    for ev in ops_line.events:
        md = dev.event_metadata[ev.metadata_id]
        hlo = md.name.split(" = ")[0].lstrip("%")
        cat, tf_op = "", ""
        dur_ps = ev.duration_ps
        for s in ev.stats:
            n = stat_names.get(s.metadata_id, "")
            if n == "hlo_category":
                cat = s.str_value or xs.stat_metadata and ""
            elif n == "tf_op":
                tf_op = s.str_value
            elif n == "device_duration_ps" and s.uint64_value:
                dur_ps = s.uint64_value
        key = (tf_op or hlo, cat or _category(hlo))
        agg[key] = agg.get(key, 0.0) + dur_ps / 1e6  # ps -> us
    total = sum(agg.values())
    per_iter = total / max(args.iters, 1)
    if mod_line is not None and len(mod_line.events):
        mod_us = sum(e.duration_ps for e in mod_line.events) / 1e6
        print(f"XLA module device time: {mod_us/1e3:.2f} ms total, "
              f"{mod_us/1e3/args.iters:.3f} ms/step over {args.iters} iters")
    print(f"op self-time total {total/1e3:.2f} ms = {per_iter/1e3:.3f} "
          f"ms/step\n")
    print(f"{'ms/step':>9}  {'%':>5}  {'category':<14} op")
    items = sorted(agg.items(), key=lambda kv: -kv[1])
    for (name, cat), us in items[:args.top]:
        print(f"{us/args.iters/1e3:9.3f}  {us/total*100:5.1f}  {cat:<14} "
              f"{name[:110]}")
    by_cat = {}
    for (_, cat), us in agg.items():
        by_cat[cat] = by_cat.get(cat, 0.0) + us
    print("\n-- by category --")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{us/args.iters/1e3:9.3f}  {us/total*100:5.1f}  {cat}")
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("op,category,us_total,ms_per_iter\n")
            for (name, cat), us in items:
                f.write(f"\"{name}\",{cat},{us:.1f},{us/args.iters/1e3:.4f}\n")
    os._exit(0)


def _category(hlo_name: str) -> str:
    base = hlo_name.split(".")[0]
    if "convolution" in base:
        return "convolution"
    if "fusion" in base:
        return "fusion"
    if "dot" in base:
        return "dot"
    if "copy" in base or "transpose" in base or "bitcast" in base:
        return "data-movement"
    if "all-reduce" in base or "all-gather" in base:
        return "collective"
    return base[:20]


if __name__ == "__main__":
    main()
