"""Aggregate xprof per-op self-times into model regions.

Joins the newest captured xplane (bench/xprof.py --logdir) with the
optimized-HLO op_name metadata of the SAME compiled train step, and buckets
self-time by region (enc0..enc6, dec0..dec6, lstm, fc, attention, stft,
pipeline, optimizer, dropout) — the per-category table VERDICT r4 task 2
asks for.

Usage: python bench/region_agg.py [--batch 128] [--iters 10]
       (after a bench/xprof.py capture with the same flags)
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax"))

REGION_PATTERNS = [
    ("lstm", r"lstm|while"),
    ("enc0", r"enc0_"), ("enc1", r"enc1_"), ("enc2", r"enc2_"),
    ("enc3", r"enc3_"), ("enc4", r"enc4_"), ("enc5", r"enc5_"),
    ("enc6", r"enc6_"),
    ("dec0", r"dec0_"), ("dec1", r"dec1_"), ("dec2", r"dec2_"),
    ("dec3", r"dec3_"), ("dec4", r"dec4_"), ("dec5", r"dec5_"),
    ("dec6", r"dec6_"),
    ("attention", r"_ca/|_sa/|attention"),
    ("initial_bn", r"initial_bn"),
    ("fc", r"/fc/"),
    ("stft/istft", r"stft|istft|dft|polar|spec_to_wave"),
    ("masks/loss", r"mask|bound|sisnr|loss|crm"),
    ("dropout", r"dropout|random_bits|threefry|rng"),
    ("optimizer", r"adam|opt_update|clip|global_norm"),
]


def region_of(op_name: str) -> str:
    low = op_name.lower()
    for name, pat in REGION_PATTERNS:
        if re.search(pat, low):
            return name
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="dcs")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--crop", type=int, default=8160)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--logdir", default="/tmp/xprof")
    p.add_argument("--unattributed", type=int, default=15,
                   help="print the N largest ops with no op_name metadata")
    p.add_argument("--show", default=None,
                   help="print the largest ops landing in this region")
    args = p.parse_args()

    from xprof import build_step

    step, state, batch, rng = build_step(args.variant, args.batch, args.crop,
                                         args.dtype)
    import jax  # noqa: F401

    compiled = step.lower(state, batch, rng).compile()
    txt = compiled.as_text()
    op2name = {}
    for m in re.finditer(
            r"%?([\w.\-]+) = [^\n]*metadata=\{[^\n}]*op_name=\"([^\"]*)\"",
            txt):
        op2name[m.group(1)] = m.group(2)

    planes = sorted(glob.glob(os.path.join(
        args.logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not planes:
        print("no xplane found — run bench/xprof.py first", file=sys.stderr)
        os._exit(1)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(planes[-1], "rb") as f:
        xs.ParseFromString(f.read())
    dev = next(p_ for p_ in xs.planes if p_.name.startswith("/device:TPU"))
    ops_line = next(l for l in dev.lines if l.name == "XLA Ops")
    stat_names = {k: v.name for k, v in dev.stat_metadata.items()}

    per_region = {}
    unattributed = {}
    shown = {}
    total = 0.0
    for ev in ops_line.events:
        md = dev.event_metadata[ev.metadata_id]
        hlo = md.name.split(" = ")[0].lstrip("%")
        dur_ps = ev.duration_ps
        for s in ev.stats:
            if stat_names.get(s.metadata_id, "") == "device_duration_ps" \
                    and s.uint64_value:
                dur_ps = s.uint64_value
        us = dur_ps / 1e6
        total += us
        name = op2name.get(hlo, "")
        if not name:
            unattributed[hlo] = unattributed.get(hlo, 0.0) + us
        reg = region_of(name) if name else region_of(hlo)
        per_region[reg] = per_region.get(reg, 0.0) + us
        if args.show and reg == args.show:
            key = f"{hlo}  {name[-130:]}"
            shown[key] = shown.get(key, 0.0) + us

    print(f"total {total/1e3:.2f} ms = {total/1e3/args.iters:.3f} ms/step "
          f"({len(op2name)} ops with metadata)\n")
    print(f"{'ms/step':>9}  {'%':>5}  region")
    for reg, us in sorted(per_region.items(), key=lambda kv: -kv[1]):
        print(f"{us/args.iters/1e3:9.3f}  {us/total*100:5.1f}  {reg}")
    if shown:
        print(f"\n-- largest ops in region '{args.show}' --")
        for key, us in sorted(shown.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{us/args.iters/1e3:9.3f}  {key}")
    if unattributed:
        print("\n-- largest ops with NO op_name metadata "
              "(bucketed by hlo name) --")
        for hlo, us in sorted(unattributed.items(),
                              key=lambda kv: -kv[1])[:args.unattributed]:
            print(f"{us/args.iters/1e3:9.3f}  {hlo}")
    os._exit(0)


if __name__ == "__main__":
    main()
