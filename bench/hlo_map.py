"""Map profiled HLO op names (bench/xprof.py output) to python source lines.

Compiles the same train step xprof profiles, dumps the optimized HLO text,
and prints the definition line (with op_name/source metadata) for each
requested op — so `fusion.1209` in the profile becomes "dec3 BN normalize,
complex_layers.py:207" and the optimization target is unambiguous.

Usage: python bench/hlo_map.py fusion.1209 copy.9561 ...
       python bench/hlo_map.py --dump /tmp/step.hlo.txt   (full dump)
"""
from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax"))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ops", nargs="*", help="HLO op names from xprof")
    p.add_argument("--variant", default="dcs")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--crop", type=int, default=8160)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--dump", default=None, help="write full HLO text here")
    p.add_argument("--context", type=int, default=0,
                   help="lines of HLO context around each hit")
    args = p.parse_args()

    from xprof import build_step  # noqa: E402  (bench/ sibling)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    step, state, batch, rng = build_step(args.variant, args.batch, args.crop,
                                         args.dtype)
    compiled = step.lower(state, batch, rng).compile()
    txt = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(txt)
        print(f"dumped {len(txt)} bytes -> {args.dump}")
    lines = txt.splitlines()
    for op in args.ops:
        pat = re.compile(rf"^\s*(ROOT\s+)?%?{re.escape(op)}\s*=")
        hits = [i for i, l in enumerate(lines) if pat.search(l)]
        print(f"\n=== {op}: {len(hits)} definition(s) ===")
        for i in hits:
            for j in range(max(0, i - args.context),
                           min(len(lines), i + args.context + 1)):
                line = lines[j]
                # keep metadata; trim giant operand lists
                if len(line) > 600:
                    line = line[:300] + " ... " + line[-280:]
                print(line)
            # fusions: also print their computation's interesting ops
            m = re.search(r"calls=([%\w.\-]+)", lines[i])
            if m:
                comp = m.group(1).lstrip("%")
                cpat = re.compile(rf"^%?{re.escape(comp)}\s")
                starts = [k for k, l in enumerate(lines) if cpat.search(l)]
                for k in starts:
                    depth = 0
                    for j in range(k, min(len(lines), k + 400)):
                        line = lines[j]
                        if "metadata=" in line and ("op_name=" in line):
                            mm = re.search(
                                r'op_name="([^"]*)"(?:.*?source_file="([^"]*)"'
                                r'.*?source_line=(\d+))?', line)
                            if mm:
                                head = line.strip().split(" = ")[0]
                                print(f"    {head[:60]:<60} {mm.group(1)[:90]}"
                                      + (f"  {os.path.basename(mm.group(2))}:"
                                         f"{mm.group(3)}" if mm.group(2)
                                         else ""))
                        depth += line.count("{") - line.count("}")
                        if j > k and depth <= 0:
                            break
    os._exit(0)


if __name__ == "__main__":
    main()
