"""Autotune table: every conv layer shape in the DCS model x implementation.

For each conv in the flagship DCS config (packed-complex channel counts) this
times forward and forward+backward for the candidate implementations:

  xla      lax.conv_general_dilated as the layers use today
  im2col   conv_general_dilated_patches -> one big matmul
  shiftmm  sum over k*k taps of strided-slice matmuls (no patch blowup)
  pallas   ops/pallas_conv tap-packed kernel (stride-1 'same' small-cout only)

The per-(shape, direction) winners feed the dispatch rules in
ops/conv_engine.py and the committed table in BASELINE.md (VERDICT r2 task 1).

Usage: python bench/conv_tune.py [--batch 32] [--reps 20] [--csv out.csv]
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


def measure(fn, args, reps):
    """Median-ish single-dispatch timing of `reps` in-jit iterations; the
    scan carry perturbs the first arg (no hoisting) and the output feeds the
    carry (no DCE). One D2H fetch fences the dispatch."""
    def scanned(c0, args):
        def body(c, _):
            first, *rest = args
            out = fn(first + c.astype(first.dtype) * 1e-30, *rest)
            s = sum(o.astype(jnp.float32).sum() for o in jax.tree.leaves(out))
            return c + s * 1e-30, None
        return jax.lax.scan(body, c0, None, length=reps)[0]
    jf = jax.jit(scanned)
    float(np.asarray(jf(jnp.float32(0), args)))  # compile+warm
    best = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        float(np.asarray(jf(jnp.float32(1 + i), args)))
        best = min(best, time.perf_counter() - t0)
    return max(best - RTT, 0.0) / reps * 1e3


def conv_xla(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, stride, ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_im2col(x, w, stride, pad):
    K, _, CIN, COUT = w.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, (K, K), stride, ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (B, HO, WO, CIN*K*K)
    # patches feature order is (cin, kh, kw) minor-to-major per docs: actually
    # channel-major (cin slowest). Match by reshaping w to the same order.
    w2 = jnp.transpose(w, (2, 0, 1, 3)).reshape(CIN * K * K, COUT)
    return jax.lax.dot_general(patches, w2, (((3,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32
                               ).astype(x.dtype)


def conv_shiftmm(x, w, stride, pad):
    K, _, CIN, COUT = w.shape
    B, H, W, _ = x.shape
    sh, sw = stride
    HO = (H + 2 * pad - K) // sh + 1
    WO = (W + 2 * pad - K) // sw + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    y = jnp.zeros((B, HO, WO, COUT), jnp.float32)
    for dy in range(K):
        for dx in range(K):
            sl = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (B, dy + (HO - 1) * sh + 1, dx + (WO - 1) * sw + 1, CIN),
                (1, sh, sw, 1))
            y = y + jax.lax.dot_general(
                sl, w[dy, dx], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def main():
    global RTT
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--csv", default=None)
    p.add_argument("--only", default=None, help="substring filter on layer name")
    args = p.parse_args()
    B = args.batch
    dt = jnp.dtype(args.dtype)

    from dcs_net_tpu.ops.pallas_conv import conv2d_same_small_cout

    # (name, (H, W, CIN), COUT, K, stride) — packed-complex DCS shapes
    layers = [
        ("enc0", (256, 256, 2), 16, 7, (2, 2)),
        ("enc1", (128, 128, 16), 32, 7, (2, 2)),
        ("enc2", (64, 64, 32), 64, 5, (2, 2)),
        ("enc3", (32, 32, 64), 128, 5, (2, 1)),
        ("enc4", (16, 32, 128), 256, 3, (2, 1)),
        ("enc5", (8, 32, 256), 256, 3, (2, 1)),
        ("enc6", (4, 32, 256), 256, 3, (2, 1)),
        ("dec0", (4, 32, 512), 256, 3, (1, 1)),
        ("dec1", (8, 32, 512), 256, 3, (1, 1)),
        ("dec2", (16, 32, 512), 128, 3, (1, 1)),
        ("dec3", (32, 32, 256), 64, 3, (1, 1)),
        ("dec4", (64, 64, 128), 32, 3, (1, 1)),
        ("dec5", (128, 128, 64), 16, 3, (1, 1)),
        ("dec6", (256, 256, 32), 2, 3, (1, 1)),
        ("sa256", (256, 256, 4), 2, 7, (1, 1)),
        ("sa128", (128, 128, 4), 2, 7, (1, 1)),
        ("sa64", (64, 64, 4), 2, 7, (1, 1)),
    ]

    triv = jax.jit(lambda v: v + 1.0)
    float(np.asarray(triv(jnp.float32(0))))
    ts = []
    for i in range(10):
        t0 = time.perf_counter()
        float(np.asarray(triv(jnp.float32(i))))
        ts.append(time.perf_counter() - t0)
    RTT = float(np.median(ts))
    print(f"RTT {RTT*1e3:.2f} ms   batch={B} dtype={args.dtype}")
    rows = []

    for name, (H, W, CIN), COUT, K, stride in layers:
        if args.only and args.only not in name:
            continue
        pad = K // 2
        x = (jax.random.normal(jax.random.PRNGKey(0), (B, H, W, CIN),
                               jnp.float32) * 0.1).astype(dt)
        w = (jax.random.normal(jax.random.PRNGKey(1), (K, K, CIN, COUT),
                               jnp.float32) * 0.05).astype(dt)
        bias = jnp.zeros((COUT,), jnp.float32)
        flops = 2 * B * ((H + 2 * pad - K) // stride[0] + 1) * \
            ((W + 2 * pad - K) // stride[1] + 1) * CIN * K * K * COUT

        impls = {
            "xla": lambda x, w: conv_xla(x, w, stride, pad),
            "im2col": lambda x, w: conv_im2col(x, w, stride, pad),
            "shiftmm": lambda x, w: conv_shiftmm(x, w, stride, pad),
        }
        if stride == (1, 1) and K % 2 == 1 and COUT <= 16 and H % 8 == 0:
            impls["pallas"] = lambda x, w: conv2d_same_small_cout(x, w, bias)

        # parity spot-check vs xla
        ref = np.asarray(impls["xla"](x, w), np.float32)
        for iname, fn in impls.items():
            if iname == "xla":
                continue
            got = np.asarray(fn(x, w), np.float32)
            err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
            assert err < 3e-2, f"{name}/{iname} mismatch rel={err}"

        for iname, fn in impls.items():
            ms_f = measure(fn, (x, w), args.reps)

            def vg(x, w, fn=fn):
                l, g = jax.value_and_grad(
                    lambda a, b: fn(a, b).astype(jnp.float32).sum(),
                    argnums=(0, 1))(x, w)
                return (l,) + g
            ms_fb = measure(vg, (x, w), max(args.reps // 2, 5))
            eff = flops / 1e9 / max(ms_f, 1e-6) / 197.0 * 100 / 1e0
            print(f"{name:6s} {iname:8s} fwd {ms_f:8.3f} ms ({eff:5.1f}% mxu)"
                  f"   f+b {ms_fb:8.3f} ms", flush=True)
            rows.append((name, iname, ms_f, ms_fb, flops))

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("layer,impl,fwd_ms,fwdbwd_ms,flops\n")
            for r in rows:
                f.write(",".join(str(v) for v in r) + "\n")
    # per-layer winners
    print("\n== winners ==")
    for name in dict.fromkeys(r[0] for r in rows):
        sub = [r for r in rows if r[0] == name]
        bf = min(sub, key=lambda r: r[2])
        bb = min(sub, key=lambda r: r[3])
        print(f"{name:6s} fwd: {bf[1]:8s} {bf[2]:.3f} ms   "
              f"f+b: {bb[1]:8s} {bb[3]:.3f} ms")


if __name__ == "__main__":
    main()
    os._exit(0)
