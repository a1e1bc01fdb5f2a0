"""Per-stage A/B: decoder upsample+conv and encoder strided-conv variants at
the REAL flagship shapes, timed on-chip with the in-jit scan + D2H fence
pattern (bench/segments.py). Small compiles -> minutes per sweep instead of
the ~15 min full-step cycle.

Usage: python bench/stage_ab.py [--reps 30] [--stages dec4,dec5,enc0,...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from dcs_net_tpu.ops import conv_engine as ce

DT = jnp.bfloat16
B = 32

# (name, H, W, cin_list, cout, scale) — complex-packed decoder stages
DEC_STAGES = [
    ("dec3", 16, 32, (128, 128), 64, (2, 1)),
    ("dec4", 32, 32, (64, 64), 32, (2, 2)),
    ("dec5", 64, 64, (32, 32), 16, (2, 2)),
    ("dec6", 128, 128, (16, 16), 2, (2, 2)),
]
# (name, H, W, cin, cout, K, stride) — complex-packed encoder stages
ENC_STAGES = [
    ("enc0", 256, 256, 2, 16, 7, (2, 2)),
    ("enc1", 128, 128, 16, 32, 7, (2, 2)),
    ("enc2", 64, 64, 32, 64, 5, (2, 2)),
    ("enc3", 32, 32, 64, 128, 5, (2, 1)),
    ("enc4", 16, 32, 128, 256, 3, (2, 1)),
]

RTT = None


def measure_rtt():
    global RTT
    triv = jax.jit(lambda v: v + 1.0)
    float(np.asarray(triv(jnp.float32(0))))
    ts = []
    for i in range(10):
        t0 = time.perf_counter()
        float(np.asarray(triv(jnp.float32(i))))
        ts.append(time.perf_counter() - t0)
    RTT = float(np.median(ts))
    print(f"# RTT {RTT * 1e3:.2f} ms", file=sys.stderr)


def time_rep(fn, args, reps):
    def scanned(c0, args):
        def body(c, _):
            first, *rest = args
            out = fn(first + c.astype(first.dtype) * 1e-30, *rest)
            s = sum(o.astype(jnp.float32).sum()
                    for o in jax.tree.leaves(out))
            return c + s * 1e-30, None
        return jax.lax.scan(body, c0, None, length=reps)[0]

    jf = jax.jit(scanned)
    float(np.asarray(jf(jnp.float32(0), args)))
    best = np.inf
    for i in range(2):
        t0 = time.perf_counter()
        float(np.asarray(jf(jnp.float32(1 + i), args)))
        best = min(best, time.perf_counter() - t0)
    return (best - RTT) / reps * 1e3


# ---- decoder variants -------------------------------------------------------

def updot_xla(xs, ws, scale):
    old = ce._pallas_fwd_enabled
    ce._pallas_fwd_enabled = lambda: False
    try:
        return ce.upsampled_conv2d_multi(xs, ws, scale)
    finally:
        ce._pallas_fwd_enabled = old


def updot_pallas(xs, ws, scale):
    old = ce._pallas_fwd_enabled
    ce._pallas_fwd_enabled = lambda: True
    try:
        return ce.upsampled_conv2d_multi(xs, ws, scale)
    finally:
        ce._pallas_fwd_enabled = old


def tapfold_r3(xs, ws, scale):
    """The round-3 per-phase tap-fold implementation (from git a6c33a6)."""
    xs, ws = tuple(xs), tuple(ws)
    K = ws[0].shape[0]
    p = K // 2
    s_h, s_w = scale
    Bq, H, W, _ = xs[0].shape
    Cout = ws[0].shape[-1]
    folds_h = ce._phase_fold(K, p, s_h)
    folds_w = ce._phase_fold(K, p, s_w)
    phases = []
    for dh_min, fh in folds_h:
        fh = jnp.asarray(fh)
        ndh = fh.shape[0]
        for dw_min, fw in folds_w:
            fw = jnp.asarray(fw)
            ndw = fw.shape[0]
            kerns = [jnp.einsum("ak,bl,klio->abio", fh, fw,
                                w.astype(jnp.float32)).astype(w.dtype)
                     for w in ws]
            plh, prh = max(-dh_min, 0), max(dh_min + ndh - 1, 0)
            plw, prw = max(-dw_min, 0), max(dw_min + ndw - 1, 0)
            if ndh * ndw * Cout <= 144:
                t = None
                for x, kern in zip(xs, kerns):
                    Cin = x.shape[-1]
                    xp = jnp.pad(x, ((0, 0), (plh, prh), (plw, prw), (0, 0)))
                    w2 = jnp.transpose(kern, (2, 0, 1, 3)).reshape(
                        Cin, ndh * ndw * Cout).astype(x.dtype)
                    tj = jax.lax.dot_general(
                        xp, w2, (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    t = tj if t is None else t + tj
                t = t.astype(xs[0].dtype)
                acc = jnp.zeros((Bq, H, W, Cout), jnp.float32)
                for jh in range(ndh):
                    for jw in range(ndw):
                        tap = jh * ndw + jw
                        acc = acc + jax.lax.slice(
                            t, (0, jh, jw, tap * Cout),
                            (Bq, jh + H, jw + W, (tap + 1) * Cout)
                        ).astype(jnp.float32)
                ph = acc.astype(xs[0].dtype)
            else:
                y = None
                for x, kern in zip(xs, kerns):
                    xp = jnp.pad(x, ((0, 0), (plh, prh), (plw, prw), (0, 0)))
                    yj = jax.lax.conv_general_dilated(
                        xp, kern.astype(x.dtype), (1, 1), ((0, 0), (0, 0)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    y = yj if y is None else y + yj
                ph = y
            phases.append(ph)
    return ce._interleave_phases(phases, s_h, s_w, Cout)


def conv_materialized(xs, ws, scale):
    """Materialized nearest-upsample + concat + XLA conv."""
    s_h, s_w = scale
    x = jnp.concatenate(xs, -1)
    x = jnp.repeat(jnp.repeat(x, s_h, 1), s_w, 2)
    w = jnp.concatenate(ws, 2)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---- encoder variants -------------------------------------------------------

def enc_xla(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w, stride, ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def enc_patchdot(x, w, stride, padding):
    return ce.conv2d_strided_tuned(x, w, stride, padding)


# (name, H, W, cin, cout) — complex-packed SA convs (k7, stride 1 'same')
SA_STAGES = [
    ("sa128", 128, 128, 4, 2),
    ("sa64", 64, 64, 4, 2),
    ("sa32", 32, 32, 4, 2),
]


def sa_variants():
    def mk(mode):
        def f(x, w):
            old = ce.SAME_BWD
            ce.SAME_BWD = mode
            try:
                return ce.conv2d_same_tuned(x, w)
            finally:
                ce.SAME_BWD = old
        return f
    return [("bwd_rowdot", mk("rowdot")), ("bwd_patchdot", mk("patchdot")),
            ("xla_conv", lambda x, w: _conv_same_xla(x, w))]


def _conv_same_xla(x, w):
    p = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def grad_of(fn, *args_template):
    def vg(*args):
        def loss(*a):
            out = fn(*a)
            return out.astype(jnp.float32).sum()
        return jax.grad(loss, argnums=tuple(range(len(args))))(*args)
    return vg


def main():
    global B
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--stages", default=None)
    ap.add_argument("--skip-bwd", action="store_true")
    ap.add_argument("--batch", type=int, default=B)
    args = ap.parse_args()
    B = args.batch
    want = set(args.stages.split(",")) if args.stages else None
    measure_rtt()
    key = jax.random.PRNGKey(0)

    for name, H, W, cin, cout in SA_STAGES:
        if want and name not in want:
            continue
        x = jax.random.normal(key, (B, H, W, cin)).astype(DT)
        w = jax.random.normal(key, (7, 7, cin, cout)).astype(DT) * 0.1
        for vname, fn in sa_variants():
            try:
                tf = time_rep(fn, (x, w), args.reps)
                tb = (np.nan if args.skip_bwd
                      else time_rep(grad_of(fn), (x, w), args.reps))
                print(f"{name:7s} {vname:16s} {tf:8.3f} {tb:11.3f}", flush=True)
            except Exception as e:
                print(f"{name:7s} {vname:16s} FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)

    print(f"{'stage':7s} {'variant':16s} {'fwd ms':>8s} {'fwd+bwd ms':>11s}")
    for name, H, W, cins, cout, scale in DEC_STAGES:
        if want and name not in want:
            continue
        xs = tuple(jax.random.normal(jax.random.fold_in(key, i),
                                     (B, H, W, c)).astype(DT)
                   for i, c in enumerate(cins))
        ws = tuple(jax.random.normal(jax.random.fold_in(key, 10 + i),
                                     (3, 3, c, cout)).astype(DT) * 0.1
                   for i, c in enumerate(cins))
        variants = [("unified_xla", updot_xla), ("unified_pallas", updot_pallas),
                    ("tapfold_r3", tapfold_r3), ("conv_mat", conv_materialized)]
        for vname, fn in variants:
            def fwd(x0, *rest):
                n = len(cins)
                allx = (x0,) + rest[:n - 1]
                return fn(allx, rest[n - 1:], scale)
            a = xs + ws
            try:
                tf = time_rep(fwd, a, args.reps)
                tb = (np.nan if args.skip_bwd
                      else time_rep(grad_of(fwd), a, args.reps))
                print(f"{name:7s} {vname:16s} {tf:8.3f} {tb:11.3f}", flush=True)
            except Exception as e:
                print(f"{name:7s} {vname:16s} FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)

    for name, H, W, cin, cout, K, stride in ENC_STAGES:
        if want and name not in want:
            continue
        x = jax.random.normal(key, (B, H, W, cin)).astype(DT)
        w = jax.random.normal(key, (K, K, cin, cout)).astype(DT) * 0.1
        for vname, fn in [("xla_conv", enc_xla), ("patchdot", enc_patchdot)]:
            def fwd(x, w, fn=fn):
                return fn(x, w, stride, K // 2)
            try:
                tf = time_rep(fwd, (x, w), args.reps)
                tb = (np.nan if args.skip_bwd
                      else time_rep(grad_of(fwd), (x, w), args.reps))
                print(f"{name:7s} {vname:16s} {tf:8.3f} {tb:11.3f}", flush=True)
            except Exception as e:
                print(f"{name:7s} {vname:16s} FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
