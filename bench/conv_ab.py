"""A/B: XLA lax.conv vs tap-packed matmul for small-cout convs (dec6 shape).

dec6: (32, 256, 256, 32) -> (32, 256, 256, 2), k=3x3 'same'.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.cache/jax")
import jax
import jax.numpy as jnp
import numpy as np

B, H, W, CIN, COUT, K = 32, 256, 256, 32, 2, 3
DT = jnp.bfloat16


def time_rep(fn, args, reps=30):
    def scanned(c0, args):
        def body(c, _):
            first, *rest = args
            # perturb-by-carry so the body isn't loop-invariant (no hoisting)
            out = fn(first + c.astype(first.dtype) * 1e-30, *rest)
            s = sum(o.astype(jnp.float32).sum() for o in jax.tree.leaves(out))
            return c + s * 1e-30, None
        return jax.lax.scan(body, c0, None, length=reps)[0]
    jf = jax.jit(scanned)
    float(np.asarray(jf(jnp.float32(0), args)))
    t0 = time.perf_counter()
    float(np.asarray(jf(jnp.float32(1), args)))
    return (time.perf_counter() - t0 - RTT) / reps * 1e3


x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, CIN)).astype(DT)
w = jax.random.normal(jax.random.PRNGKey(1), (K, K, CIN, COUT)).astype(DT) * 0.1

triv = jax.jit(lambda v: v + 1.0)
float(np.asarray(triv(jnp.float32(0))))
ts = []
for i in range(10):
    t0 = time.perf_counter()
    float(np.asarray(triv(jnp.float32(i))))
    ts.append(time.perf_counter() - t0)
RTT = float(np.median(ts))
print(f"RTT {RTT*1e3:.2f} ms")


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_taps(x, w):
    # T = X @ W2, W2: (CIN, K*K*COUT); then combine 9 shifted T slices.
    w2 = w.transpose(2, 0, 1, 3).reshape(CIN, K * K * COUT)
    t = jax.lax.dot_general(x, w2, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    t = t.reshape(B, H, W, K, K, COUT)
    # pad spatially, then y[h, w] = sum_{dy,dx} t[h+dy-1, w+dx-1, dy, dx]
    tp = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
    y = jnp.zeros((B, H, W, COUT), jnp.float32)
    for dy in range(K):
        for dx in range(K):
            y = y + tp[:, dy:dy + H, dx:dx + W, dy, dx]
    return y.astype(x.dtype)


def conv_shiftmm(x, w):
    # 9 small matmuls on shifted x (no T materialization)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jnp.zeros((B, H, W, COUT), jnp.float32)
    for dy in range(K):
        for dx in range(K):
            y = y + jax.lax.dot_general(
                xp[:, dy:dy + H, dx:dx + W, :], w[dy, dx],
                (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


# parity check
y0 = np.asarray(conv_xla(x, w), np.float32)
y1 = np.asarray(conv_taps(x, w), np.float32)
y2 = np.asarray(conv_shiftmm(x, w), np.float32)
print("max|taps-xla|", np.abs(y1 - y0).max(), " max|shift-xla|", np.abs(y2 - y0).max())

for name, fn in [("xla_conv", conv_xla), ("taps_matmul", conv_taps),
                 ("shift_matmul", conv_shiftmm)]:
    ms = time_rep(fn, (x, w))
    print(f"fwd  {name:14s} {ms:8.3f} ms")

for name, fn in [("xla_conv", conv_xla), ("taps_matmul", conv_taps),
                 ("shift_matmul", conv_shiftmm)]:
    def vg(x, w, fn=fn):
        def loss(x, w):
            return fn(x, w).astype(jnp.float32).sum()
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
        return (l,) + g
    ms = time_rep(vg, (x, w), reps=15)
    print(f"f+b  {name:14s} {ms:8.3f} ms")

os._exit(0)
