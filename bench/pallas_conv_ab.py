"""A/B on real TPU: XLA conv vs Pallas tap-packed kernel (dec6/dec5 shapes)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import jax, jax.numpy as jnp, numpy as np
from dcs_net_tpu.ops import pallas_conv as pc

def time_rep(fn, args, reps=30):
    def scanned(c0, args):
        def body(c, _):
            first, *rest = args
            out = fn(first + c.astype(first.dtype) * 1e-30, *rest)
            s = sum(o.astype(jnp.float32).sum() for o in jax.tree.leaves(out))
            return c + s * 1e-30, None
        return jax.lax.scan(body, c0, None, length=reps)[0]
    jf = jax.jit(scanned)
    float(np.asarray(jf(jnp.float32(0), args)))
    t0 = time.perf_counter()
    float(np.asarray(jf(jnp.float32(1), args)))
    return (time.perf_counter() - t0 - RTT) / reps * 1e3

triv = jax.jit(lambda v: v + 1.0)
float(np.asarray(triv(jnp.float32(0))))
ts = []
for i in range(10):
    t0 = time.perf_counter()
    float(np.asarray(triv(jnp.float32(i))))
    ts.append(time.perf_counter() - t0)
RTT = float(np.median(ts))
print(f"RTT {RTT*1e3:.2f} ms", flush=True)

def fb(fn):
    def vg(x, w, b):
        def loss(x, w, b):
            return fn(x, w, b).astype(jnp.float32).sum()
        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, w, b)
        return (l,) + g
    return vg

for (tag, B, H, W, CIN, COUT) in [
        ("dec6", 32, 256, 256, 32, 2),
        ("dec5", 32, 128, 128, 64, 16),
]:
    K = 3
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, CIN)).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (K, K, CIN, COUT)) * 0.1).astype(jnp.float32)
    b = (jax.random.normal(jax.random.PRNGKey(2), (COUT,)) * 0.1).astype(jnp.float32)
    ref = np.asarray(pc._conv_fwd_xla(x, w, b), np.float32)
    got = np.asarray(pc._conv_fwd_pallas(x, w, b), np.float32)
    print(f"{tag}: parity max abs diff {np.abs(ref-got).max():.2e} "
          f"(scale {np.abs(ref).max():.2f})", flush=True)
    print(f"{tag}: fwd xla    {time_rep(pc._conv_fwd_xla, (x, w, b)):8.3f} ms", flush=True)
    print(f"{tag}: fwd pallas {time_rep(lambda x,w,b: pc._conv_fwd_pallas(x,w,b), (x, w, b)):8.3f} ms", flush=True)
    print(f"{tag}: f+b xla    {time_rep(fb(pc._conv_fwd_xla), (x, w, b), reps=15):8.3f} ms", flush=True)
    print(f"{tag}: f+b pallas {time_rep(fb(pc.conv2d_same_small_cout), (x, w, b), reps=15):8.3f} ms", flush=True)
os._exit(0)
