import time
import numpy as np
import jax, jax.numpy as jnp

def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim]).item()

def timed(f, x, K=32, label=""):
    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(lambda c, _: (f(c), None), x, None, length=K)
        return out
    y = run(x); fence(y)
    t0 = time.perf_counter(); y = run(x); fence(y)
    print(f"{label:34s} {(time.perf_counter()-t0)/K*1e3:7.3f} ms/iter")

B = 32
rng = jax.random.PRNGKey(0)
# elementwise chain ~ CBAM-ish: mean over spatial, sigmoid, broadcast multiply
for dt in (jnp.float32, jnp.bfloat16):
    x_nhwc = jax.random.normal(rng, (B, 256, 256, 8), dt)
    def f_nhwc(x):
        ca = jax.nn.sigmoid(jnp.mean(x, axis=(1, 2), keepdims=True,
                                     dtype=jnp.float32).astype(x.dtype))
        x = ca * x
        sa = jax.nn.sigmoid(jnp.mean(x, axis=-1, keepdims=True))
        return (sa * x) * 1.0001
    timed(f_nhwc, x_nhwc, label=f"NHWC C=8 {dt.__name__}")

    x_nchw = jax.random.normal(rng, (B, 8, 256, 256), dt)
    def f_nchw(x):
        ca = jax.nn.sigmoid(jnp.mean(x, axis=(2, 3), keepdims=True,
                                     dtype=jnp.float32).astype(x.dtype))
        x = ca * x
        sa = jax.nn.sigmoid(jnp.mean(x, axis=1, keepdims=True))
        return (sa * x) * 1.0001
    timed(f_nchw, x_nchw, label=f"NCHW C=8 {dt.__name__}")
