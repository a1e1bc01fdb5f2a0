"""Is the s2d strided-conv reformulation exact? Compare conv2d_strided_s2d
vs the phase path vs plain XLA under x64, fwd and grads, at the product
encoder shapes. A persistent x64 delta == math/geometry bug; an f32-only
delta == reassociation noise.  Run CPU-only."""
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dcs_net_tpu.ops import conv_engine as ce  # noqa: E402

SHAPES = [  # (H, W, Cin, Cout, K, stride) — oracle encoder schedule
    (256, 64, 2, 16, 7, (2, 2)),
    (128, 32, 16, 32, 7, (2, 2)),
    (64, 16, 32, 64, 5, (2, 2)),
    (32, 8, 64, 128, 5, (2, 1)),
    (16, 8, 128, 128, 3, (2, 1)),
]

key = jax.random.PRNGKey(0)
for H, W, cin, cout, K, stride in SHAPES:
    k1, k2, k3, key = jax.random.split(key, 4)
    for dt in (jnp.float64, jnp.float32):
        x = jax.random.normal(k1, (2, H, W, cin), dt)
        w = jax.random.normal(k2, (K, K, cin, cout), dt)
        p = K // 2

        def ref_loss(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, stride, ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(jnp.sin(y))

        def s2d_loss(x, w):
            return jnp.sum(jnp.sin(ce.conv2d_strided_s2d(x, w, stride, p)))

        gr = jax.grad(ref_loss, (0, 1))(x, w)
        gs = jax.grad(s2d_loss, (0, 1))(x, w)
        yr = jax.lax.conv_general_dilated(
            x, w, stride, ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ys = ce.conv2d_strided_s2d(x, w, stride, p)
        def rel(a, b):
            return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
        print(f"{H}x{W} c{cin}->{cout} k{K} s{stride} {np.dtype(dt).name}: "
              f"fwd={rel(ys, yr):.2e} dx={rel(gs[0], gr[0]):.2e} "
              f"dw={rel(gs[1], gr[1]):.2e}")
