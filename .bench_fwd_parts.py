import time, sys
import numpy as np
import jax, jax.numpy as jnp

from dcs_net_tpu.core.config import config_for_variant
import dataclasses
from dcs_net_tpu.ops import complex_layers as cl
from dcs_net_tpu.ops.lstm import ComplexLSTM
from dcs_net_tpu.utils.carray import CArray

def fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim]).item()

def timeit(fn, *args, steps=10, warmup=2):
    for _ in range(warmup): out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(steps): out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / steps

B = 32
dt = jnp.bfloat16
cfg = config_for_variant("dcs")
m = dataclasses.replace(cfg.model, compute_dtype="bfloat16")
rng = jax.random.PRNGKey(0)

# encoder conv stack alone (complex, bf16)
class Enc(jax.tree_util.Partial.__class__ if False else object): pass
from flax import linen as nn
class EncStack(nn.Module):
    @nn.compact
    def __call__(self, x):
        e = x
        for i in range(m.n_layers):
            _, cout = m.enc_channels(i)
            e = cl.ComplexConv2d(cout, m.kernel_e[i], stride=m.stride_e[i],
                                 padding=m.kernel_e[i]//2, dtype=dt,
                                 name=f"enc{i}")(e)
            e = cl.ComplexBatchNorm2d(cout, name=f"bn{i}")(e, train=False)
            e = cl.complex_relu(e)
        return e

x = CArray(jax.random.normal(rng, (B,256,256,1)), jax.random.normal(rng, (B,256,256,1)))
enc = EncStack()
v = jax.jit(lambda: enc.init(rng, x))()
f_enc = jax.jit(lambda v, a: enc.apply(v, a))
print(f"enc_convs+bn      {timeit(f_enc, v, x)*1e3:8.2f} ms")

# LSTM alone
seq = CArray(jax.random.normal(rng, (B, 64, 128)), jax.random.normal(rng, (B, 64, 128)))
lstm = ComplexLSTM(64, 2, True, dtype=dt)
vl = jax.jit(lambda: lstm.init(rng, seq))()
f_lstm = jax.jit(lambda v, s: lstm.apply(v, s)[0])
print(f"complex_lstm      {timeit(f_lstm, vl, seq)*1e3:8.2f} ms")

# one CBAM pair at the largest spatial size (256x256, 8 ch)
from dcs_net_tpu.ops import attention as att
sk = CArray(jax.random.normal(rng, (B,256,256,8)), jax.random.normal(rng, (B,256,256,8)))
class CBAM(nn.Module):
    @nn.compact
    def __call__(self, s):
        ca = att.ComplexChannelAttention(8, 2, maxpool_is_avg=True, name="ca")(s)
        s = ca * s
        sa = att.ComplexSpatialAttention(7, name="sa")(s)
        return sa * s
cb = CBAM()
vc = jax.jit(lambda: cb.init(rng, sk))()
f_cb = jax.jit(lambda v, s: cb.apply(v, s))
print(f"cbam_256x256x8    {timeit(f_cb, vc, sk)*1e3:8.2f} ms")
