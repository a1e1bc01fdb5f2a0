"""Bisect forward time: full vs attention-stubbed vs lstm-stubbed."""
import time, dataclasses, sys
import numpy as np
import jax, jax.numpy as jnp

from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.models import unet as U
from dcs_net_tpu.train import steps as S
from dcs_net_tpu.train.optim import make_optimizer
from dcs_net_tpu.utils.carray import CArray
from dcs_net_tpu.ops import attention as att

DT = "bfloat16"
B = 32
K = 16

def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim]).item()

def timed(fn, *args, label=""):
    @jax.jit
    def run(a0):
        out, _ = jax.lax.scan(lambda c, _: (fn(c, *args[1:]), None), a0,
                              None, length=K)
        return out
    y = run(args[0]); fence(y)
    t0 = time.perf_counter(); y = run(args[0]); fence(y)
    print(f"{label:30s} {(time.perf_counter()-t0)/K*1e3:7.2f} ms/iter")

cfg = config_for_variant("dcs")
cfg = cfg.replace(
    data=cfg.data.__class__(crop_samples=8160, batch_size=B),
    model=dataclasses.replace(cfg.model, compute_dtype=DT))
model = U.DCSNet(cfg.model, cfg.quirks)
tx = make_optimizer(cfg.optim)
rng = jax.random.PRNGKey(0)
wave = jax.random.normal(rng, (B, 8160)) * 0.1
batch = jax.jit(lambda w: S.batch_from_waves(w, w * 0.9, cfg))(wave)
state = S.init_state(model, cfg, tx, rng, batch.noisy)
V = {"params": state.params, "batch_stats": state.batch_stats}

spec = batch.noisy
def carry_fwd(m):
    def f(c):
        out = m.apply(V, c, train=False)
        return CArray(c.re * 0.999 + out.re * 1e-3, c.im)
    return f

timed(carry_fwd(model), spec, label="forward full")

# stub all attention to identity
class IdCA(att.nn.Module):
    channels: int = 0; reduction: int = 0
    maxpool_is_avg: bool = True; weight_init: str = "x"
    dtype: object = jnp.float32
    @att.nn.compact
    def __call__(self, x):
        return CArray(jnp.ones_like(x.re[..., :1, :1, :]),
                      jnp.zeros_like(x.im[..., :1, :1, :]))
class IdSA(att.nn.Module):
    kernel_size: int = 7; weight_init: str = "x"
    dtype: object = jnp.float32
    @att.nn.compact
    def __call__(self, x):
        return CArray(jnp.ones_like(x.re[..., :1]), jnp.zeros_like(x.im[..., :1]))

orig_ca, orig_sa = att.ComplexChannelAttention, att.ComplexSpatialAttention
att.ComplexChannelAttention, att.ComplexSpatialAttention = IdCA, IdSA
U.att.ComplexChannelAttention, U.att.ComplexSpatialAttention = IdCA, IdSA
m2 = U.DCSNet(cfg.model, cfg.quirks)
v2 = jax.jit(lambda r, s: m2.init({"params": r, "dropout": r}, s, train=False))(rng, spec)
def f2(c):
    out = m2.apply(v2, c, train=False)
    return CArray(c.re * 0.999 + out.re * 1e-3, c.im)
timed(f2, spec, label="forward no-attention")
att.ComplexChannelAttention, att.ComplexSpatialAttention = orig_ca, orig_sa
U.att.ComplexChannelAttention, U.att.ComplexSpatialAttention = orig_ca, orig_sa

# lstm stub: replace ComplexLSTM with identity-ish
from dcs_net_tpu.ops import lstm as L
class IdLSTM(L.nn.Module):
    hidden_size: int; num_layers: int = 1; bidirectional: bool = False
    dtype: object = jnp.float32
    @L.nn.compact
    def __call__(self, x, state=None):
        return x, None
U.ComplexLSTM_orig = U.ComplexLSTM
U.ComplexLSTM = IdLSTM
m3 = U.DCSNet(cfg.model, cfg.quirks)
v3 = jax.jit(lambda r, s: m3.init({"params": r, "dropout": r}, s, train=False))(rng, spec)
def f3(c):
    out = m3.apply(v3, c, train=False)
    return CArray(c.re * 0.999 + out.re * 1e-3, c.im)
timed(f3, spec, label="forward no-lstm")
