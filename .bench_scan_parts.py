"""Scan-amortized (latency-free) device timings of forward/train components."""
import time, dataclasses, sys
import numpy as np
import jax, jax.numpy as jnp
from flax import linen as nn

from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.models.unet import DCSNet
from dcs_net_tpu.train import steps as S
from dcs_net_tpu.train.optim import make_optimizer
from dcs_net_tpu.utils.carray import CArray

DT = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
K = 16

cfg = config_for_variant("dcs")
cfg = cfg.replace(
    data=cfg.data.__class__(crop_samples=8160, batch_size=B),
    model=dataclasses.replace(cfg.model, compute_dtype=DT))
model = DCSNet(cfg.model, cfg.quirks)
tx = make_optimizer(cfg.optim)
rng = jax.random.PRNGKey(0)
wave = jax.random.normal(rng, (B, 8160)) * 0.1

batch = jax.jit(lambda w: S.batch_from_waves(w, w * 0.9, cfg))(wave)
state = S.init_state(model, cfg, tx, rng, batch.noisy)

def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim]).item()

def timed_scan(body, init, label):
    @jax.jit
    def run(init):
        out, _ = jax.lax.scan(lambda c, _: (body(c), None), init,
                              None, length=K)
        return out
    out = run(init); fence(out)
    t0 = time.perf_counter()
    out = run(init); fence(out)
    dt = (time.perf_counter() - t0) / K
    print(f"{label:26s} {dt*1e3:8.2f} ms/iter")
    return dt

# forward: carry the spec through (mask output reused as input re/im scale)
spec = batch.noisy
def fwd_body(c):
    m = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                    c, train=False)
    return CArray(m.re[..., :, :] * 1.0 + c.re * 0.001, c.im)
timed_scan(fwd_body, spec, "forward")

# full train step
step = S.make_train_step(model, cfg, tx)
def tr_body(st):
    st2, _ = step(st, batch, rng)
    return st2
timed_scan(tr_body, state, "train_step")
