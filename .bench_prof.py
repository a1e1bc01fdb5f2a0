import dataclasses, glob, os
import numpy as np
import jax, jax.numpy as jnp

from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.models.unet import DCSNet
from dcs_net_tpu.train import steps as S
from dcs_net_tpu.train.optim import make_optimizer
from dcs_net_tpu.utils.carray import CArray

cfg = config_for_variant("dcs")
cfg = cfg.replace(
    data=cfg.data.__class__(crop_samples=8160, batch_size=32),
    model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))
model = DCSNet(cfg.model, cfg.quirks)
tx = make_optimizer(cfg.optim)
rng = jax.random.PRNGKey(0)
wave = jax.random.normal(rng, (32, 8160)) * 0.1
batch = jax.jit(lambda w: S.batch_from_waves(w, w * 0.9, cfg))(wave)
state = S.init_state(model, cfg, tx, rng, batch.noisy)
V = {"params": state.params, "batch_stats": state.batch_stats}
fwd = jax.jit(lambda c: model.apply(V, c, train=False))
out = fwd(batch.noisy)
np.asarray(out.re[0, 0, 0]).item()

with jax.profiler.trace("/tmp/jaxprof"):
    for _ in range(5):
        out = fwd(batch.noisy)
    np.asarray(out.re[0, 0, 0]).item()
print("trace files:", glob.glob("/tmp/jaxprof/**/*", recursive=True)[:10])
