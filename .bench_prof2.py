import dataclasses, glob
import numpy as np
import jax, jax.numpy as jnp

from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.models.unet import DCSNet
from dcs_net_tpu.train import steps as S
from dcs_net_tpu.train.optim import make_optimizer

B = 128
cfg = config_for_variant("dcs")
cfg = cfg.replace(
    data=cfg.data.__class__(crop_samples=8160, batch_size=B),
    model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))
model = DCSNet(cfg.model, cfg.quirks)
tx = make_optimizer(cfg.optim)
rng = jax.random.PRNGKey(0)
wave = jax.random.normal(rng, (B, 8160)) * 0.1
batch = jax.jit(lambda w: S.batch_from_waves(w, w * 0.9, cfg))(wave)
state = S.init_state(model, cfg, tx, rng, batch.noisy)
step = jax.jit(S.make_train_step(model, cfg, tx))
state, m = step(state, batch, rng)
np.asarray(m["loss"]).item()

opts = jax.profiler.ProfileOptions()
opts.host_tracer_level = 1
opts.python_tracer_level = 0
with jax.profiler.trace("/tmp/jaxprof6", profiler_options=opts):
    for _ in range(1):
        state, m = step(state, batch, rng)
    np.asarray(m["loss"]).item()
print(sorted(glob.glob("/tmp/jaxprof6/plugins/profile/*"))[-1])
