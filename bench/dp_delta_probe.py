"""Measure per-leaf DP-vs-single-device gradient deltas and per-module grad
scales, to calibrate tests/test_parallel.py's tolerance theory. CPU, 8 virtual
devices."""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402
import numpy as np  # noqa: E402

import sys
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")
from test_parallel import _cfg, _batch, KEY  # noqa: E402
from dcs_net_tpu.models.unet import DCSNet  # noqa: E402
from dcs_net_tpu.parallel import mesh as pmesh  # noqa: E402
from dcs_net_tpu.train import steps as S  # noqa: E402
from dcs_net_tpu.train.optim import make_optimizer  # noqa: E402

cfg = _cfg()
model = DCSNet(cfg.model, cfg.quirks)
tx = make_optimizer(cfg.optim)
batch = _batch(cfg)
state = S.init_state(model, cfg, tx, KEY, batch.noisy)
grad_fn = S.make_loss_and_grads(model, cfg)
rng = jax.random.PRNGKey(7)

loss1, g1 = jax.jit(grad_fn)(state, batch, rng)
mesh = pmesh.make_mesh(jax.devices()[:8])
with mesh:
    sharded = pmesh.shard_batch(batch, mesh)
    state_r = jax.device_put(state, pmesh.replicated(mesh))
    repl = pmesh.replicated(mesh)
    data = pmesh.batch_sharding(mesh)
    loss8, g8 = jax.jit(
        grad_fn, in_shardings=(repl, data, repl),
        out_shardings=(repl, repl))(state_r, sharded, rng)

flat1 = jax.tree_util.tree_leaves_with_path(g1)
flat8 = jax.tree.leaves(g8)
gmax = max(float(np.abs(np.asarray(a)).max()) for _, a in flat1)
print(f"gmax={gmax:.4g}")

# per-module max
mod_max = {}
for path, a in flat1:
    mod = jax.tree_util.keystr(path).split("']")[0].strip("['")
    mod_max[mod] = max(mod_max.get(mod, 0.0), float(np.abs(np.asarray(a)).max()))

rows = []
for (path, a), b in zip(flat1, flat8):
    a, b = np.asarray(a), np.asarray(b)
    name = jax.tree_util.keystr(path)
    mod = name.split("']")[0].strip("['")
    d = float(np.abs(a - b).max())
    rows.append((d, name, float(np.abs(a).max()), mod_max[mod], a.size))
rows.sort(reverse=True)
print(f"{'delta':>10} {'leafmax':>10} {'modmax':>10} {'d/modmax':>9} "
      f"{'d/gmax':>9} {'size':>7}  leaf")
for d, name, lm, mm, size in rows[:25]:
    print(f"{d:10.3e} {lm:10.3e} {mm:10.3e} {d/mm:9.2e} "
          f"{d/gmax:9.2e} {size:7d}  {name}")
