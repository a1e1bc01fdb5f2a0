"""Data-parallel sharding over a jax.sharding.Mesh.

The model (~couple M params) fits a single chip, so the production sharding is
utterance-batch DP — the one real distributed axis of this family (SURVEY.md
§2.3): parameters/opt-state replicated, batches sharded on the leading axis,
gradient all-reduce inserted by the SPMD partitioner and riding ICI within a
slice / DCN across hosts. This replaces the reference's vestigial
NCCL-DDP-in-comments (/root/reference/train.py:62-63).

Multi-host: `init_distributed` wires jax.distributed; per-host input sharding
comes from data/partition.shard_ids + `host_local_batch` here.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dcs_net_tpu.core.config import Config


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize for multi-host pods; no-op when single-host
    (auto-detection via TPU metadata when args are None)."""
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(devices: Optional[Sequence[Any]] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def dp_devices(batch_size: int,
               devices: Optional[Sequence[Any]] = None) -> Sequence[Any]:
    """Largest device prefix whose count divides the global batch (a batch of
    2 on an 8-device host uses 2 devices rather than failing the sharding)."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n:
        n -= 1
    return devices[:n]


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device-put every leaf with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def make_dp_train_step(model, cfg: Config, tx, mesh: Mesh):
    """The jitted DP training step.

    State is replicated and donated; batch leaves are sharded on the batch
    axis. The mean-reduction in the loss makes the partitioner emit a gradient
    all-reduce (psum) over the 'data' axis — no hand-written collectives.
    """
    from dcs_net_tpu.train.steps import make_train_step

    step = make_train_step(model, cfg, tx)
    repl = replicated(mesh)
    data = batch_sharding(mesh, cfg.run.data_axis)
    return jax.jit(
        step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if cfg.run.donate_state else (),
    )


def make_dp_scanned_train_step(model, cfg: Config, tx, mesh: Mesh, k: int):
    """DP-sharded K-steps-per-dispatch trainer (see steps.make_scanned_train_step).
    Waves arrive (K, B, crop): sharded on axis 1 (the utterance batch)."""
    from dcs_net_tpu.train.steps import make_scanned_train_step

    step = make_scanned_train_step(model, cfg, tx, k)
    repl = replicated(mesh)
    waves = NamedSharding(mesh, P(None, cfg.run.data_axis))
    return jax.jit(
        step,
        in_shardings=(repl, waves, waves, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if cfg.run.donate_state else (),
    )


def make_dp_eval_step(model, cfg: Config, mesh: Mesh):
    """Eval step follows its inputs' shardings (eval/test batches may be
    ragged — drop_last=False val tails, batch-size-1 test — so the caller
    shards each batch over a divisor sub-mesh via shard_batch + dp_devices)."""
    from dcs_net_tpu.train.steps import make_eval_step

    del mesh
    return jax.jit(make_eval_step(model, cfg))


def host_local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by host count {n}")
    return global_batch // n


def form_global_batch(local_arrays: Any, mesh: Mesh, axis_name: str = "data",
                      batch_axis: int = 0) -> Any:
    """Multi-host: assemble a globally-sharded array from per-host local data
    (jax.make_array_from_process_local_data). ``batch_axis`` selects which
    array axis carries the utterance batch (axis 1 for the (K, B, crop) wave
    stacks of the scanned train step)."""

    def make(x):
        x = np.asarray(x)
        spec = [None] * x.ndim
        spec[batch_axis] = axis_name
        sh = NamedSharding(mesh, P(*spec))
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(make, local_arrays)


def allreduce_host_metric_sums(sums_counts: "dict[str, tuple[float, float]]"
                               ) -> "dict[str, float]":
    """Cross-host mean of per-host (sum, count) metric accumulators.

    SURVEY.md §5: PESQ/STOI eval is sharded per-host then all-gathered. Each
    host evaluates its utterance shard locally (metric loops are host-side C++
    /numpy); this reduces the accumulators over all processes and returns the
    global means. Key sets must match across hosts (they are static given the
    config; NaN-dropping removes *values*, never keys — a key with global
    count 0 yields NaN, same as the reference's empty-batch mean).
    Single-process: plain local mean.
    """
    keys = sorted(sums_counts)
    local = np.array([[sums_counts[k][0] for k in keys],
                      [sums_counts[k][1] for k in keys]], dtype=np.float64)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        gathered = np.asarray(multihost_utils.process_allgather(local))
        local = gathered.sum(axis=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        means = local[0] / local[1]
    return {k: float(m) for k, m in zip(keys, means)}
