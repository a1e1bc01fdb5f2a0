"""Optimizer stack with torch semantics (reference C19 + trainer flags).

torch.optim.Adam(lr=1e-4, eps=1e-6, weight_decay=1e-4, amsgrad=True) couples
weight decay INTO the gradient before the moment updates (L2, not AdamW), and
Lightning clips the global grad norm to 100 before the step
(/root/reference/r_network.py:176-187, /root/reference/train.py:145-146).
optax chain: clip_by_global_norm -> add_decayed_weights -> scale_by_amsgrad ->
scale(-lr), with lr injected as a mutable hyperparam so ReduceLROnPlateau can
rescale it without rebuilding opt state.

ReduceLROnPlateau reproduces torch defaults: mode='min', factor=0.1,
patience=10, threshold=1e-4 (rel) (/root/reference/r_network.py:182).

SWA mirrors Lightning's StochasticWeightAveraging(swa_epoch_start=0.8):
equal-weight parameter averaging from the start epoch on. The BN-statistics
refresh pass Lightning appends runs in Trainer.recompute_batch_stats
(train/loop.py), invoked by finalize_swa; SWALR's hold-lr-constant behavior
lives in Trainer.end_of_epoch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from dcs_net_tpu.core.config import OptimConfig


def scale_by_torch_adam(b1: float, b2: float, eps: float,
                        amsgrad: bool) -> optax.GradientTransformation:
    """Bit-faithful torch.optim.Adam moment scaling.

    Differs from optax.scale_by_amsgrad in where bias correction meets the
    max accumulator: torch maxes the UNCORRECTED second moment and divides by
    sqrt(bias_correction2) at use time (denom = sqrt(v_max)/sqrt(bc2) + eps);
    optax maxes the corrected estimate. The difference compounds over steps.
    """

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        state = {"count": jnp.zeros((), jnp.int32),
                 "m": zeros, "v": jax.tree.map(jnp.zeros_like, params)}
        if amsgrad:
            state["vmax"] = jax.tree.map(jnp.zeros_like, params)
        return state

    def update(grads, state, params=None):
        del params
        count = state["count"] + 1
        m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, state["m"], grads)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g,
                         state["v"], grads)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        new_state = {"count": count, "m": m, "v": v}
        if amsgrad:
            vmax = jax.tree.map(jnp.maximum, state["vmax"], v)
            new_state["vmax"] = vmax
            denom_src = vmax
        else:
            denom_src = v
        sqrt_bc2 = jnp.sqrt(bc2)
        updates = jax.tree.map(
            lambda mm, vv: (mm / bc1) / (jnp.sqrt(vv) / sqrt_bc2 + eps),
            m, denom_src)
        return updates, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    @optax.inject_hyperparams
    def tx(lr):
        # optax.flatten: the whole chain runs on ONE raveled parameter vector.
        # Per-leaf optimizer math (~10 elementwise ops x ~350 params) otherwise
        # compiles to thousands of microsecond-scale TPU kernels per step —
        # pure launch overhead. Flat, it is a handful of full-width kernels.
        return optax.flatten(optax.chain(
            optax.clip_by_global_norm(cfg.clip_norm),
            optax.add_decayed_weights(cfg.weight_decay),
            scale_by_torch_adam(cfg.beta1, cfg.beta2, cfg.eps, cfg.amsgrad),
            optax.scale(-lr),
        ))

    return tx(lr=jnp.asarray(cfg.lr, jnp.float32))


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["lr"])


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["lr"] = jnp.asarray(lr, jnp.float32)
    return opt_state


@dataclass
class ReduceLROnPlateau:
    """Host-side mirror of torch.optim.lr_scheduler.ReduceLROnPlateau."""

    factor: float = 0.1
    patience: int = 10
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: float = float("inf")
    num_bad: int = 0

    def step(self, metric: float, lr: float) -> float:
        """Feed the monitored metric; returns the (possibly reduced) lr."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            lr = max(lr * self.factor, self.min_lr)
            self.num_bad = 0
        return lr

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d: dict) -> None:
        self.best = d["best"]
        self.num_bad = d["num_bad"]


@dataclass
class SWA:
    """Equal-weight parameter averaging from start_epoch on."""

    start_epoch: int
    avg_params: Optional[Any] = None
    n_averaged: int = 0

    def update(self, epoch: int, params: Any) -> None:
        if epoch < self.start_epoch:
            return
        if self.avg_params is None:
            self.avg_params = jax.tree.map(jnp.copy, params)
            self.n_averaged = 1
            return
        n = self.n_averaged
        self.avg_params = jax.tree.map(
            lambda a, p: a + (p - a) / (n + 1), self.avg_params, params)
        self.n_averaged = n + 1

    @property
    def active(self) -> bool:
        return self.avg_params is not None


def global_grad_norm(grads: Any) -> jnp.ndarray:
    """Global L2 norm over a gradient pytree (reference C18 grad-norm probe,
    /root/reference/r_network.py:348-363)."""
    leaves = jax.tree.leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))


def grad_mean(grads: Any) -> jnp.ndarray:
    leaves = jax.tree.leaves(grads)
    total = sum(jnp.sum(g) for g in leaves)
    count = sum(g.size for g in leaves)
    return total / count
