"""Optimizer parity vs torch Adam(amsgrad, L2-coupled wd) + clip, plateau
scheduler semantics, and SWA averaging."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from dcs_net_tpu.core.config import OptimConfig
from dcs_net_tpu.train.optim import (SWA, ReduceLROnPlateau, get_lr,
                                     global_grad_norm, make_optimizer, set_lr)


def test_adam_amsgrad_matches_torch():
    """Five steps of our chain == torch Adam with Lightning-style pre-clip."""
    cfg = OptimConfig()
    torch.manual_seed(0)
    w_t = torch.nn.Parameter(torch.randn(4, 3))
    opt_t = torch.optim.Adam([w_t], lr=cfg.lr, eps=cfg.eps,
                             weight_decay=cfg.weight_decay, amsgrad=cfg.amsgrad)
    # .copy(): jnp.asarray zero-copies numpy buffers on CPU, and torch
    # mutates its params in place on step() — without the copy the two
    # optimizers would share storage.
    params = {"w": jnp.asarray(w_t.detach().numpy().copy())}
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    for step in range(5):
        g = rng.standard_normal((4, 3)).astype(np.float32) * (200.0 if step == 2 else 1.0)
        # torch path: Lightning clips global norm first
        g_t = torch.from_numpy(g.copy())
        norm = g_t.norm()
        if norm > cfg.clip_norm:
            g_t = g_t * (cfg.clip_norm / norm)
        w_t.grad = g_t
        opt_t.step()
        # ours
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        np.testing.assert_allclose(
            np.asarray(params["w"]), w_t.detach().numpy(), rtol=2e-5, atol=1e-6,
            err_msg=f"step {step}")


def test_lr_injection():
    cfg = OptimConfig()
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones(3)}
    st = tx.init(params)
    assert abs(get_lr(st) - cfg.lr) < 1e-9  # lr stored float32
    st = set_lr(st, 5e-5)
    updates, st = tx.update({"w": jnp.ones(3) * 0.1}, st, params)
    assert abs(get_lr(st) - 5e-5) < 1e-9


def test_plateau_matches_torch():
    sched = ReduceLROnPlateau(patience=2, factor=0.5)
    w = torch.nn.Parameter(torch.ones(1))
    opt_t = torch.optim.Adam([w], lr=1.0)
    sched_t = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt_t, patience=2, factor=0.5)
    lr = 1.0
    metrics = [1.0, 0.9, 0.9, 0.9, 0.9, 0.5, 0.5, 0.5, 0.5, 0.6, 0.7]
    for m in metrics:
        lr = sched.step(m, lr)
        sched_t.step(m)
        np.testing.assert_allclose(lr, opt_t.param_groups[0]["lr"], rtol=1e-9,
                                   err_msg=f"after metric {m}")


def test_swa_average():
    swa = SWA(start_epoch=2)
    for epoch, val in enumerate([10.0, 20.0, 1.0, 2.0, 3.0]):
        swa.update(epoch, {"w": jnp.asarray([val])})
    assert swa.n_averaged == 3
    np.testing.assert_allclose(np.asarray(swa.avg_params["w"]), [2.0])


def test_global_grad_norm():
    g = {"a": jnp.asarray([3.0]), "b": jnp.asarray([4.0])}
    np.testing.assert_allclose(float(global_grad_norm(g)), 5.0, rtol=1e-6)
