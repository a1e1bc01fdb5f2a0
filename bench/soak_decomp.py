"""Decompose the product-Trainer epoch time: loader vs upload+dispatch+device.

The soak (bench/soak_prep.py) showed e2e epoch throughput of ~90-190
audio-s/s at batch 32 vs bench.py's 664 device-loop number. This measures
where the gap lives on THIS host:

  (a) loader-only: drain one epoch of the train Loader (native C path and
      python/RAM path), no JAX anywhere — pure host input-pipeline cost;
  (b) dispatch-path: the Trainer's exact scanned-dispatch sequence (stack 8
      host batches -> ship (8,32,8160)x2 f32 -> scanned step) on PRE-STAGED
      numpy batches, fenced at the end — upload + launch + device compute
      without the loader;
  (c) = bench.py batch-32: device loop with resident data (no upload).

Usage: python bench/soak_decomp.py [--config runs/soak/cfg_a.json] [--part a|b|all]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax"))


def part_a(cfg):
    from dcs_net_tpu.cli.common import make_loaders

    out = {}
    for tag, ram in (("native", False), ("python+ram", True)):
        import dataclasses

        c = cfg.replace(data=dataclasses.replace(cfg.data, load_into_ram=ram))
        train_loader, _, _ = make_loaders(c)
        n = 0
        # warm epoch (fills RAM cache / OS page cache), then timed epoch
        for b in train_loader.epoch(0):
            n += b["noisy"].shape[0]
        t0 = time.perf_counter()
        m = 0
        for b in train_loader.epoch(1):
            m += b["noisy"].shape[0]
        dt = time.perf_counter() - t0
        audio_s = m * c.data.crop_samples / c.data.sr
        out[tag] = (dt, audio_s / dt)
        print(f"(a) loader[{tag}]: {dt:.2f} s/epoch ({m} crops) "
              f"= {audio_s/dt:.1f} audio-s/s")
        train_loader.close()
    return out


def part_b(cfg):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dcs_net_tpu.models.unet import DCSNet
    from dcs_net_tpu.parallel import mesh as pmesh
    from dcs_net_tpu.train import steps as S
    from dcs_net_tpu.train.optim import make_optimizer
    from dcs_net_tpu.utils.platform import enable_fast_rng

    enable_fast_rng()
    model = DCSNet(cfg.model, cfg.quirks)
    tx = make_optimizer(cfg.optim)
    mesh = pmesh.make_mesh(pmesh.dp_devices(cfg.data.batch_size),
                           axis_name=cfg.run.data_axis)
    B, crop = cfg.data.batch_size, cfg.data.crop_samples
    K = max(cfg.run.steps_per_dispatch, 1)
    rng = np.random.default_rng(0)
    # pre-staged HOST batches, different content per dispatch (no caching)
    n_disp = 8
    host = [(rng.standard_normal((K, B, crop)).astype(np.float32) * 0.1,
             rng.standard_normal((K, B, crop)).astype(np.float32) * 0.1)
            for _ in range(n_disp)]

    with mesh:
        make_batch = jax.jit(lambda n, c: S.batch_from_waves(n, c, cfg))
        b0 = make_batch(jnp.asarray(host[0][0][0]), jnp.asarray(host[0][1][0]))
        sample = b0.noisy if cfg.model.complex_valued else b0.noisy.abs()
        state = S.init_state(model, cfg, tx, jax.random.PRNGKey(0), sample)
        state = jax.device_put(state, pmesh.replicated(mesh))
        step = pmesh.make_dp_scanned_train_step(model, cfg, tx, mesh, K)
        key = jax.random.PRNGKey(1)
        # warm (compile cached from the soak)
        state, metrics = step(state, jnp.asarray(host[0][0]),
                              jnp.asarray(host[0][1]), key)
        _ = float(np.asarray(metrics["loss"]))
        t0 = time.perf_counter()
        for i in range(n_disp):
            noisy, clean = host[i]
            state, metrics = step(state, jnp.asarray(noisy),
                                  jnp.asarray(clean),
                                  jax.random.fold_in(key, i))
        _ = float(np.asarray(metrics["loss"]))  # fence
        dt = time.perf_counter() - t0
    steps = n_disp * K
    audio_s = steps * B * crop / cfg.data.sr
    print(f"(b) dispatch-path: {dt:.2f} s for {steps} steps "
          f"({n_disp} dispatches, {B*crop*K*2*4/1e6:.1f} MB host->device "
          f"each) = {audio_s/dt:.1f} audio-s/s "
          f"({dt/n_disp*1e3:.1f} ms/dispatch)")
    return dt, audio_s / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="runs/soak/cfg_a.json")
    p.add_argument("--part", default="all", choices=["a", "b", "all"])
    args = p.parse_args()
    from dcs_net_tpu.core.config import Config

    with open(args.config) as f:
        cfg = Config.from_json(f.read())
    if args.part in ("a", "all"):
        part_a(cfg)
    if args.part in ("b", "all"):
        part_b(cfg)
    os._exit(0)


if __name__ == "__main__":
    main()
