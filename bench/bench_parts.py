"""Component microbenchmarks on the attached chip (not a driver contract).

Times the pieces of the DCS train step separately to locate the bottleneck:
stft front-end, model forward, full loss pipeline (5 iSTFTs), fwd+bwd+adam.
Also compares the XLA vs Pallas STFT front-end.

Usage: python bench_parts.py [--batch 32] [--steps 20]
"""

from __future__ import annotations

import argparse
import sys
import time


def _fence(out) -> None:
    """True completion fence: D2H-fetch one scalar from the output tree.
    (block_until_ready returns early on the network-attached axon platform.)"""
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim]).item()  # one-element fetch, not the tensor


def timeit(fn, *args, steps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--crop", type=int, default=8160)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dcs_net_tpu.core.config import config_for_variant
    from dcs_net_tpu.dsp import stft as dsp
    from dcs_net_tpu.dsp.stft_pallas import stft_pallas
    from dcs_net_tpu.models.unet import DCSNet
    from dcs_net_tpu.train import steps as S
    from dcs_net_tpu.train.optim import make_optimizer

    import dataclasses

    cfg = config_for_variant("dcs")
    cfg = cfg.replace(quirks=cfg.quirks.perf())
    cfg = cfg.replace(
        data=cfg.data.__class__(crop_samples=args.crop, batch_size=args.batch),
        model=dataclasses.replace(cfg.model, compute_dtype=args.dtype))
    model = DCSNet(cfg.model, cfg.quirks)
    tx = make_optimizer(cfg.optim)

    rng = jax.random.PRNGKey(0)
    wave = jax.random.normal(rng, (args.batch, args.crop)) * 0.1
    wave3 = jax.random.normal(rng, (3, args.batch, args.crop)) * 0.1

    audio_s = args.batch * args.crop / 16000.0
    res = {}

    stft_x = jax.jit(lambda w: dsp.stft(w, cfg.stft))
    res["stft_xla_3streams"] = timeit(stft_x, wave3, steps=args.steps)

    stft_p = jax.jit(lambda w: stft_pallas(w, cfg.stft))
    try:
        res["stft_pallas_3streams"] = timeit(stft_p, wave3, steps=args.steps)
    except Exception as e:  # pallas path may fail on some toolchains
        print(f"# pallas stft failed: {type(e).__name__}: {e}", file=sys.stderr)

    batch = jax.jit(lambda w: S.batch_from_waves(w, w * 0.9, cfg))(wave)
    state = S.init_state(model, cfg, tx, rng, batch.noisy)

    fwd = jax.jit(lambda s, b: model.apply(
        {"params": s.params, "batch_stats": s.batch_stats}, b.noisy,
        train=False))
    res["forward_only"] = timeit(fwd, state, batch, steps=args.steps)

    eval_step = jax.jit(S.make_eval_step(model, cfg))
    res["eval_step_full"] = timeit(eval_step, state, batch, steps=args.steps)

    train_step = jax.jit(S.make_train_step(model, cfg, tx))
    res["train_step_full"] = timeit(
        lambda s, b: train_step(s, b, rng)[0], state, batch, steps=args.steps)

    # loss pipeline alone: identity mask net
    def loss_only(b):
        out = S.run_model_and_masks(lambda x: x, b, cfg)
        return S.pipeline_losses(out, cfg)["loss"]

    res["mask+istft+loss_only"] = timeit(jax.jit(loss_only), batch,
                                         steps=args.steps)

    print("# batch", args.batch, "audio_s/step", audio_s, file=sys.stderr)
    for k, v in res.items():
        print(f"{k:24s} {v*1e3:8.2f} ms/step  {audio_s/v:9.1f} audio-s/s")
    sys.stdout.flush()
    import os

    os._exit(0)


if __name__ == "__main__":
    main()
