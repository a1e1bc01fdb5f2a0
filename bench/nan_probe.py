"""Root-cause probe for the soak-run NaN gradients (runs ONE value_and_grad
at init on the REAL loader batch the Trainer saw, then bisects).

Usage: python bench/nan_probe.py [--config runs/soak/cfg_a.json]
       [--dtype float32|bfloat16] [--loss speech|noise|both]
       [--batch-index 0] [--synthetic-noise]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="runs/soak/cfg_a.json")
    p.add_argument("--dtype", default=None)
    p.add_argument("--loss", default="both", choices=["speech", "noise", "both"])
    p.add_argument("--batch-index", type=int, default=0)
    p.add_argument("--synthetic-noise", action="store_true",
                   help="use bench.py's random-normal waves instead of the "
                        "loader batch (isolates data vs config)")
    p.add_argument("--quirks", default=None, choices=[None, "faithful", "perf"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dcs_net_tpu.utils.platform import enable_fast_rng

    enable_fast_rng()

    import dataclasses

    from dcs_net_tpu.core.config import Config
    from dcs_net_tpu.models.unet import DCSNet
    from dcs_net_tpu.train import steps as S
    from dcs_net_tpu.train.optim import make_optimizer

    with open(args.config) as f:
        cfg = Config.from_json(f.read())
    if args.dtype:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, compute_dtype=args.dtype),
            stft=dataclasses.replace(cfg.stft, dft_dtype=args.dtype))
    if args.quirks == "faithful":
        cfg = cfg.replace(quirks=cfg.quirks.__class__())
    elif args.quirks == "perf":
        cfg = cfg.replace(quirks=cfg.quirks.__class__().perf())

    B, crop = cfg.data.batch_size, cfg.data.crop_samples
    if args.synthetic_noise:
        clean = np.asarray(jax.random.normal(
            jax.random.PRNGKey(0), (B, crop), jnp.float32)) * 0.1
        noise = np.asarray(jax.random.normal(
            jax.random.PRNGKey(1), (B, crop), jnp.float32)) * 0.02
        host = {"noisy": clean + noise, "clean": clean}
    else:
        from dcs_net_tpu.cli.common import make_loaders

        train_loader, _, _ = make_loaders(cfg)
        it = train_loader.epoch(0)
        for _ in range(args.batch_index + 1):
            host = next(it)
    print("batch stats: noisy absmax", np.abs(host["noisy"]).max(),
          "clean absmax", np.abs(host["clean"]).max(),
          "noise absmin-rms", np.sqrt(
              ((host["noisy"] - host["clean"]) ** 2).mean(-1)).min())

    model = DCSNet(cfg.model, cfg.quirks)
    tx = make_optimizer(cfg.optim)
    rng = jax.random.PRNGKey(cfg.run.seed)
    make_batch = jax.jit(lambda n, c: S.batch_from_waves(n, c, cfg))
    batch = make_batch(jnp.asarray(host["noisy"]), jnp.asarray(host["clean"]))
    x = batch.noisy if cfg.model.complex_valued else batch.noisy.abs()
    state = S.init_state(model, cfg, tx, rng, x)

    from dcs_net_tpu.train.losses import calc_loss
    from dcs_net_tpu.train.steps import run_model_and_masks

    which = args.loss

    def loss_fn(params):
        def apply_net(xx):
            y, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xx, train=True, rngs={"dropout": jax.random.PRNGKey(7)},
                mutable=["batch_stats"])
            return y

        out = run_model_and_masks(apply_net, batch, cfg)
        losses = calc_loss(
            cfg, clean_audio=out["clean_audio"],
            predict_clean_audio=out["predict_clean_audio"],
            target_mask=out.get("target_mask"),
            predict_mask=out.get("pred_mask"),
            noise_audio=out.get("noise_audio"),
            noisy_audio=out.get("noisy_audio"),
            predict_noise_audio=out.get("predict_noise_audio"))
        if which == "speech":
            return losses["speech_loss"]
        if which == "noise":
            return losses.get("noise_loss", losses["loss"])
        return losses["loss"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(state.params)
    loss = float(loss)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    bad = []
    gnorm2 = 0.0
    for path, g in flat:
        a = np.asarray(g, np.float32)
        n_nan = int(np.isnan(a).sum())
        n_inf = int(np.isinf(a).sum())
        gnorm2 += float((a.astype(np.float64) ** 2).sum()) \
            if n_nan == n_inf == 0 else float("nan")
        if n_nan or n_inf:
            bad.append((jax.tree_util.keystr(path), n_nan, n_inf, a.size,
                        float(np.nanmax(np.abs(a)))))
    print(f"loss({which}) = {loss:.4f}  grad_norm = "
          f"{np.sqrt(gnorm2) if gnorm2 == gnorm2 else float('nan'):.4f}  "
          f"bad leaves: {len(bad)}/{len(flat)}")
    for path, n_nan, n_inf, size, mx in bad[:25]:
        print(f"  {path}: nan={n_nan} inf={n_inf} of {size} "
              f"(max|finite|={mx:.3e})")
    os._exit(0)


if __name__ == "__main__":
    main()
