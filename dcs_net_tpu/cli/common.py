"""Shared CLI plumbing: config construction from args, data setup."""

from __future__ import annotations

import argparse
import os
from typing import Tuple

from dcs_net_tpu.core.config import VARIANTS, Config, config_for_variant


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("variant", choices=VARIANTS,
                   help="model variant: {dr, dc, drs, dcs}")
    p.add_argument("--data-root", default=os.environ.get("VOICEBANK_ROOT", ""),
                   help="VoiceBank-DEMAND root (clean/noisy_trainset_*, testset)")
    p.add_argument("--synthetic", action="store_true",
                   help="generate and use synthetic fixture audio (no dataset needed)")
    p.add_argument("--synthetic-n", type=int, default=24)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--idiomatic", action="store_true",
                   help="fix reference quirks instead of reproducing them")
    p.add_argument("--streaming", action="store_true",
                   help="streaming preset: unidirectional LSTM + time-major "
                        "latent, the configuration under which chunked "
                        "enhancement with --carry is exactly a full pass "
                        "(cli/enhance.py)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default=None,
                   help="matmul/conv operand dtype (bfloat16 = TPU fast path, "
                        "f32 accumulation; default float32 parity mode)")
    p.add_argument("--config-json", default=None,
                   help="load a serialized Config (overrides other flags)")


def build_config(args) -> Config:
    if args.config_json:
        with open(args.config_json) as f:
            return Config.from_json(f.read())
    cfg = config_for_variant(args.variant, faithful=not args.idiomatic,
                             streaming=getattr(args, "streaming", False))
    if getattr(args, "dtype", None):
        import dataclasses

        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, compute_dtype=args.dtype),
            stft=dataclasses.replace(cfg.stft, dft_dtype=args.dtype))
    data_kw = {}
    if args.synthetic:
        root = os.path.join(args.log_dir or "runs", "synthetic_data")
        if not os.path.exists(os.path.join(root, "clean_trainset_28spk_wav")):
            from dcs_net_tpu.data import synthetic

            print(f"generating synthetic fixtures under {root}")
            synthetic.generate(root, n_train=args.synthetic_n,
                               n_test=max(args.synthetic_n // 4, 2))
        data_kw["root"] = root
    elif args.data_root:
        data_kw["root"] = args.data_root
    if args.batch_size:
        data_kw["batch_size"] = args.batch_size
    if data_kw:
        cfg = cfg.replace(data=cfg.data.__class__(
            **{**cfg.data.__dict__, **data_kw}))
    run_kw = {}
    if args.epochs is not None:
        run_kw["max_epochs"] = args.epochs
    if args.seed is not None:
        run_kw["seed"] = args.seed
    if args.log_dir:
        run_kw["log_dir"] = os.path.join(args.log_dir, f"{args.variant}")
    if args.ckpt_dir:
        run_kw["ckpt_dir"] = args.ckpt_dir
    else:
        run_kw.setdefault("ckpt_dir", os.path.join(
            args.log_dir or "runs", f"{args.variant}", "checkpoints"))
    if run_kw:
        cfg = cfg.replace(run=cfg.run.__class__(
            **{**cfg.run.__dict__, **run_kw}))
    return cfg


def make_loaders(cfg: Config, test_batch_size: int = 1):
    from dcs_net_tpu.data.dataset import Loader, VoiceBankDataset
    from dcs_net_tpu.data.partition import make_partition, shard_ids
    from dcs_net_tpu.parallel import mesh as pmesh

    import jax

    part = make_partition(cfg.data, seed=cfg.run.seed)
    # per-host shard for multi-host DP (no-op single host). cfg.data.batch_size
    # is the GLOBAL batch: each host's loader yields its 1/nhosts local shard,
    # which Trainer._device_batch assembles into the global batch via
    # form_global_batch (parallel/mesh.py).
    host, nhosts = jax.process_index(), jax.process_count()
    local_bs = (pmesh.host_local_batch_size(cfg.data.batch_size)
                if nhosts > 1 else cfg.data.batch_size)
    splits = {}
    for name, mode, bs, shuffle in (
            ("train", "train", local_bs, True),
            ("val", "val", local_bs, True),
            ("test", "test", test_batch_size, True)):
        ids = part[name]
        if nhosts > 1 and name != "test":
            ids = shard_ids(ids, host, nhosts)
        ds = VoiceBankDataset(ids, cfg.data, mode=mode, seed=cfg.run.seed)
        splits[name] = Loader(
            ds, batch_size=bs, shuffle=shuffle, drop_last=(name == "train"),
            num_workers=cfg.data.num_workers, prefetch=cfg.data.prefetch,
            seed=cfg.run.seed)
    return splits["train"], splits["val"], splits["test"]
