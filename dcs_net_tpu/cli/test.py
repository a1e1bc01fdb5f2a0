"""Evaluation entry point (the reference's test.py: batch-size-1 test pass
with PESQ/STOI; /root/reference/test.py). Restores from --ckpt-dir."""

from __future__ import annotations

import argparse

from dcs_net_tpu.cli.common import add_common_args, build_config, make_loaders


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--no-tensorboard", action="store_true")
    p.add_argument("--limit-batches", type=int, default=None)
    p.add_argument("--composite", action="store_true",
                   help="also report SegSNR/LLR/WSS + CSIG/CBAK/COVL "
                        "(the reference's MATLAB semetrics harness, "
                        "/root/reference/misc.py:296-356, natively)")
    args = p.parse_args(argv)
    cfg = build_config(args)

    from dcs_net_tpu.train.checkpoint import CheckpointManager, abstract_like
    from dcs_net_tpu.train.loop import Trainer

    _, _, test_loader = make_loaders(cfg, test_batch_size=1)
    trainer = Trainer(cfg, log_dir=cfg.run.log_dir + "-test",
                      use_tensorboard=not args.no_tensorboard)
    trainer.init_state()
    ckpt = CheckpointManager(cfg.run.ckpt_dir)
    if ckpt.latest_step() is None:
        raise SystemExit(f"no checkpoint found under {cfg.run.ckpt_dir}")
    trainer.state, _ = ckpt.restore(abstract_like(trainer.state))
    print(f"restored step {ckpt.latest_step()} from {cfg.run.ckpt_dir}")

    import os

    csv_path = os.path.join(cfg.run.log_dir + "-test", "per_utterance.csv")
    metrics = trainer.eval_epoch(
        test_loader.epoch(0), 0, phase="test",
        max_batches=args.limit_batches,
        per_utterance_csv=csv_path,
        composite=args.composite)
    print("test:", {k: round(v, 4) for k, v in metrics.items()})
    print(f"per-utterance metrics: {csv_path}")


if __name__ == "__main__":
    main()
