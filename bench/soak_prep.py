"""Prepare the on-chip product-Trainer soak (VERDICT r4 task 4).

Generates a VoiceBank-shaped synthetic dataset big enough for 20 steps/epoch
at the product batch size, and writes two Config JSONs that differ only in
run.max_epochs — run A trains epochs 0..9 (200 steps), run B `--resume`s and
trains 10..15 (120 more steps), proving mid-run checkpoint restore under the
real CLI (`python -m dcs_net_tpu.cli.train dcs --config-json ...`).

The config matches bench.py's product batch-32 row (variant dcs, bf16
compute + DFT basis, Quirks.perf()) so the Trainer's logged throughput is
directly comparable to the bench number.
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dcs_net_tpu.core.config import config_for_variant  # noqa: E402

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "runs", "soak")


def main() -> None:
    data_root = os.path.join(ROOT, "synthetic_data")
    if not os.path.exists(os.path.join(data_root, "clean_trainset_28spk_wav")):
        from dcs_net_tpu.data import synthetic

        print(f"generating synthetic fixtures under {data_root}")
        synthetic.generate(data_root, n_train=800, n_test=32, seconds=1.2)

    cfg = config_for_variant("dcs")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"),
        stft=dataclasses.replace(cfg.stft, dft_dtype="bfloat16"),
        quirks=cfg.quirks.perf(),
        data=dataclasses.replace(
            cfg.data, root=data_root, num_workers=8, prefetch=4),
        run=dataclasses.replace(
            cfg.run, max_epochs=10, steps_per_dispatch=8,
            ckpt_dir=os.path.join(ROOT, "ckpt"),
            log_dir=os.path.join(ROOT, "logs")),
    )
    with open(os.path.join(ROOT, "cfg_a.json"), "w") as f:
        f.write(cfg.to_json())
    cfg_b = cfg.replace(run=dataclasses.replace(cfg.run, max_epochs=16))
    with open(os.path.join(ROOT, "cfg_b.json"), "w") as f:
        f.write(cfg_b.to_json())
    print("wrote", os.path.join(ROOT, "cfg_a.json"), "and cfg_b.json")


if __name__ == "__main__":
    main()
