"""Dataset partitioning with JSON cache (reference C3,
/root/reference/data.py:146-189): walk the clean trainset, seeded shuffle,
80/20 train/val split, de-dup + 3-way disjointness asserts, cache to
partition.json, reload when present.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from dcs_net_tpu.core.config import DataConfig


def trainset_dir(cfg: DataConfig) -> str:
    return os.path.join(cfg.root, f"clean_trainset_{cfg.dataset_type}spk_wav")


def noisy_trainset_dir(cfg: DataConfig) -> str:
    return os.path.join(cfg.root, f"noisy_trainset_{cfg.dataset_type}spk_wav")


def testset_dir(cfg: DataConfig, clean: bool = True) -> str:
    return os.path.join(cfg.root, f"{'clean' if clean else 'noisy'}_testset_wav")


def _walk_ids(dir_path: str) -> List[str]:
    try:
        names = sorted(os.listdir(dir_path))
    except FileNotFoundError:
        return []
    return [os.path.splitext(n)[0] for n in names if n.endswith(".wav")]


def make_partition(cfg: DataConfig, seed: int = 0) -> Dict[str, List[str]]:
    """Build (or reload) the {train, val, test} ID partition."""
    cache = os.path.join(cfg.root, cfg.partition_json) if not os.path.isabs(
        cfg.partition_json) else cfg.partition_json
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)

    rng = np.random.default_rng(seed)
    train_val = np.array(_walk_ids(trainset_dir(cfg)))
    if train_val.size == 0:
        raise FileNotFoundError(
            f"no training wavs under {trainset_dir(cfg)}; set DataConfig.root "
            "to a VoiceBank-DEMAND tree or generate fixtures with "
            "dcs_net_tpu.data.synthetic")
    rng.shuffle(train_val)
    split = round(train_val.shape[0] * cfg.train_val_split)
    train, val = train_val[:split].tolist(), train_val[split:].tolist()
    test = _walk_ids(testset_dir(cfg))

    assert len(train) == len(set(train)), "Duplicate item in train set"
    assert len(val) == len(set(val)), "Duplicate item in val set"
    assert len(test) == len(set(test)), "Duplicate item in test set"
    assert set(train).isdisjoint(val), "Train and val sets are not disjoint"
    assert set(train).isdisjoint(test), "Train and test sets are not disjoint"
    assert set(val).isdisjoint(test), "Val and test sets are not disjoint"

    partition = {"train": train, "val": val, "test": test}
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    with open(cache, "w") as f:
        json.dump(partition, f)
    return partition


def shard_ids(ids: List[str], host_index: int, host_count: int) -> List[str]:
    """Per-host disjoint utterance shard for multi-host DP (SURVEY.md §5:
    input pipeline sharded per-host by utterance ID). Drops the ragged tail so
    every host sees the same number of steps."""
    per_host = len(ids) // host_count
    start = host_index * per_host
    return ids[start:start + per_host]
