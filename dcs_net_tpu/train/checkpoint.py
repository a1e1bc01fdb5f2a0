"""Orbax checkpointing: params + opt state + batch stats + loop cursors.

Replaces Lightning's auto-checkpoint/load_from_checkpoint machinery
(/root/reference/train.py:137-152, /root/reference/test.py:18-79) with
explicit save/restore including everything needed for exact mid-training
resume (the reference had none: SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from dcs_net_tpu.core.config import Config
from dcs_net_tpu.train.steps import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: TrainState, *, extra: Optional[Dict] = None,
             config: Optional[Config] = None) -> None:
        payload = {"state": state}
        if extra:
            payload["extra"] = extra
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        if config is not None:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                f.write(config.to_json())

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: TrainState, step: Optional[int] = None,
                with_extra: bool = False) -> Tuple[TrainState, Dict]:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        # orbax requires the restore template to mirror the saved structure;
        # extras are always saved by Trainer.fit (discarded by callers that
        # don't want them), with a fallback for extra-less checkpoints.
        template: Dict[str, Any] = {
            "state": abstract_state,
            "extra": {
                "epoch": 0,
                "plateau": {"best": 0.0, "num_bad": 0},
                "lr": 0.0,
            },
        }
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        except ValueError:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore({"state": abstract_state}))
        return restored["state"], restored.get("extra", {}) or {}

    def load_config(self) -> Optional[Config]:
        path = os.path.join(self.directory, "config.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return Config.from_json(f.read())

    def close(self) -> None:
        self._mgr.close()


def abstract_like(state: TrainState) -> TrainState:
    """Shape/dtype skeleton for restore."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not isinstance(x, jax.ShapeDtypeStruct) else x, state)
