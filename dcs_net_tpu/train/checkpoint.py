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

# Checkpoint payload format version (ADVICE r2 item 1):
#   1 — round-1 layout: opt_state as the raw nested optax tuple
#   2 — round-2+: opt_state wrapped in optax.flatten (flat leaf list); adds
#       the "meta" entry carrying this version
# Bump whenever the TrainState pytree structure changes, and extend
# _explain_format_mismatch with the migration story.
FORMAT_VERSION = 2


class CheckpointIncompatible(RuntimeError):
    pass


def _explain_format_mismatch(found: int, err: Exception) -> str:
    return (
        f"checkpoint format v{found} is incompatible with this build "
        f"(expects v{FORMAT_VERSION}). v1 checkpoints store the optimizer "
        "state as the raw optax tuple; v2 wraps it in optax.flatten. To "
        "migrate: CheckpointManager.restore_raw() the old checkpoint, keep "
        "raw['state']['params'] / ['batch_stats'], re-init the optimizer "
        "state, and re-save — the Adam moments are lost but training resumes "
        f"correctly after a short re-warmup. Underlying error: {err}")


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
        payload = {"state": state, "meta": {"format_version": FORMAT_VERSION}}
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
        # extras/meta are always saved by Trainer.fit (discarded by callers
        # that don't want them), with fallbacks for older checkpoints.
        extra_t = {"epoch": 0, "plateau": {"best": 0.0, "num_bad": 0},
                   "lr": 0.0}
        meta_t = {"format_version": 0}
        # build the template from the keys actually present on disk (older
        # checkpoints lack "meta"; bare saves lack "extra")
        try:
            on_disk = set(dict(self._mgr.item_metadata(step)).keys())
        except Exception:
            on_disk = {"state", "extra", "meta"}
        tmpl: Dict[str, Any] = {"state": abstract_state}
        if "extra" in on_disk:
            tmpl["extra"] = extra_t
        if "meta" in on_disk:
            tmpl["meta"] = meta_t
        restored, last_err = None, None
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(tmpl))
        except ValueError as e:
            last_err = e
        if restored is None:
            # every template failed on the "state" subtree itself: the
            # TrainState pytree layout (e.g. the opt_state wrapping) changed
            found = 1
            raise CheckpointIncompatible(
                _explain_format_mismatch(found, last_err)) from last_err
        found = int((restored.get("meta") or {}).get(
            "format_version", FORMAT_VERSION))
        if found != FORMAT_VERSION:
            raise CheckpointIncompatible(
                _explain_format_mismatch(found, ValueError("version field")))
        return restored["state"], restored.get("extra", {}) or {}

    def restore_raw(self, step: Optional[int] = None) -> Dict:
        """Template-free restore (nested dicts exactly as saved) — the escape
        hatch for migrating format-incompatible checkpoints: pick out
        raw['state']['params'] and re-initialise the rest."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._mgr.restore(step)

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
