"""Numerical-debug tripwires (the reference's detect_anomaly + per-tensor
NaN asserts, SURVEY.md §5 'race detection / sanitizers').

Two mechanisms:
  * ``sanitize_batch``: host-side per-batch NaN/Inf check (reference C7
    semantics) before device transfer;
  * ``checked``: wraps a jitted step with jax.experimental.checkify so NaN
    production inside the compiled program raises with a location, the
    jax-native analog of torch autograd anomaly mode
    (/root/reference/train.py:142). Opt-in: it costs performance.

``enable_debug_nans()`` flips jax's global debug-nan mode for interactive
sessions.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.experimental import checkify

from dcs_net_tpu.utils.carray import CArray


def sanitize_batch(batch: Any) -> None:
    """Raise FloatingPointError if any leaf holds NaN/Inf (host-side)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(batch)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            name = jax.tree_util.keystr(path)
            raise FloatingPointError(f"Found inf/-inf/nan in batch leaf {name}")


def checked(step_fn: Callable) -> Callable:
    """checkify-wrap a step function; returns fn raising on NaN/div errors."""
    checked_fn = checkify.checkify(
        step_fn, errors=checkify.float_checks)

    def run(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return run


def enable_debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
