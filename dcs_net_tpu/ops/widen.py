"""Lane-widened elementwise helpers for narrow-channel NHWC activations.

Why: the device profile of the train step (bench/xprof.py; BASELINE.md) shows
~60% of device time in elementwise fusions over (B, F, T, C) activations with
C in 1..32 — far below the 128-lane TPU vector width — plus relayout copies
XLA inserts juggling those narrow tensors. bench/layout_probe2.py measures the
same elementwise chain at (32,256,256,2) running ~5x slower than at
(32,256,512), while the merge-reshape (T, C) -> T*C round trip is free (XLA
folds it into the neighboring fusions and cancels adjacent unmerge/merge
pairs between consecutive widened ops).

So every elementwise op over a narrow-channel NHWC tensor here runs on the
minor-merged (B, F, T*C) view; per-channel parameters are applied by tiling
them along T (period-C lane pattern), and per-channel reductions read the
wide view then finish on a (T, C) reshape of the small partial result.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

# merging pays off only when the channel dim starves the 128-wide lanes
_LANE = 128


def should_widen(shape) -> bool:
    return len(shape) == 4 and shape[-1] < _LANE


def merge(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W*C) contiguous minor-dim merge."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w * c)


def unmerge(x: jnp.ndarray, c: int) -> jnp.ndarray:
    b, h, wc = x.shape
    return x.reshape(b, h, wc // c, c)


def widened(f: Callable, *xs: jnp.ndarray) -> jnp.ndarray:
    """Apply an elementwise f over the merged view of same-shape inputs."""
    if not should_widen(xs[0].shape):
        return f(*xs)
    c = xs[0].shape[-1]
    return unmerge(f(*(merge(x) for x in xs)), c)


def tile_channel(v: jnp.ndarray, w: int) -> jnp.ndarray:
    """Per-channel vector (C,) -> (W*C,) lane pattern for the merged view."""
    return jnp.tile(v, w)


def bcast_merge(a: jnp.ndarray, x_shape) -> jnp.ndarray:
    """Broadcast factor -> merged-view factor for x of shape (B, H, W, C).

    Supports the CBAM factor shapes: (B, 1, 1, C) channel attention and
    (B, H, W, 1) spatial attention. The returned array broadcasts against
    merge(x) of shape (B, H, W*C).

    Perf note: the tile/repeat materializes the factor at merged-activation
    size; the win relies on XLA fusing it into the neighboring multiply
    (verified by the committed xprof profiles — no standalone broadcast op
    appears). If that fusion ever breaks, the multiply gains a full-tensor
    write and this should revert to plain 4-D broadcasting."""
    b, h, w, c = x_shape
    if a.shape[-3:] == (1, 1, c):  # channel attention: tile [c0..cC] W times
        return jnp.tile(a.reshape(a.shape[0], 1, c), (1, 1, w))
    if a.shape[-3:] == (h, w, 1):  # spatial: repeat each w-element C times
        return jnp.repeat(a.reshape(a.shape[0], h, w), c, axis=-1)
    raise ValueError(f"unsupported broadcast shape {a.shape} vs {x_shape}")


def mul_bcast(x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """x * a with the multiply running on the lane-merged view."""
    if not should_widen(x.shape):
        return x * a
    return unmerge(merge(x) * bcast_merge(a, x.shape), x.shape[-1])


def channel_sums(x32: jnp.ndarray, terms: Sequence[Callable]) -> list:
    """Per-channel means of [t(x) for t in terms] over (B, H, W), computed
    with wide reads: reduce the merged (B, H, W*C) view over (B, H) first
    (full-lane traversal of the data), then finish on the tiny (W, C)
    partial. Exact — both stages are plain sums with equal weights.

    x32: (B, H, W, C) float32. Returns [(C,) array, ...].
    """
    b, h, w, c = x32.shape
    n = b * h * w
    outs = []
    for t in terms:
        partial = jnp.sum(merge(t(x32)), axis=(0, 1))  # (W*C,)
        outs.append(jnp.sum(partial.reshape(w, c), axis=0) / n)
    return outs
