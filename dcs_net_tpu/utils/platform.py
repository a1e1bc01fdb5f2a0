"""Backend detection helpers.

The production TPU may be exposed through a PJRT plugin whose *backend* name
differs from "tpu" (e.g. the network-attached "axon" platform) while the
devices themselves still report ``platform == "tpu"`` — so feature gates must
look at the device platform, not ``jax.default_backend()``.
"""

from __future__ import annotations

import jax


def enable_fast_rng() -> None:
    """Switch jax.random to the 'rbg' implementation on TPU.

    Dropout draws full-tensor uniform masks every train step; with the
    default threefry generator those showed up as ~0.8 ms/step of
    counter-mode hashing in the device profile (bench/xprof.py,
    maximum_compare_fusion.* rows). 'rbg' keeps threefry-quality key
    derivation for split/fold_in but generates the bits with the TPU's
    hardware RNG instruction. Still deterministic per seed; streams differ
    from threefry (irrelevant for dropout). No-op off-TPU so CPU tests keep
    bit-stable fixtures."""
    if is_tpu_backend():
        jax.config.update("jax_default_prng_impl", "rbg")


def is_tpu_backend() -> bool:
    try:
        devs = jax.devices()
        if not devs:
            return False
        d = devs[0]
        return ("tpu" in str(getattr(d, "platform", "")).lower()
                or "tpu" in type(d).__name__.lower()
                or "TPU" in str(d))
    except Exception:
        return False
