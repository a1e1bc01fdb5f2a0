"""Backend detection helpers.

The production TPU may be exposed through a PJRT plugin whose *backend* name
differs from "tpu" (e.g. the network-attached "axon" platform) while the
devices themselves still report ``platform == "tpu"`` — so feature gates must
look at the device platform, not ``jax.default_backend()``.
"""

from __future__ import annotations

import jax


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
