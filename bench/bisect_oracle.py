"""Bisect the round-4 conv_engine flags against the complex composed oracle.

Runs tests/test_model_oracle_complex.py::test_composed_gradients_and_adam_step_complex
with one flag restored to its round-3 value at a time, to pin which round-4
reassociation moved the LSTM grads past tolerance. CPU-only; invoke as
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python bench/bisect_oracle.py <mode>
with mode in {head, phase, patchdot, both}.
"""
import sys

from dcs_net_tpu.ops import conv_engine as ce

mode = sys.argv[1]
if mode in ("phase", "both"):
    ce.STRIDED_MODE = "phase"
if mode in ("patchdot", "both"):
    ce.SAME_BWD = "patchdot"
print(f"[bisect] STRIDED_MODE={ce.STRIDED_MODE} SAME_BWD={ce.SAME_BWD}")

import pytest  # noqa: E402

rc = pytest.main([
    "tests/test_model_oracle_complex.py::test_composed_gradients_and_adam_step_complex",
    "-q", "--no-header", "-x",
])
sys.exit(rc)
