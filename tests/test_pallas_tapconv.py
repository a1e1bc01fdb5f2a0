"""Interpret-mode parity for the VMEM tap-accumulated conv kernel
(ops/pallas_tapconv.py) against the XLA patch-dot it replaces."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcs_net_tpu.ops import conv_engine as ce
from dcs_net_tpu.ops.pallas_tapconv import tapconv_applicable, tapconv_valid


@pytest.mark.parametrize("shape,taps,n", [
    ((2, 10, 9, 64), (3, 3), 32),
    ((2, 7, 7, 96), (2, 2), 128),
    ((1, 6, 8, 128), (3, 1), 16),
])
def test_tapconv_interpret_parity(shape, taps, n):
    rng = np.random.default_rng(5)
    dh_n, dw_n = taps
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(
        (dh_n * dw_n, shape[-1], n)).astype(np.float32)) * 0.1

    got = tapconv_valid(x, w, dh_n, dw_n, interpret=True)
    want = jax.lax.dot_general(
        ce._updot_patches(x, taps),
        w.reshape(dh_n * dw_n * shape[-1], n),
        (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tapconv_applicable_gate():
    assert tapconv_applicable((32, 66, 66, 96), (9, 96, 128))
    assert not tapconv_applicable((32, 66, 66, 20), (9, 20, 8))     # narrow
    assert not tapconv_applicable((32, 600, 600, 128), (9, 128, 128))  # VMEM


def test_tapconv_applicable_dtype_aware():
    """The VMEM estimate uses the real operand dtypes: a shape that fits at
    bf16 can overflow the budget at f32 (advisor r4)."""
    import jax.numpy as jnp

    shape_x, shape_w = (32, 80, 80, 256), (9, 256, 128)
    # bf16: 3.13 (x) + 0.56 (w) + 6.25 (f32 out x2) = 9.94 MB -> fits
    # f32:  6.25 (x) + 1.13 (w) + 6.25             = 13.6 MB -> rejected
    assert tapconv_applicable(shape_x, shape_w)  # bf16 default fits
    assert not tapconv_applicable(shape_x, shape_w,
                                  x_dtype=jnp.float32, w_dtype=jnp.float32)
