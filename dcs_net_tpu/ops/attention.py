"""CBAM channel + spatial attention, real and complex.

Reference: RealChannelAttention / RealSpatialAttention
(/root/reference/r_network.py:8-40) and ComplexChannelAttention /
ComplexSpatialAttention (/root/reference/c_network.py:53-84).

Quirks reproduced behind flags:
  * real channel attention discards the avg branch (out = max_fc only,
    r_network.py:23-24) — ``max_only``;
  * the complex "max" pool is an avg pool (network_functions.py:135-138) —
    ``maxpool_is_avg``. The complex channel attention therefore effectively
    computes sigmoid(2 * avg_fc) in faithful mode.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from dcs_net_tpu.ops import complex_layers as cl
from dcs_net_tpu.ops import real_layers as rl
from dcs_net_tpu.ops import widen
from dcs_net_tpu.utils.carray import CArray


class RealChannelAttention(nn.Module):
    channels: int
    reduction: int
    max_only: bool = True  # Quirks.real_ca_max_only
    weight_init: str = "xavier_uniform"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = max(self.channels // self.reduction, 1)
        fc1 = rl.Conv2d(hidden, 1, use_bias=False, weight_init=self.weight_init,
                        dtype=self.dtype, name="fc1")
        fc2 = rl.Conv2d(self.channels, 1, use_bias=False,
                        weight_init=self.weight_init, dtype=self.dtype,
                        name="fc2")

        def fc(v):
            return fc2(rl.relu(fc1(v)))

        # the reference computes the avg branch and then discards it
        # (r_network.py:23-24); skipping it entirely is output-identical and
        # saves a full (B,F,T,C) reduction + FC in fwd AND bwd per module
        if self.max_only:
            out = fc(rl.adaptive_max_pool_1(x))
        else:
            out = fc(rl.adaptive_avg_pool_1(x)) + fc(rl.adaptive_max_pool_1(x))
        return jnp.reciprocal(1.0 + jnp.exp(-out))


class RealSpatialAttention(nn.Module):
    kernel_size: int = 7
    weight_init: str = "xavier_uniform"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        avg_out = jnp.mean(x, axis=-1, keepdims=True)
        max_out = jnp.max(x, axis=-1, keepdims=True)
        cat = jnp.concatenate([avg_out, max_out], axis=-1)
        conv = rl.Conv2d(1, self.kernel_size, padding=self.kernel_size // 2,
                         use_bias=False, weight_init=self.weight_init,
                         dtype=self.dtype, name="conv")
        # (B, H, W, 1) at full resolution: run the sigmoid lane-merged
        return widen.widened(
            lambda v: jnp.reciprocal(1.0 + jnp.exp(-v)), conv(cat))


class ComplexChannelAttention(nn.Module):
    channels: int
    reduction: int
    maxpool_is_avg: bool = True  # Quirks.complex_maxpool_is_avg
    weight_init: str = "xavier_uniform"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: CArray) -> CArray:
        hidden = max(self.channels // self.reduction, 1)
        fc1 = cl.ComplexConv2d(hidden, 1, use_bias=False,
                               weight_init=self.weight_init, dtype=self.dtype,
                               name="fc1")
        fc2 = cl.ComplexConv2d(self.channels, 1, use_bias=False,
                               weight_init=self.weight_init, dtype=self.dtype,
                               name="fc2")

        def fc(v):
            return fc2(cl.complex_relu(fc1(v)))

        if self.maxpool_is_avg:
            # faithful mode: the reference's complex "max pool" IS an avg pool
            # (network_functions.py:135-138), so avg_fc + max_fc == 2*avg_fc —
            # one pooled reduction + FC instead of two, bit-identical output
            avg_out = fc(cl.complex_adaptive_avg_pool_1(x))
            return cl.complex_sigmoid(avg_out + avg_out)
        avg_out = fc(cl.complex_adaptive_avg_pool_1(x))
        max_out = fc(cl.complex_adaptive_max_pool_1(x, faithful_avg=False))
        return cl.complex_sigmoid(avg_out + max_out)


class ComplexSpatialAttention(nn.Module):
    kernel_size: int = 7
    weight_init: str = "xavier_uniform"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: CArray) -> CArray:
        avg_out = CArray(
            jnp.mean(x.re, axis=-1, keepdims=True),
            jnp.mean(x.im, axis=-1, keepdims=True))
        max_out = CArray(
            jnp.max(x.re, axis=-1, keepdims=True),
            jnp.max(x.im, axis=-1, keepdims=True))
        cat = CArray(
            jnp.concatenate([avg_out.re, max_out.re], axis=-1),
            jnp.concatenate([avg_out.im, max_out.im], axis=-1))
        conv = cl.ComplexConv2d(1, self.kernel_size, padding=self.kernel_size // 2,
                                use_bias=False, weight_init=self.weight_init,
                                dtype=self.dtype, name="conv")
        return cl.complex_sigmoid(conv(cat))
