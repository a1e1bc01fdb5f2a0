"""Parameter initializers reproducing the torch distributions the reference
relies on (weights_init applies xavier_uniform_ to every Conv2d /
ConvTranspose2d / Linear weight — /root/reference/r_network.py:124-134 — and
biases/LSTM keep torch defaults).

Fan computation follows torch._calculate_fan_in_and_fan_out on the TORCH
weight layout, then the sample is materialized in the flax layout:
  conv:   torch (Cout, Cin, kh, kw)  -> fan_in = Cin*kh*kw,  fan_out = Cout*kh*kw
  convT:  torch (Cin, Cout, kh, kw)  -> fan_in = Cout*kh*kw, fan_out = Cin*kh*kw
  linear: torch (out, in)            -> fan_in = in,         fan_out = out
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def xavier_uniform(fan_in: int, fan_out: int, gain: float = 1.0):
    bound = gain * float(np.sqrt(6.0 / (fan_in + fan_out)))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_uniform(fan_in: int, a: float = float(np.sqrt(5.0))):
    """torch.nn.init.kaiming_uniform_ with default nonlinearity='leaky_relu':
    bound = sqrt(6 / ((1 + a^2) * fan_in)). a=sqrt(5) is torch's conv/linear
    default weight init; a may be overridden for the HPO search space
    (/root/reference/train.py:24-25 uses the plain default a=sqrt(5))."""
    gain = float(np.sqrt(2.0 / (1.0 + a * a)))
    bound = gain * float(np.sqrt(3.0 / fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_uniform(fan_in: int):
    """torch Conv/Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / float(np.sqrt(fan_in)) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def lstm_uniform(hidden_size: int):
    """torch LSTM default: all params U(-1/sqrt(H), 1/sqrt(H))."""
    return torch_bias_uniform(hidden_size)


def weight_init(name: str, fan_in: int, fan_out: int):
    if name == "xavier_uniform":
        return xavier_uniform(fan_in, fan_out)
    if name == "kaiming_uniform":
        return kaiming_uniform(fan_in)
    raise ValueError(f"unknown init {name!r}")
