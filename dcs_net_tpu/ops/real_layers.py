"""Real-valued NN layers with exact torch semantics, NHWC layout.

These back the DR/DRS variants (reference C5, /root/reference/r_network.py) and
are the building blocks the complex layers compose. Data layout is NHWC
(B, F, T, C) — channels on the TPU lane dimension — vs the reference's NCHW;
tests convert torch weights to verify numerical parity.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dcs_net_tpu.ops import conv_engine as ce
from dcs_net_tpu.ops import initializers as init
from dcs_net_tpu.ops import widen

Pair = Tuple[int, int]


def _pair(k) -> Pair:
    return (k, k) if isinstance(k, int) else tuple(k)


def _split_cin(kernel: jnp.ndarray, xs) -> Tuple[jnp.ndarray, ...]:
    """Split a (kh, kw, cin_total, cout) kernel along cin per input part."""
    out, off = [], 0
    for x in xs:
        c = x.shape[-1]
        out.append(kernel[:, :, off:off + c])
        off += c
    return tuple(out)


class Conv2d(nn.Module):
    """torch.nn.Conv2d semantics (symmetric zero padding, cross-correlation).

    Kernel stored flax-style (kh, kw, cin, cout); init distributions computed
    with torch fan rules (initializers.py).
    """

    features: int
    kernel_size: int
    stride: Pair = (1, 1)
    padding: int = 0
    use_bias: bool = True
    weight_init: str = "xavier_uniform"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        cin = x.shape[-1]
        fan_in, fan_out = cin * kh * kw, self.features * kh * kw
        kernel = self.param(
            "kernel", init.weight_init(self.weight_init, fan_in, fan_out),
            (kh, kw, cin, self.features))
        p = self.padding
        # operands AND output in self.dtype (the MXU accumulates in f32
        # internally regardless; activations staying bf16 halves HBM traffic,
        # the actual bottleneck). Single-dtype keeps the conv VJP well-typed.
        # conv_engine reroutes degenerate-channel shapes to dot_general
        # reformulations (near-roofline; BASELINE.md per-op table).
        y = ce.conv2d(x.astype(self.dtype), kernel.astype(self.dtype),
                      self.stride, p)
        if self.use_bias:
            bias = self.param("bias", init.torch_bias_uniform(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class ConvTranspose2d(nn.Module):
    """torch.nn.ConvTranspose2d semantics.

    Implemented as conv_general_dilated with lhs (input) dilation = stride and
    flipped kernels — the standard transpose-as-fractionally-strided-conv
    identity — with padding k-1-p per side. output_padding unsupported (the
    reference only uses stride (1,1): /root/reference/config.py:100).
    """

    features: int
    kernel_size: int
    stride: Pair = (1, 1)
    padding: int = 0
    use_bias: bool = True
    weight_init: str = "xavier_uniform"
    dtype: jnp.dtype = jnp.float32
    upsample: Pair = (1, 1)  # fused pre-conv nearest upsample (decoder stages)

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        """x: input array, or a TUPLE of arrays treated as channel-concatenated
        (the decoder's skip concat) without materializing the concat. With
        ``upsample`` != (1,1) the nearest-upsample preceding the conv is fused
        in via output-phase decomposition (conv_engine.upsampled_conv2d_multi)
        — requires stride (1,1), which is the only mode this family uses."""
        xs = x if isinstance(x, tuple) else (x,)
        kh, kw = _pair(self.kernel_size)
        cin = sum(xi.shape[-1] for xi in xs)
        # torch convT weight is (Cin, Cout, kh, kw): fan_in uses dim1 = Cout.
        fan_in, fan_out = self.features * kh * kw, cin * kh * kw
        kernel = self.param(
            "kernel", init.weight_init(self.weight_init, fan_in, fan_out),
            (kh, kw, cin, self.features))
        p = self.padding
        flipped = jnp.flip(kernel, axis=(0, 1)).astype(self.dtype)
        if self.upsample != (1, 1):
            assert self.stride == (1, 1) and p == kh // 2
            y = ce.upsampled_conv2d_multi(
                tuple(xi.astype(self.dtype) for xi in xs),
                _split_cin(flipped, xs), self.upsample)
        elif self.stride == (1, 1):
            # stride-1 convT == plain conv with flipped kernel, padding
            # k-1-p — the engine handles the degenerate decoder shapes
            y = ce.conv2d_multi(
                tuple(xi.astype(self.dtype) for xi in xs),
                _split_cin(flipped, xs), (1, 1), kh - 1 - p)
        else:
            x = (jnp.concatenate([xi for xi in xs], axis=-1)
                 if len(xs) > 1 else xs[0])
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), flipped,
                window_strides=(1, 1),
                padding=((kh - 1 - p, kh - 1 - p), (kw - 1 - p, kw - 1 - p)),
                lhs_dilation=self.stride,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", init.torch_bias_uniform(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class Linear(nn.Module):
    """torch.nn.Linear semantics: y = x W^T + b, weight (out, in) fan rules."""

    features: int
    use_bias: bool = True
    weight_init: str = "xavier_uniform"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in, fan_out = x.shape[-1], self.features
        kernel = self.param(
            "kernel", init.weight_init(self.weight_init, fan_in, fan_out),
            (fan_in, self.features))
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", init.torch_bias_uniform(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class BatchNorm2d(nn.Module):
    """torch.nn.BatchNorm2d semantics over NHWC.

    Train: normalize with biased batch variance; running stats updated with
    momentum 0.1 and the UNBIASED variance (torch's quirkily mixed convention).
    Eval: running stats. Stats live in the 'batch_stats' collection.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features))
        # stats and normalization in f32 regardless of activation dtype
        # (bf16 accumulation over B*H*W elements would be inaccurate);
        # output returns in the input's dtype. Stats and apply both read the
        # lane-merged (B, H, W*C) view — narrow-C NHWC traversals run far
        # below the 128-lane vector width (ops/widen.py rationale).
        x32 = x.astype(jnp.float32)
        wide = widen.should_widen(x.shape)
        if train:
            if wide:
                (mean,) = widen.channel_sums(x32, [lambda v: v])
                (var,) = widen.channel_sums(
                    x32, [lambda v: jnp.square(v - mean)])  # biased
            else:
                axes = tuple(range(x.ndim - 1))
                mean = jnp.mean(x32, axes)
                var = jnp.mean(jnp.square(x32 - mean), axes)  # biased
            n = x.size // self.features
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        # fold into one scale+shift so the apply is a 2-operand wide fusion
        scale = jax.lax.rsqrt(var + self.eps) * gamma
        shift = beta - mean * scale
        if wide:
            w = x.shape[-2]
            sc = widen.tile_channel(scale, w)
            sh = widen.tile_channel(shift, w)
            y = widen.merge(x32) * sc + sh
            return widen.unmerge(y, self.features).astype(x.dtype)
        return (x32 * scale + shift).astype(x.dtype)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return widen.widened(lambda v: jnp.maximum(v, 0), x)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    """torch default slope 0.01 (nn.LeakyReLU())."""
    return widen.widened(
        lambda v: jnp.where(v >= 0, v, negative_slope * v), x)


def upsample_nearest(x: jnp.ndarray, scale: Pair) -> jnp.ndarray:
    """nn.Upsample(mode='nearest') with integer scale over NHWC == exact repeat."""
    sh, sw = scale
    if sh > 1:
        x = jnp.repeat(x, sh, axis=-3)
    if sw > 1:
        x = jnp.repeat(x, sw, axis=-2)
    return x


def adaptive_avg_pool_1(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) over NHWC -> (B, 1, 1, C). f32 accumulation
    (a bf16 sum over H*W elements loses ~sqrt(HW)*2^-8 relative accuracy)."""
    return jnp.mean(x, axis=(-3, -2), keepdims=True,
                    dtype=jnp.float32).astype(x.dtype)


def adaptive_max_pool_1(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(x, axis=(-3, -2), keepdims=True)


class Dropout(nn.Module):
    """torch inverted dropout; needs the 'dropout' rng when train=True."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        if widen.should_widen(x.shape):
            # same Bernoulli stream (counter-based bits depend only on the
            # element count), applied on the lane-merged view
            xm = widen.merge(x)
            mask = jax.random.bernoulli(rng, keep, xm.shape)
            return widen.unmerge(
                jnp.where(mask, xm / keep, 0.0), x.shape[-1])
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)
