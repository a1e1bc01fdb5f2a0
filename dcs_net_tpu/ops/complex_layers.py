"""Complex-valued NN layers, TPU-first.

Semantics follow the complexPyTorch-v0.3 surface the reference consumes
(SURVEY.md §2.5; /root/reference/c_network.py:5-7): each complex op is a pair
of real sub-ops (f_r, f_i) combined as

    out = (f_r(x_r) - f_i(x_i)) + i (f_r(x_i) + f_i(x_r))

Implementation is NOT four separate real ops: the (re, im) planes are packed
on the channel (lane) axis and the pair becomes ONE real conv/matmul with a
block kernel [[Wr, Wi], [-Wi, Wr]] — a single MXU contraction with 2x
channels, which XLA tiles far better than 4 half-size convs. Biases keep the
torch pairing (b_r, b_i) -> (b_r - b_i, b_r + b_i) coming from each real
sub-op applying its own bias.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dcs_net_tpu.ops import conv_engine as ce
from dcs_net_tpu.ops import initializers as init
from dcs_net_tpu.ops import widen
from dcs_net_tpu.utils.carray import CArray

Pair = Tuple[int, int]


def _pair(k) -> Pair:
    return (k, k) if isinstance(k, int) else tuple(k)


def _block_kernel(wr: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """(kh, kw, cin, cout) pair -> (kh, kw, 2cin, 2cout) block kernel.

    Packed conv([x_r | x_i], K) yields [out_r | out_i] with
    out_r = x_r*Wr - x_i*Wi, out_i = x_r*Wi + x_i*Wr.
    """
    top = jnp.concatenate([wr, wi], axis=-1)      # cin rows: (.., cin, 2cout)
    bot = jnp.concatenate([-wi, wr], axis=-1)     # cin rows for x_i
    return jnp.concatenate([top, bot], axis=-2)   # (.., 2cin, 2cout)


def _combined_bias(br: jnp.ndarray, bi: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([br - bi, br + bi])


def _split_cin(kernel: jnp.ndarray, cins) -> Tuple[jnp.ndarray, ...]:
    """Split a (kh, kw, cin_total, cout) kernel along cin into per-part rows."""
    out, off = [], 0
    for c in cins:
        out.append(kernel[:, :, off:off + c])
        off += c
    return tuple(out)


class ComplexConv2d(nn.Module):
    """complexPyTorch ComplexConv2d as one packed real conv."""

    features: int
    kernel_size: int
    stride: Pair = (1, 1)
    padding: int = 0
    use_bias: bool = True
    weight_init: str = "xavier_uniform"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: CArray) -> CArray:
        kh, kw = _pair(self.kernel_size)
        cin = x.shape[-1]
        fan_in, fan_out = cin * kh * kw, self.features * kh * kw
        w_init = init.weight_init(self.weight_init, fan_in, fan_out)
        wr = self.param("kernel_r", w_init, (kh, kw, cin, self.features))
        wi = self.param("kernel_i", w_init, (kh, kw, cin, self.features))
        # one PACKED conv with the block kernel: splitting into per-(re,im)
        # plane convs was measured 2-4x slower on TPU — halving the already
        # tiny cin/cout (enc0: cin 2->1, SA: cout 2->1) collapses XLA's conv
        # emitter quality, and the pack concat at the encoder's small channel
        # counts is cheap. (The decoder convTs, where the concat IS the
        # bottleneck, use the multi-input path instead — ConvTranspose2d.)
        packed = jnp.concatenate([x.re, x.im], axis=-1).astype(self.dtype)
        p = self.padding
        y = ce.conv2d(packed, _block_kernel(wr, wi).astype(self.dtype),
                      self.stride, p)
        if self.use_bias:
            b_init = init.torch_bias_uniform(fan_in)
            br = self.param("bias_r", b_init, (self.features,))
            bi = self.param("bias_i", b_init, (self.features,))
            y = y + _combined_bias(br, bi).astype(y.dtype)
        return CArray.unpack_channels(y, axis=-1)


class ComplexConvTranspose2d(nn.Module):
    """complexPyTorch ComplexConvTranspose2d; stride (1,1) in this family
    (/root/reference/config.py:100), implemented like real_layers.ConvTranspose2d
    on the packed block kernel."""

    features: int
    kernel_size: int
    stride: Pair = (1, 1)
    padding: int = 0
    use_bias: bool = True
    weight_init: str = "xavier_uniform"
    dtype: jnp.dtype = jnp.float32
    upsample: Pair = (1, 1)  # fused pre-conv nearest upsample

    @nn.compact
    def __call__(self, x) -> CArray:
        """x: CArray, or a TUPLE of CArrays treated as channel-concatenated
        (the decoder's skip concat) without materializing the concat; with
        ``upsample`` != (1,1) the preceding nearest-upsample is fused in
        (conv_engine.upsampled_conv2d_multi)."""
        # NB: CArray IS a NamedTuple — test for it before the tuple case
        xs = (x,) if isinstance(x, CArray) else tuple(x)
        kh, kw = _pair(self.kernel_size)
        cins = [xi.shape[-1] for xi in xs]
        cin = sum(cins)
        fan_in, fan_out = self.features * kh * kw, cin * kh * kw
        w_init = init.weight_init(self.weight_init, fan_in, fan_out)
        wr = self.param("kernel_r", w_init, (kh, kw, cin, self.features))
        wi = self.param("kernel_i", w_init, (kh, kw, cin, self.features))
        p = self.padding
        dt = self.dtype
        res = [xc.re.astype(dt) for xc in xs]
        ims = [xc.im.astype(dt) for xc in xs]
        fr = jnp.flip(wr, axis=(0, 1)).astype(dt)
        fi = jnp.flip(wi, axis=(0, 1)).astype(dt)
        fr_parts, fi_parts = _split_cin(fr, cins), _split_cin(fi, cins)
        # multi-input with PACKED-output block columns: the inputs
        # (d.re, skip.re, d.im, skip.im) are read in place (neither the skip
        # concat nor the re/im pack is materialized — both profiled as
        # 0.3-0.6 ms pad+maximum fusions at full res), while the output
        # keeps the 2*cout packed lanes so every dot stays as wide as the
        # block-kernel formulation.
        ins = tuple(res + ims)
        w_cols = tuple(
            [jnp.concatenate([r, i], axis=-1) for r, i in
             zip(fr_parts, fi_parts)] +
            [jnp.concatenate([-i, r], axis=-1) for r, i in
             zip(fr_parts, fi_parts)])
        if self.upsample != (1, 1):
            assert self.stride == (1, 1) and p == kh // 2
            y = ce.upsampled_conv2d_multi(ins, w_cols, self.upsample)
            y_re, y_im = y[..., :self.features], y[..., self.features:]
        elif self.stride == (1, 1):
            # stride-1 convT == plain conv with flipped kernel, padding
            # k-1-p; channel-concat-free (see above)
            y = ce.conv2d_multi(ins, w_cols, (1, 1), kh - 1 - p)
            y_re, y_im = y[..., :self.features], y[..., self.features:]
        else:
            def upconv(x_, w_):
                return jax.lax.conv_general_dilated(
                    x_, w_, window_strides=(1, 1),
                    padding=((kh - 1 - p, kh - 1 - p),
                             (kw - 1 - p, kw - 1 - p)),
                    lhs_dilation=self.stride,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            xr = jnp.concatenate(res, -1) if len(res) > 1 else res[0]
            xi = jnp.concatenate(ims, -1) if len(ims) > 1 else ims[0]
            y_re = upconv(xr, fr) - upconv(xi, fi)
            y_im = upconv(xr, fi) + upconv(xi, fr)
        if self.use_bias:
            b_init = init.torch_bias_uniform(fan_in)
            br = self.param("bias_r", b_init, (self.features,))
            bi = self.param("bias_i", b_init, (self.features,))
            y_re = y_re + (br - bi).astype(y_re.dtype)
            y_im = y_im + (br + bi).astype(y_im.dtype)
        return CArray(y_re, y_im)


class ComplexLinear(nn.Module):
    """complexPyTorch ComplexLinear as one packed matmul."""

    features: int
    use_bias: bool = True
    weight_init: str = "xavier_uniform"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: CArray) -> CArray:
        fan_in, fan_out = x.shape[-1], self.features
        w_init = init.weight_init(self.weight_init, fan_in, fan_out)
        wr = self.param("kernel_r", w_init, (fan_in, self.features))
        wi = self.param("kernel_i", w_init, (fan_in, self.features))
        packed = jnp.concatenate([x.re, x.im], axis=-1).astype(self.dtype)
        block = jnp.concatenate([
            jnp.concatenate([wr, wi], axis=-1),
            jnp.concatenate([-wi, wr], axis=-1)], axis=-2)
        y = packed @ block.astype(self.dtype)
        if self.use_bias:
            b_init = init.torch_bias_uniform(fan_in)
            br = self.param("bias_r", b_init, (self.features,))
            bi = self.param("bias_i", b_init, (self.features,))
            y = y + _combined_bias(br, bi).astype(y.dtype)
        return CArray.unpack_channels(y, axis=-1)


class ComplexBatchNorm2d(nn.Module):
    """Trabelsi-style whitening complex BN (complexPyTorch ComplexBatchNorm2d).

    Per channel: center by the complex mean, whiten by the inverse square root
    of the 2x2 (re, im) covariance, then apply a learnable 2x2 Gamma and
    complex beta. Running stats (mean + covariance triple) are tracked with
    torch momentum semantics.

    Init follows Trabelsi et al. (Deep Complex Networks): Gamma_rr = Gamma_ii
    = 1/sqrt(2), Gamma_ri = 0, running V_rr = V_ii = 1/sqrt(2) — so a unit
    complex input keeps unit modulus variance at init. (complexPyTorch v0.3
    uses the same constants; it is not installable here to diff against, so
    these constants are asserted by property tests rather than golden files.)

    The batch covariance diagonal gets +eps (matching the reference library's
    Crr/Cii + eps before inversion); Cri does not.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x: CArray, *, train: bool) -> CArray:
        f = self.features
        inv_sqrt2 = 0.7071067811865476
        grr = self.param("gamma_rr", lambda k, s: jnp.full(s, inv_sqrt2), (f,))
        gii = self.param("gamma_ii", lambda k, s: jnp.full(s, inv_sqrt2), (f,))
        gri = self.param("gamma_ri", nn.initializers.zeros, (f,))
        beta_r = self.param("beta_r", nn.initializers.zeros, (f,))
        beta_i = self.param("beta_i", nn.initializers.zeros, (f,))
        r_mean_r = self.variable("batch_stats", "mean_r", lambda: jnp.zeros(f))
        r_mean_i = self.variable("batch_stats", "mean_i", lambda: jnp.zeros(f))
        r_vrr = self.variable("batch_stats", "vrr", lambda: jnp.full((f,), inv_sqrt2))
        r_vii = self.variable("batch_stats", "vii", lambda: jnp.full((f,), inv_sqrt2))
        r_vri = self.variable("batch_stats", "vri", lambda: jnp.zeros(f))

        # whitening stats + normalization in f32 (bf16 accumulation over
        # B*H*W would corrupt the 2x2 covariance); output in the input dtype.
        # Stats and apply read the lane-merged (B, H, W*C) views — narrow-C
        # NHWC traversals starve the 128-lane vector width (ops/widen.py).
        in_dtype = x.re.dtype
        xr32 = x.re.astype(jnp.float32)
        xi32 = x.im.astype(jnp.float32)
        wide = widen.should_widen(xr32.shape)

        def cmean(v):  # per-channel mean with wide reads
            if wide:
                (out,) = widen.channel_sums(v, [lambda u: u])
                return out
            return jnp.mean(v, tuple(range(v.ndim - 1)))

        if train:
            mean_r = cmean(xr32)
            mean_i = cmean(xi32)
            xr = xr32 - mean_r
            xi = xi32 - mean_i
            vrr = cmean(xr * xr) + self.eps
            vii = cmean(xi * xi) + self.eps
            vri = cmean(xr * xi)
            if not self.is_initializing():
                n = xr32.size // f
                unb = n / max(n - 1, 1)
                m = self.momentum
                r_mean_r.value = (1 - m) * r_mean_r.value + m * mean_r
                r_mean_i.value = (1 - m) * r_mean_i.value + m * mean_i
                r_vrr.value = (1 - m) * r_vrr.value + m * (vrr - self.eps) * unb
                r_vii.value = (1 - m) * r_vii.value + m * (vii - self.eps) * unb
                r_vri.value = (1 - m) * r_vri.value + m * vri * unb
        else:
            mean_r, mean_i = r_mean_r.value, r_mean_i.value
            vrr = r_vrr.value + self.eps
            vii = r_vii.value + self.eps
            vri = r_vri.value

        # inverse sqrt of [[vrr, vri], [vri, vii]]
        det = vrr * vii - vri * vri
        s = jnp.sqrt(det)
        t = jnp.sqrt(vrr + vii + 2.0 * s)
        inv_st = 1.0 / (s * t)
        rrr = (vii + s) * inv_st
        rii = (vrr + s) * inv_st
        rri = -vri * inv_st

        # fold whitening + Gamma + centering into ONE per-channel 2x2 affine:
        # out_r = a*x_r + b*x_i + cr ; out_i = c*x_r + d*x_i + ci — the apply
        # is then two 3-operand wide fusions instead of the 6-multiply chain
        a = grr * rrr + gri * rri
        b = grr * rri + gri * rii
        c = gri * rrr + gii * rri
        d = gri * rri + gii * rii
        cr = beta_r - a * mean_r - b * mean_i
        ci = beta_i - c * mean_r - d * mean_i
        if wide:
            w = xr32.shape[-2]
            xrm, xim = widen.merge(xr32), widen.merge(xi32)
            am, bm = widen.tile_channel(a, w), widen.tile_channel(b, w)
            cm, dm = widen.tile_channel(c, w), widen.tile_channel(d, w)
            crm, cim = widen.tile_channel(cr, w), widen.tile_channel(ci, w)
            out_r = widen.unmerge(xrm * am + xim * bm + crm, f)
            out_i = widen.unmerge(xrm * cm + xim * dm + cim, f)
        else:
            out_r = xr32 * a + xi32 * b + cr
            out_i = xr32 * c + xi32 * d + ci
        return CArray(out_r.astype(in_dtype), out_i.astype(in_dtype))


def complex_mul_bcast(x: CArray, a: CArray) -> CArray:
    """x * a (complex product) with a broadcast CBAM attention factor
    ((B,1,1,C) or (B,H,W,1)), computed on lane-merged views (ops/widen.py)."""
    if not widen.should_widen(x.shape):
        return x * a
    c = x.shape[-1]
    xr, xi = widen.merge(x.re), widen.merge(x.im)
    ar = widen.bcast_merge(a.re, x.shape)
    ai = widen.bcast_merge(a.im, x.shape)
    return CArray(widen.unmerge(xr * ar - xi * ai, c),
                  widen.unmerge(xr * ai + xi * ar, c))


# -- activations / pools / resampling (split re/im semantics) ----------------

def complex_relu(x: CArray) -> CArray:
    """ComplexReLU: split ReLU (complexPyTorch; matches the first-party
    pattern at /root/reference/network_functions.py:103-105)."""
    from dcs_net_tpu.ops.real_layers import relu

    return CArray(relu(x.re), relu(x.im))


def complex_leaky_relu(x: CArray, negative_slope: float = 0.01) -> CArray:
    """ComplexLReLU (/root/reference/network_functions.py:98-105)."""
    from dcs_net_tpu.ops.real_layers import leaky_relu

    return CArray(leaky_relu(x.re, negative_slope),
                  leaky_relu(x.im, negative_slope))


def complex_sigmoid(x: CArray) -> CArray:
    """ComplexSigmoid (/root/reference/network_functions.py:107-112)."""
    return CArray(widen.widened(jax.nn.sigmoid, x.re),
                  widen.widened(jax.nn.sigmoid, x.im))


def complex_upsample_nearest(x: CArray, scale: Pair) -> CArray:
    """complex_upsample: nearest interpolation on re and im separately
    (/root/reference/c_network.py:215-216)."""
    from dcs_net_tpu.ops.real_layers import upsample_nearest

    return CArray(upsample_nearest(x.re, scale), upsample_nearest(x.im, scale))


def complex_adaptive_avg_pool_1(x: CArray) -> CArray:
    """(B, H, W, C) -> (B, 1, 1, C) complex mean
    (/root/reference/network_functions.py:114-125). f32 accumulation."""
    return CArray(
        jnp.mean(x.re, axis=(-3, -2), keepdims=True,
                 dtype=jnp.float32).astype(x.re.dtype),
        jnp.mean(x.im, axis=(-3, -2), keepdims=True,
                 dtype=jnp.float32).astype(x.im.dtype))


def complex_adaptive_max_pool_1(x: CArray, *, faithful_avg: bool) -> CArray:
    """Reference quirk: the 'max' pool is actually an avg pool
    (/root/reference/network_functions.py:127-138). Idiomatic mode does a true
    componentwise max (the evident intent, mirroring ComplexSpatialAttention's
    per-component max at /root/reference/c_network.py:79-81)."""
    if faithful_avg:
        return complex_adaptive_avg_pool_1(x)
    return CArray(
        jnp.max(x.re, axis=(-3, -2), keepdims=True),
        jnp.max(x.im, axis=(-3, -2), keepdims=True))


class ComplexDropout(nn.Module):
    """Dropout through view_as_real: independent masks for re and im
    (/root/reference/c_network.py:195-196,203-204,221-222)."""

    rate: float

    @nn.compact
    def __call__(self, x: CArray, *, train: bool) -> CArray:
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        scale = 1.0 / keep
        if widen.should_widen(x.shape):
            # independent re/im masks (same semantics as the reference's
            # view_as_real dropout), drawn and applied on lane-merged views.
            # NB: this path draws the mask as (2,)+merged vs the narrow
            # path's shape+(2,) — the same key yields a DIFFERENT bit
            # assignment per element across the two paths. Semantics
            # (independent per-element Bernoulli) are preserved; only
            # cross-path RNG reproducibility differs, and no product config
            # toggles the widen threshold between runs.
            c = x.shape[-1]
            rm, im_ = widen.merge(x.re), widen.merge(x.im)
            # (2, ...) leading so the mask tensor itself stays lane-wide
            mask = jax.random.bernoulli(rng, keep, (2,) + rm.shape)
            return CArray(
                widen.unmerge(jnp.where(mask[0], rm * scale, 0.0), c),
                widen.unmerge(jnp.where(mask[1], im_ * scale, 0.0), c))
        mask = jax.random.bernoulli(rng, keep, x.shape + (2,))
        return CArray(
            jnp.where(mask[..., 0], x.re * scale, 0.0),
            jnp.where(mask[..., 1], x.im * scale, 0.0))
