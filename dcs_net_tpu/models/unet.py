"""The DCS-Net U-Net family (DR / DC / DRS / DCS) as one flax module.

Topology (reference /root/reference/r_network.py:43-173 and c_network.py:87-226):
7-layer strided conv encoder (BN + ReLU + dropout), bidirectional-LSTM + FC
latent bottleneck, 7-stage decoder of [skip-CBAM -> concat -> nearest-upsample
-> convT(1,1) -> BN -> LeakyReLU -> decoder-CBAM -> dropout], sigmoid /
tanh-magnitude output bound. The complex axis swaps every op for its complex
counterpart and halves channel counts (ModelConfig.enc_channels).

TPU-first choices: NHWC layout (channels on lanes), complex ops as packed
single MXU contractions (ops/complex_layers.py), LSTM as lax.scan with hoisted
input projections (ops/lstm.py). The whole forward is trace-static: layer
loops unroll at trace time, shapes are fixed by the config.

The variant axis ``subtractive`` does not change the module — only how the
step functions use the predicted mask (train/steps.py) — exactly as in the
reference where dr/drs share R_NETWORK.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
from flax import linen as nn

from dcs_net_tpu.core.config import ModelConfig, Quirks
from dcs_net_tpu.ops import attention as att
from dcs_net_tpu.ops import complex_layers as cl
from dcs_net_tpu.ops import masks
from dcs_net_tpu.ops import real_layers as rl
from dcs_net_tpu.ops import widen
from dcs_net_tpu.ops.lstm import LSTM, ComplexLSTM
from dcs_net_tpu.utils.carray import CArray

SpecLike = Union[jnp.ndarray, CArray]


class DCSNet(nn.Module):
    cfg: ModelConfig
    quirks: Quirks = Quirks()

    @nn.compact
    def __call__(self, x: SpecLike, *, train: bool, lstm_state=None,
                 return_lstm_state: bool = False):
        """x: (B, F, T) magnitude (real nets) or CArray spectrogram (complex).

        Returns the bounded mask, shape (B, F, T) (real or CArray). With
        ``return_lstm_state=True`` returns ``(mask, lstm_state)`` instead —
        the streaming-enhancement path threads the (h, c) carry across chunks
        (pair with ``lstm_bidir=False`` + ``lstm_time_major=True`` so the
        carried state means "continuation of the same sequence").
        """
        m = self.cfg
        cx = m.complex_valued
        if cx and not isinstance(x, CArray):
            raise TypeError("complex variant expects a CArray input")
        # Mixed precision fast path: matmul/conv operands in compute_dtype
        # (bfloat16 on TPU), f32 accumulation (preferred_element_type) and f32
        # params/normalization/activations. float32 == exact parity mode.
        dt = jnp.dtype(m.compute_dtype)

        def expand(v):  # (B, F, T) -> (B, F, T, 1)
            return v[..., None]

        e = CArray(expand(x.re), expand(x.im)) if cx else expand(x)

        # -- initial BN (r_network.py:57, c_network.py:101) ------------------
        if cx:
            e = cl.ComplexBatchNorm2d(1, name="initial_bn")(e, train=train)
        else:
            e = rl.BatchNorm2d(1, name="initial_bn")(e, train=train)

        drop_conv = (cl.ComplexDropout(m.dropout_conv, name="dropout_conv") if cx
                     else rl.Dropout(m.dropout_conv, name="dropout_conv"))
        drop_fc = (cl.ComplexDropout(m.dropout_fc, name="dropout_fc") if cx
                   else rl.Dropout(m.dropout_fc, name="dropout_fc"))

        # -- encoder ---------------------------------------------------------
        enc_out = [e]
        for i in range(m.n_layers):
            _, cout = m.enc_channels(i)
            if cx:
                e = cl.ComplexConv2d(cout, m.kernel_e[i], stride=m.stride_e[i],
                                     padding=m.kernel_e[i] // 2, dtype=dt,
                                     weight_init=m.init, name=f"enc{i}_conv")(e)
                e = cl.ComplexBatchNorm2d(cout, name=f"enc{i}_bn")(e, train=train)
                e = cl.complex_relu(e)
            else:
                e = rl.Conv2d(cout, m.kernel_e[i], stride=m.stride_e[i],
                              padding=m.kernel_e[i] // 2, dtype=dt,
                              weight_init=m.init, name=f"enc{i}_conv")(e)
                e = rl.BatchNorm2d(cout, name=f"enc{i}_bn")(e, train=train)
                e = rl.relu(e)
            e = drop_conv(e, train=train)
            enc_out.append(e)

        # -- latent: flatten -> LSTM -> FC -> reshape ------------------------
        B, Fp, Tp, C = e.shape
        if m.lstm_time_major:
            # streaming order: sequence over (t, f) so chunk concatenation
            # along time == one continuous sequence
            if cx:
                seq = CArray(
                    jnp.transpose(e.re, (0, 2, 1, 3)).reshape(B, Tp * Fp, C),
                    jnp.transpose(e.im, (0, 2, 1, 3)).reshape(B, Tp * Fp, C))
            else:
                seq = jnp.transpose(e, (0, 2, 1, 3)).reshape(B, Tp * Fp, C)
        else:
            seq = e.reshape(B, Fp * Tp, C)  # same (f-major) ordering as
            # torch.flatten(e, 2, 3).permute(0, 2, 1) on NCHW (r_network.py:149)
        if cx:
            lstm_out, new_lstm_state = ComplexLSTM(
                m.lstm_hidden, m.lstm_layers, m.lstm_bidir, dtype=dt,
                name="lstm")(seq, lstm_state)
            fc_out = cl.ComplexLinear(m.fc_features, weight_init=m.init,
                                      dtype=dt, name="fc")(lstm_out)
            fc_out = drop_fc(fc_out, train=train)  # ungated (c_network.py:203)
        else:
            lstm_out, new_lstm_state = LSTM(
                m.lstm_hidden, m.lstm_layers, m.lstm_bidir, dtype=dt,
                name="lstm")(seq, lstm_state)
            fc_out = rl.Linear(m.fc_features, weight_init=m.init, dtype=dt,
                               name="fc")(lstm_out)
            if m.dropout:  # gated only in the real net (r_network.py:152)
                fc_out = drop_fc(fc_out, train=train)
        if m.lstm_time_major:
            if cx:
                d = CArray(
                    jnp.transpose(fc_out.re.reshape(B, Tp, Fp, C), (0, 2, 1, 3)),
                    jnp.transpose(fc_out.im.reshape(B, Tp, Fp, C), (0, 2, 1, 3)))
            else:
                d = jnp.transpose(fc_out.reshape(B, Tp, Fp, C), (0, 2, 1, 3))
        else:
            d = fc_out.reshape(B, Fp, Tp, C)

        # -- decoder ---------------------------------------------------------
        for i in range(m.n_layers):
            skip = enc_out[m.n_layers - i]
            skip_c = skip.shape[-1]
            if cx:
                if m.attention:
                    ca = att.ComplexChannelAttention(
                        skip_c, m.ca_reduction,
                        maxpool_is_avg=self.quirks.complex_maxpool_is_avg,
                        weight_init=m.init, dtype=dt, name=f"skip{i}_ca")(skip)
                    skip = cl.complex_mul_bcast(skip, ca)
                    sa = att.ComplexSpatialAttention(
                        m.sa_kernel, weight_init=m.init, dtype=dt,
                        name=f"skip{i}_sa")(skip)
                    skip = cl.complex_mul_bcast(skip, sa)
                parts = (d, skip)
            else:
                if m.attention:
                    ca = att.RealChannelAttention(
                        skip_c, m.ca_reduction,
                        max_only=self.quirks.real_ca_max_only,
                        weight_init=m.init, dtype=dt, name=f"skip{i}_ca")(skip)
                    skip = widen.mul_bcast(skip, ca)
                    sa = att.RealSpatialAttention(
                        m.sa_kernel, weight_init=m.init, dtype=dt,
                        name=f"skip{i}_sa")(skip)
                    skip = widen.mul_bcast(skip, sa)
                parts = (d, skip)

            _, cout = m.dec_channels(i)
            last = i == m.n_layers - 1
            # the skip concat and the nearest upsample are both fused into
            # the convT (conv_engine.upsampled_conv2d_multi): neither the
            # concatenated nor the upsampled tensor is materialized
            if cx:
                d = cl.ComplexConvTranspose2d(
                    cout, m.kernel_d[i], padding=m.kernel_d[i] // 2, dtype=dt,
                    weight_init=m.init, upsample=m.upsample[i],
                    name=f"dec{i}_convt")(parts)
                if not last:
                    d = cl.ComplexBatchNorm2d(cout, name=f"dec{i}_bn")(d, train=train)
                    d = cl.complex_leaky_relu(d)
                    if m.attention:
                        d = cl.complex_mul_bcast(d, att.ComplexChannelAttention(
                            cout, m.ca_reduction,
                            maxpool_is_avg=self.quirks.complex_maxpool_is_avg,
                            weight_init=m.init, dtype=dt, name=f"dec{i}_ca")(d))
                        d = cl.complex_mul_bcast(d, att.ComplexSpatialAttention(
                            m.sa_kernel, weight_init=m.init, dtype=dt,
                            name=f"dec{i}_sa")(d))
            else:
                d = rl.ConvTranspose2d(
                    cout, m.kernel_d[i], padding=m.kernel_d[i] // 2, dtype=dt,
                    weight_init=m.init, upsample=m.upsample[i],
                    name=f"dec{i}_convt")(parts)
                if not last:
                    d = rl.BatchNorm2d(cout, name=f"dec{i}_bn")(d, train=train)
                    d = rl.leaky_relu(d)
                    if m.attention:
                        d = widen.mul_bcast(d, att.RealChannelAttention(
                            cout, m.ca_reduction,
                            max_only=self.quirks.real_ca_max_only,
                            weight_init=m.init, dtype=dt, name=f"dec{i}_ca")(d))
                        d = widen.mul_bcast(d, att.RealSpatialAttention(
                            m.sa_kernel, weight_init=m.init, dtype=dt,
                            name=f"dec{i}_sa")(d))
            d = drop_conv(d, train=train)

        # -- output bound (r_network.py:172, c_network.py:225) ---------------
        # always in f32: atan2/tanh of the mask bound are precision-sensitive
        if cx:
            out = CArray(d.re[..., 0].astype(jnp.float32),
                         d.im[..., 0].astype(jnp.float32))
            out = masks.bound_crm(out, m.atan2_eps)
        else:
            out = d[..., 0].astype(jnp.float32)
            out = jnp.reciprocal(1.0 + jnp.exp(-out))
        if return_lstm_state:
            return out, new_lstm_state
        return out
