"""Multi-layer bidirectional LSTM as `lax.scan`, with torch-exact cell math.

The reference's latent bottleneck is a 2-layer bidirectional torch LSTM over
64 timesteps (/root/reference/r_network.py:70-74), and the complex variant runs
two such LSTMs combined as (L_r + i L_i)(x_r + i x_i)
(/root/reference/c_network.py:12-51).

TPU-first structure:
  * the input projection x @ W_ih^T + b for ALL timesteps is hoisted out of
    the recurrence into one large MXU matmul;
  * the scan body contains only the (B, H) @ (H, 4H) recurrent matmul and the
    gate nonlinearities — the minimal serial work;
  * the complex LSTM batches (x_re, x_im) on the batch axis so each of the two
    real LSTMs runs ONCE on a 2B batch (2 scans total instead of the
    reference's 4 sequential LSTM invocations).

Parameter naming/shape maps 1:1 onto torch's
``weight_ih_l{k}[_reverse]`` etc., stored transposed for right-matmul:
w_ih: (in, 4H), w_hh: (H, 4H), gate order (i, f, g, o).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dcs_net_tpu.ops.initializers import lstm_uniform
from dcs_net_tpu.utils.carray import CArray

State = Tuple[jnp.ndarray, jnp.ndarray]  # (h, c) each (num_layers*D, B, H)


def _mm(a: jnp.ndarray, b: jnp.ndarray, dt: jnp.dtype) -> jnp.ndarray:
    """Last-dim matmul with operands cast to dt, result back in f32.

    Output cast (not preferred_element_type) so the VJP stays single-dtype;
    the MXU accumulates in f32 internally either way."""
    return jax.lax.dot_general(
        a.astype(dt), b.astype(dt),
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
    ).astype(jnp.float32)


def _lstm_scan_multi(xp: jnp.ndarray, w_hh: jnp.ndarray, h0: jnp.ndarray,
                     c0: jnp.ndarray,
                     dt: jnp.dtype = jnp.float32) -> Tuple[jnp.ndarray, State]:
    """ONE scan over D direction-heads at once.

    xp: (T, D, B, 4H) precomputed input projections — the reverse head's
    sequence pre-flipped so every head scans forward; w_hh: (D, H, 4H);
    h0/c0: (D, B, H). Returns ((T, D, B, H), (h, c)).

    Batching the directions into a single while-loop halves the serial scan
    count (the device profile showed ~2 ms/step of while overhead across 8+
    separate scans) and feeds the MXU a D-batched recurrent matmul instead
    of D tiny ones.
    """
    w_hh = w_hh.astype(dt)

    def step(carry, xt):
        h, c = carry
        # (D, B, H) x (D, H, 4H) batched over the head axis
        rec = jax.lax.dot_general(
            h.astype(dt), w_hh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        ).astype(jnp.float32)
        gates = xt + rec
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    # unroll: the T=64 recurrence's per-iteration work is tiny, so the while
    # loop's bookkeeping dominates (profiled ~0.3-0.4 ms per scan, 4 scans per
    # step incl. AD transposes). 8 body copies per iteration cut that ~8x;
    # the transposed (backward) scan inherits the same unroll. TPU-only:
    # on CPU the 8x body duplication just bloats test compile times.
    # 8, not 16: the round-4 batch-128 profile measured the while self-time
    # GROWING 4.0 -> 6.0 ms/step at unroll 16 (bigger bodies pipeline worse)
    unroll = 8 if jax.default_backend() == "tpu" else 1
    (h_f, c_f), hs = jax.lax.scan(step, (h0, c0), xp, unroll=unroll)
    return hs, (h_f, c_f)


class LSTM(nn.Module):
    """torch.nn.LSTM(batch_first=True) semantics."""

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dtype: jnp.dtype = jnp.float32  # matmul operand dtype (f32 accumulate)

    @property
    def num_directions(self) -> int:
        return 2 if self.bidirectional else 1

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, state: Optional[State] = None
    ) -> Tuple[jnp.ndarray, State]:
        """x: (B, T, F) -> (out (B, T, H*D), (h, c) each (L*D, B, H))."""
        B, T, _ = x.shape
        H, D = self.hidden_size, self.num_directions
        u = lstm_uniform(H)
        # recurrent state is always f32 (gate math runs in f32)
        if state is None:
            h0 = jnp.zeros((self.num_layers * D, B, H), jnp.float32)
            c0 = jnp.zeros_like(h0)
        else:
            h0, c0 = state
            h0 = h0.astype(jnp.float32)
            c0 = c0.astype(jnp.float32)

        layer_in = x
        h_out, c_out = [], []
        for layer in range(self.num_layers):
            in_features = layer_in.shape[-1]
            ws_ih, ws_hh, bs = [], [], []
            for d in range(D):
                sfx = f"l{layer}" + ("_reverse" if d == 1 else "")
                ws_ih.append(self.param(f"w_ih_{sfx}", u, (in_features, 4 * H)))
                ws_hh.append(self.param(f"w_hh_{sfx}", u, (H, 4 * H)))
                bs.append(self.param(f"b_ih_{sfx}", u, (4 * H,))
                          + self.param(f"b_hh_{sfx}", u, (4 * H,)))
            # ONE MXU matmul for all timesteps and both directions:
            # (B, T, in) @ (in, D*4H)
            xp = _mm(layer_in, jnp.concatenate(ws_ih, axis=1), self.dtype)
            xp = xp.reshape(B, T, D, 4 * H) + jnp.stack(bs)
            xp = jnp.transpose(xp, (1, 2, 0, 3))          # (T, D, B, 4H)
            if D == 2:  # reverse head scans its sequence back-to-front
                xp = jnp.stack([xp[:, 0], jnp.flip(xp[:, 1], axis=0)], axis=1)
            hs, (h_f, c_f) = _lstm_scan_multi(
                xp, jnp.stack(ws_hh),
                h0[layer * D:(layer + 1) * D], c0[layer * D:(layer + 1) * D],
                dt=self.dtype)                             # hs (T, D, B, H)
            fwd = jnp.transpose(hs[:, 0], (1, 0, 2))       # (B, T, H)
            if D == 2:
                rev = jnp.transpose(jnp.flip(hs[:, 1], axis=0), (1, 0, 2))
                layer_in = jnp.concatenate([fwd, rev], axis=-1)
            else:
                layer_in = fwd
            h_out.extend(h_f)
            c_out.extend(c_f)
        # gate math runs in f32 (stability); hand back the caller's dtype
        return layer_in.astype(x.dtype), (jnp.stack(h_out), jnp.stack(c_out))


class _LSTMParams(nn.Module):
    """Declares one torch-layout LSTM's parameters (w_ih_l{k}[_reverse] ...)
    under this module's name scope and returns them — lets ComplexLSTM keep
    the checkpoint-compatible real_lstm/imag_lstm param tree while executing
    both LSTMs inside ONE joint scan."""

    hidden_size: int
    num_layers: int
    bidirectional: bool

    @nn.compact
    def __call__(self, in_features_first: int):
        H = self.hidden_size
        D = 2 if self.bidirectional else 1
        u = lstm_uniform(H)
        out = []
        for layer in range(self.num_layers):
            fin = in_features_first if layer == 0 else H * D
            per_dir = []
            for d in range(D):
                sfx = f"l{layer}" + ("_reverse" if d == 1 else "")
                per_dir.append((
                    self.param(f"w_ih_{sfx}", u, (fin, 4 * H)),
                    self.param(f"w_hh_{sfx}", u, (H, 4 * H)),
                    self.param(f"b_ih_{sfx}", u, (4 * H,))
                    + self.param(f"b_hh_{sfx}", u, (4 * H,))))
            out.append(per_dir)
        return out


class ComplexLSTM(nn.Module):
    """The reference ComplexLSTM (/root/reference/c_network.py:12-51):
    out = (L_r(x_r) - L_i(x_i)) + i (L_r(x_i) + L_i(x_r)).

    Execution is ONE lax.scan per layer covering all four heads
    (real/imag LSTM x fwd/rev direction) on the 2B-stacked (x_r, x_i) batch:
    the serial while-loop count drops 4x vs running the sub-LSTMs separately
    and the recurrent matmul feeds the MXU a 4-head batch. The optional
    ``state`` carries both LSTMs' states on the stacked batch (used by the
    streaming enhancement path); param tree and numerics are identical to two
    independent LSTM modules named real_lstm / imag_lstm."""

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: CArray,
        state: Optional[Tuple[State, State]] = None,
    ) -> Tuple[CArray, Tuple[State, State]]:
        stacked = jnp.concatenate([x.re, x.im], axis=0)  # (2B, T, F)
        B2, T, F = stacked.shape
        H, L = self.hidden_size, self.num_layers
        D = 2 if self.bidirectional else 1
        pr = _LSTMParams(H, L, self.bidirectional, name="real_lstm")(F)
        pi = _LSTMParams(H, L, self.bidirectional, name="imag_lstm")(F)

        def init_state(s):
            if s is None:
                z = jnp.zeros((L * D, B2, H), jnp.float32)
                return z, jnp.zeros_like(z)
            return s[0].astype(jnp.float32), s[1].astype(jnp.float32)

        h0r, c0r = init_state(None if state is None else state[0])
        h0i, c0i = init_state(None if state is None else state[1])

        in_r = in_i = stacked
        hr_out, cr_out, hi_out, ci_out = [], [], [], []
        for layer in range(L):
            # heads: [r x dirs..., i x dirs...] — each head's input projection
            # from its own source, all heads in one scan
            xps, whhs = [], []
            for params, src in ((pr[layer], in_r), (pi[layer], in_i)):
                for d, (w_ih, w_hh, b) in enumerate(params):
                    xp = _mm(src, w_ih, self.dtype) + b   # (2B, T, 4H)
                    xp = jnp.swapaxes(xp, 0, 1)           # (T, 2B, 4H)
                    if d == 1:
                        xp = jnp.flip(xp, axis=0)
                    xps.append(xp)
                    whhs.append(w_hh)
            h0 = jnp.concatenate([h0r[layer * D:(layer + 1) * D],
                                  h0i[layer * D:(layer + 1) * D]], axis=0)
            c0 = jnp.concatenate([c0r[layer * D:(layer + 1) * D],
                                  c0i[layer * D:(layer + 1) * D]], axis=0)
            hs, (h_f, c_f) = _lstm_scan_multi(
                jnp.stack(xps, axis=1), jnp.stack(whhs), h0, c0,
                dt=self.dtype)                             # hs (T, 2D, 2B, H)

            def head_out(g):
                fwd = jnp.transpose(hs[:, g * D], (1, 0, 2))
                if D == 2:
                    rev = jnp.transpose(jnp.flip(hs[:, g * D + 1], 0), (1, 0, 2))
                    return jnp.concatenate([fwd, rev], axis=-1)
                return fwd

            in_r, in_i = head_out(0), head_out(1)
            hr_out.extend(h_f[:D]); cr_out.extend(c_f[:D])
            hi_out.extend(h_f[D:]); ci_out.extend(c_f[D:])

        out_r = in_r.astype(x.re.dtype)
        out_i = in_i.astype(x.re.dtype)
        B = x.re.shape[0]
        r2r, r2i = out_r[:B], out_r[B:]
        i2r, i2i = out_i[:B], out_i[B:]
        sr2 = (jnp.stack(hr_out), jnp.stack(cr_out))
        si2 = (jnp.stack(hi_out), jnp.stack(ci_out))
        return CArray(r2r - i2i, r2i + i2r), (sr2, si2)
