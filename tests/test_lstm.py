"""LSTM parity vs torch.nn.LSTM (gate order, bidir concat, layer stacking) and
the reference's 4-pass ComplexLSTM combination."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from dcs_net_tpu.ops.lstm import LSTM, ComplexLSTM
from dcs_net_tpu.utils.carray import CArray

KEY = jax.random.PRNGKey(0)


def _port_params(lstm_t: torch.nn.LSTM) -> dict:
    p = {}
    for layer in range(lstm_t.num_layers):
        for d in range(2 if lstm_t.bidirectional else 1):
            t_sfx = f"l{layer}" + ("_reverse" if d == 1 else "")
            p[f"w_ih_{t_sfx}"] = jnp.asarray(
                getattr(lstm_t, f"weight_ih_{t_sfx}").detach().numpy().T)
            p[f"w_hh_{t_sfx}"] = jnp.asarray(
                getattr(lstm_t, f"weight_hh_{t_sfx}").detach().numpy().T)
            p[f"b_ih_{t_sfx}"] = jnp.asarray(
                getattr(lstm_t, f"bias_ih_{t_sfx}").detach().numpy())
            p[f"b_hh_{t_sfx}"] = jnp.asarray(
                getattr(lstm_t, f"bias_hh_{t_sfx}").detach().numpy())
    return p


def test_lstm_unidir_single_layer():
    torch.manual_seed(0)
    lstm_t = torch.nn.LSTM(8, 5, num_layers=1, batch_first=True)
    x = torch.randn(3, 7, 8)
    ref, (h_t, c_t) = lstm_t(x)
    mod = LSTM(hidden_size=5, num_layers=1)
    out, (h, c) = mod.apply({"params": _port_params(lstm_t)}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_t.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), c_t.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_lstm_bidir_two_layer():
    torch.manual_seed(1)
    lstm_t = torch.nn.LSTM(6, 4, num_layers=2, bidirectional=True, batch_first=True)
    x = torch.randn(2, 9, 6)
    ref, (h_t, c_t) = lstm_t(x)
    mod = LSTM(hidden_size=4, num_layers=2, bidirectional=True)
    out, (h, c) = mod.apply({"params": _port_params(lstm_t)}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_t.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_lstm_initial_state_carry():
    """Splitting a sequence in half and carrying (h, c) equals one pass —
    the invariant the streaming enhancement path relies on."""
    torch.manual_seed(2)
    lstm_t = torch.nn.LSTM(5, 3, num_layers=2, batch_first=True)
    x = torch.randn(2, 10, 5)
    mod = LSTM(hidden_size=3, num_layers=2)
    params = {"params": _port_params(lstm_t)}
    xj = jnp.asarray(x.numpy())
    full, _ = mod.apply(params, xj)
    first, st = mod.apply(params, xj[:, :6])
    second, _ = mod.apply(params, xj[:, 6:], st)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([first, second], axis=1)),
        np.asarray(full), rtol=1e-4, atol=1e-5)


def test_complex_lstm_matches_reference_combination():
    """out_re = L_r(x_r) - L_i(x_i); out_im = L_r(x_i) + L_i(x_r)
    (/root/reference/c_network.py:38-43)."""
    torch.manual_seed(3)
    lstm_r = torch.nn.LSTM(6, 4, num_layers=2, bidirectional=True, batch_first=True)
    lstm_i = torch.nn.LSTM(6, 4, num_layers=2, bidirectional=True, batch_first=True)
    x_re, x_im = torch.randn(2, 5, 6), torch.randn(2, 5, 6)
    ref_re = lstm_r(x_re)[0] - lstm_i(x_im)[0]
    ref_im = lstm_r(x_im)[0] + lstm_i(x_re)[0]
    mod = ComplexLSTM(hidden_size=4, num_layers=2, bidirectional=True)
    params = {"params": {
        "real_lstm": _port_params(lstm_r),
        "imag_lstm": _port_params(lstm_i),
    }}
    out, _ = mod.apply(params, CArray(jnp.asarray(x_re.numpy()), jnp.asarray(x_im.numpy())))
    np.testing.assert_allclose(np.asarray(out.re), ref_re.detach().numpy(), rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.im), ref_im.detach().numpy(), rtol=1e-4, atol=5e-5)


def test_lstm_init_distribution():
    mod = LSTM(hidden_size=64, num_layers=1)
    v = mod.init(KEY, jnp.zeros((1, 4, 32)))
    w = np.asarray(v["params"]["w_ih_l0"])
    bound = 1 / np.sqrt(64)
    assert w.min() >= -bound and w.max() <= bound
    assert w.std() > bound / 3  # roughly uniform, not degenerate
