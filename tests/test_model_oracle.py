"""END-TO-END torch oracle: the composed full-size R_NETWORK forward/backward
(/root/reference/r_network.py:43-173) rebuilt in torch (CPU), weights ported
into the flax DCSNet layout, asserting

  * eval-mode forward parity (composed mask allclose),
  * train-mode forward parity incl. BatchNorm batch statistics,
  * gradient parity of a composed loss through the whole network,
  * one-Adam(amsgrad)-step parity of every parameter.

This covers the composition order the per-layer tests can't see: flatten
ordering into the LSTM (r_network.py:149), attention placement (:157-169),
upsample-before-convT (:164-166), and the final squeeze+sigmoid bound (:172).
The oracle network below is an independent reconstruction from the reference's
topology (full-size hparams, /root/reference/config.py:31-53) — not a copy.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.models.unet import DCSNet

B, F, T = 2, 256, 64
CH = (1, 16, 32, 64, 128, 256, 256, 256)
KE = (7, 7, 5, 5, 3, 3, 3)
KD = (3, 3, 3, 3, 3, 3, 3)
STRIDE_E = ((2, 2), (2, 2), (2, 2), (2, 1), (2, 1), (2, 1), (2, 1))
UPSAMPLE = ((2, 1), (2, 1), (2, 1), (2, 1), (2, 2), (2, 2), (2, 2))
N_LAYERS = 7
CA_RED = 16
SA_K = 7


class TorchChannelAttention(torch.nn.Module):
    """r_network.py:8-25 incl. the `out = max_out_fc` quirk (line 24)."""

    def __init__(self, c, reduction):
        super().__init__()
        h = max(c // reduction, 1)
        self.fc1 = torch.nn.Conv2d(c, h, 1, bias=False)
        self.fc2 = torch.nn.Conv2d(h, c, 1, bias=False)

    def forward(self, x):
        mx = torch.amax(x, dim=(2, 3), keepdim=True)
        return torch.sigmoid(self.fc2(torch.relu(self.fc1(mx))))


class TorchSpatialAttention(torch.nn.Module):
    """r_network.py:28-40."""

    def __init__(self, k):
        super().__init__()
        self.conv = torch.nn.Conv2d(2, 1, k, padding=k // 2, bias=False)

    def forward(self, x):
        cat = torch.cat([x.mean(dim=1, keepdim=True),
                         x.amax(dim=1, keepdim=True)], dim=1)
        return torch.sigmoid(self.conv(cat))


class TorchRNet(torch.nn.Module):
    """R_NETWORK topology (r_network.py:43-173) with dropout omitted (the
    parity runs are deterministic; dropout sites are asserted structurally in
    the flax model via config)."""

    def __init__(self):
        super().__init__()
        self.initial_bn = torch.nn.BatchNorm2d(1)
        self.enc = torch.nn.ModuleList()
        for i in range(N_LAYERS):
            self.enc.append(torch.nn.Sequential(
                torch.nn.Conv2d(1 if i == 0 else CH[i], CH[i + 1], KE[i],
                                stride=STRIDE_E[i], padding=KE[i] // 2),
                torch.nn.BatchNorm2d(CH[i + 1]),
                torch.nn.ReLU()))
        self.lstm = torch.nn.LSTM(input_size=CH[5], hidden_size=CH[4],
                                  num_layers=2, bidirectional=True,
                                  batch_first=True)
        self.fc = torch.nn.Linear(CH[5], CH[5])
        self.dec = torch.nn.ModuleList()
        self.skip_ca = torch.nn.ModuleList()
        self.skip_sa = torch.nn.ModuleList()
        self.dec_ca = torch.nn.ModuleList()
        self.dec_sa = torch.nn.ModuleList()
        for i in range(N_LAYERS):
            cin = CH[N_LAYERS - i]
            cout = max(CH[N_LAYERS - 1 - i], 1)
            convt = torch.nn.ConvTranspose2d(2 * cin, cout, KD[i], stride=1,
                                             padding=KD[i] // 2)
            last = i == N_LAYERS - 1
            self.dec.append(convt if last else torch.nn.Sequential(
                convt, torch.nn.BatchNorm2d(cout), torch.nn.LeakyReLU()))
            self.skip_ca.append(TorchChannelAttention(cin, CA_RED))
            self.skip_sa.append(TorchSpatialAttention(SA_K))
            if not last:
                self.dec_ca.append(TorchChannelAttention(cout, CA_RED))
                self.dec_sa.append(TorchSpatialAttention(SA_K))
        for m in self.modules():  # weights_init (r_network.py:124-134)
            if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d,
                              torch.nn.Linear)):
                torch.nn.init.xavier_uniform_(m.weight)

    def forward(self, x):  # x (B, F, T)
        enc_out = [self.initial_bn(x[:, None])]
        for i in range(N_LAYERS):
            enc_out.append(self.enc[i](enc_out[i]))
        e = enc_out[-1]
        bsz, c, fp, tp = e.shape
        seq = torch.flatten(e, 2, 3).permute(0, 2, 1)  # (B, Fp*Tp, C)
        lstm_out, _ = self.lstm(seq)
        d = self.fc(lstm_out).permute(0, 2, 1).reshape(bsz, c, fp, tp)
        for i in range(N_LAYERS):
            skip = enc_out[N_LAYERS - i]
            skip = self.skip_ca[i](skip) * skip
            skip = self.skip_sa[i](skip) * skip
            d = torch.cat((d, skip), dim=1)
            d = torch.nn.functional.interpolate(
                d, scale_factor=UPSAMPLE[i], mode="nearest")
            d = self.dec[i](d)
            if i != N_LAYERS - 1:
                d = d * self.dec_ca[i](d)
                d = d * self.dec_sa[i](d)
        return torch.sigmoid(d[:, 0])


def _t2j(t: torch.Tensor) -> jnp.ndarray:
    # .copy() matters: jnp.asarray over .numpy() aliases torch's buffer on
    # CPU, so torch's IN-PLACE running-stat updates would silently rewrite the
    # ported flax batch_stats after the fact.
    return jnp.asarray(t.detach().numpy().copy())


def _conv_w(m):  # torch OIHW -> flax HWIO
    return _t2j(m.weight.permute(2, 3, 1, 0))


def _convt_w(m):  # torch ConvTranspose IOHW -> flax HWIO (rl.ConvTranspose2d)
    return _t2j(m.weight.permute(2, 3, 0, 1))


def _bn(m):
    return ({"scale": _t2j(m.weight), "bias": _t2j(m.bias)},
            {"mean": _t2j(m.running_mean), "var": _t2j(m.running_var)})


def _lstm(m):
    p = {}
    for layer in range(m.num_layers):
        for sfx in ([f"l{layer}", f"l{layer}_reverse"] if m.bidirectional
                    else [f"l{layer}"]):
            p[f"w_ih_{sfx}"] = _t2j(getattr(m, f"weight_ih_{sfx}").T)
            p[f"w_hh_{sfx}"] = _t2j(getattr(m, f"weight_hh_{sfx}").T)
            p[f"b_ih_{sfx}"] = _t2j(getattr(m, f"bias_ih_{sfx}"))
            p[f"b_hh_{sfx}"] = _t2j(getattr(m, f"bias_hh_{sfx}"))
    return p


def port_weights(net: TorchRNet):
    params, stats = {}, {}
    params["initial_bn"], stats["initial_bn"] = _bn(net.initial_bn)
    for i in range(N_LAYERS):
        conv, bn = net.enc[i][0], net.enc[i][1]
        params[f"enc{i}_conv"] = {"kernel": _conv_w(conv),
                                  "bias": _t2j(conv.bias)}
        params[f"enc{i}_bn"], stats[f"enc{i}_bn"] = _bn(bn)
    params["lstm"] = _lstm(net.lstm)
    params["fc"] = {"kernel": _t2j(net.fc.weight.T), "bias": _t2j(net.fc.bias)}
    for i in range(N_LAYERS):
        last = i == N_LAYERS - 1
        convt = net.dec[i] if last else net.dec[i][0]
        params[f"dec{i}_convt"] = {"kernel": _convt_w(convt),
                                   "bias": _t2j(convt.bias)}
        if not last:
            params[f"dec{i}_bn"], stats[f"dec{i}_bn"] = _bn(net.dec[i][1])
            params[f"dec{i}_ca"] = {"fc1": {"kernel": _conv_w(net.dec_ca[i].fc1)},
                                    "fc2": {"kernel": _conv_w(net.dec_ca[i].fc2)}}
            params[f"dec{i}_sa"] = {"conv": {"kernel": _conv_w(net.dec_sa[i].conv)}}
        params[f"skip{i}_ca"] = {"fc1": {"kernel": _conv_w(net.skip_ca[i].fc1)},
                                 "fc2": {"kernel": _conv_w(net.skip_ca[i].fc2)}}
        params[f"skip{i}_sa"] = {"conv": {"kernel": _conv_w(net.skip_sa[i].conv)}}
    return params, stats


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    net = TorchRNet().eval()
    cfg = config_for_variant("drs")
    cfg = cfg.replace(model=cfg.model.__class__(
        complex_valued=False, subtractive=True,
        dropout=False, dropout_conv=0.0, dropout_fc=0.0))
    model = DCSNet(cfg.model, cfg.quirks)
    params, stats = port_weights(net)
    variables = {"params": params, "batch_stats": stats}
    x_t = torch.randn(B, F, T, generator=torch.Generator().manual_seed(7))
    return net, model, variables, x_t


def test_composed_forward_eval(oracle):
    net, model, variables, x_t = oracle
    with torch.no_grad():
        ref = net(x_t).numpy()
    ours = model.apply(variables, _t2j(x_t), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=2e-4)


def test_composed_forward_train_and_batch_stats(oracle):
    net, model, variables, x_t = oracle
    net.train()
    try:
        with torch.no_grad():
            ref = net(x_t).numpy()
    finally:
        net.eval()
    ours, updated = model.apply(variables, _t2j(x_t), train=True,
                                mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=2e-4)
    # torch updated its running stats in-place during the train pass above;
    # compare against ours (momentum 0.1, unbiased-var convention)
    for i in range(N_LAYERS):
        got = updated["batch_stats"][f"enc{i}_bn"]
        np.testing.assert_allclose(
            np.asarray(got["mean"]), net.enc[i][1].running_mean.numpy(),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got["var"]), net.enc[i][1].running_var.numpy(),
            rtol=1e-4, atol=1e-5)


def test_composed_gradients_and_adam_step(oracle):
    """Gradient + one Adam(amsgrad) step parity through the COMPOSED network
    (hparams lr/eps/wd/amsgrad, /root/reference/config.py:31-53).

    Eval mode on both sides: batch-stat mutation inside value_and_grad is a
    separate concern (covered by the train-forward test above); here the
    comparison isolates the backward graph."""
    net, model, variables, x_t = oracle
    # re-port batch_stats: the train-forward test above mutated torch's
    # running stats in place, and eval mode reads them — both sides must see
    # the same values regardless of test execution order
    _, stats_now = port_weights(net)
    variables = {"params": variables["params"], "batch_stats": stats_now}
    tgt_t = torch.rand(B, F, T, generator=torch.Generator().manual_seed(9))
    tgt = _t2j(tgt_t)

    opt = torch.optim.Adam(net.parameters(), lr=1e-4, eps=1e-6,
                           weight_decay=1e-4, amsgrad=True)
    opt.zero_grad()
    loss_t = torch.mean((net(x_t) - tgt_t) ** 2)
    loss_t.backward()

    def loss_fn(params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          _t2j(x_t), train=False)
        return jnp.mean((out - tgt) ** 2)

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-3)

    # spot-check gradient parity on representative leaves end-to-end
    checks = [
        ("enc0_conv", "kernel", net.enc[0][0].weight, lambda w: w.permute(2, 3, 1, 0)),
        ("dec6_convt", "kernel", net.dec[6].weight, lambda w: w.permute(2, 3, 0, 1)),
        ("fc", "kernel", net.fc.weight, lambda w: w.T),
        ("lstm", "w_ih_l0", net.lstm.weight_ih_l0, lambda w: w.T),
        ("skip0_ca", ("fc2", "kernel"), net.skip_ca[0].fc2.weight,
         lambda w: w.permute(2, 3, 1, 0)),
    ]
    for name, key, w_t, conv in checks:
        g_ref = conv(w_t.grad).numpy()
        g = grads[name][key[0]][key[1]] if isinstance(key, tuple) else grads[name][key]
        scale = max(np.abs(g_ref).max(), 1e-12)
        np.testing.assert_allclose(np.asarray(g) / scale, g_ref / scale,
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"grad mismatch at {name}")

    # one optimizer step on both sides; torch Adam couples weight_decay into
    # the gradient (decoupled=False), as does train/optim.py
    opt.step()
    from dcs_net_tpu.train.optim import make_optimizer

    cfg = config_for_variant("drs")
    tx = make_optimizer(cfg.optim)
    state = tx.init(variables["params"])
    updates, _ = tx.update(grads, state, variables["params"])
    new_params = jax.tree.map(lambda p, u: p + u, variables["params"], updates)

    ref_params, _ = port_weights(net)  # re-port AFTER the torch step
    flat_new = jax.tree_util.tree_flatten_with_path(new_params)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_params)[0])
    flat_g = dict(jax.tree_util.tree_flatten_with_path(grads)[0])
    # Element-wise bound accounting for Adam's first-step sensitivity
    # (|du/dg| <= 1/(|g|+eps) for u = g/(|g|+eps)): a verified gradient
    # agreement of delta can move the post-step parameter by up to
    # lr*min(2, delta/(|g|+eps)) — ~2*lr on cancellation-residue elements
    # (|g| ~ eps, where the engine's dot reformulations reorder sums vs
    # torch), ~3e-5-tight where the gradient is meaningful.
    lr, eps_adam = 1e-4, 1e-6
    moved = 0.0
    for path, val in flat_new:
        g = np.abs(np.asarray(flat_g[path]))
        delta = 1e-3 * g + 1e-4 * max(float(g.max()), 1e-12)
        allowed = 3e-5 + lr * np.minimum(2.0, delta / (g + eps_adam))
        diff = np.abs(np.asarray(val - flat_ref[path]))
        moved = max(moved, float(diff.max()))
        worst = float((diff - allowed).max())
        assert worst <= 0.0, (f"post-Adam param mismatch at "
                              f"{jax.tree_util.keystr(path)}: exceeds the "
                              f"sensitivity bound by {worst}")
    assert moved > 0.0  # the step actually moved parameters
