"""Numerical parity of real/complex layers vs torch (NHWC <-> NCHW converted).

Oracle construction: torch modules with weights copied into the flax layout;
complex ops verified against the (f_r, f_i) combination formula of
complexPyTorch (SURVEY.md §2.5) built from two torch real modules.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dcs_net_tpu.ops import complex_layers as cl
from dcs_net_tpu.ops import real_layers as rl
from dcs_net_tpu.utils.carray import CArray

KEY = jax.random.PRNGKey(0)


def _nhwc(x_t: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x_t.detach().numpy().transpose(0, 2, 3, 1))


def _nchw(y: jnp.ndarray) -> np.ndarray:
    return np.asarray(y).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("k,stride,pad", [(7, (2, 2), 3), (5, (2, 1), 2), (3, (2, 1), 1)])
def test_conv2d_matches_torch(rng, k, stride, pad):
    x_t = torch.randn(2, 3, 32, 32)
    conv_t = torch.nn.Conv2d(3, 5, k, stride=stride, padding=pad)
    mod = rl.Conv2d(features=5, kernel_size=k, stride=stride, padding=pad)
    params = mod.init(KEY, _nhwc(x_t))
    params = {"params": {
        "kernel": jnp.asarray(conv_t.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(conv_t.bias.detach().numpy()),
    }}
    ours = mod.apply(params, _nhwc(x_t))
    ref = conv_t(x_t).detach().numpy()
    np.testing.assert_allclose(_nchw(ours), ref, rtol=1e-4, atol=1e-5)


def test_conv_transpose2d_matches_torch(rng):
    x_t = torch.randn(2, 4, 16, 16)
    conv_t = torch.nn.ConvTranspose2d(4, 3, 3, stride=1, padding=1)
    mod = rl.ConvTranspose2d(features=3, kernel_size=3, stride=(1, 1), padding=1)
    params = {"params": {
        "kernel": jnp.asarray(conv_t.weight.detach().numpy().transpose(2, 3, 0, 1)),
        "bias": jnp.asarray(conv_t.bias.detach().numpy()),
    }}
    ours = mod.apply(params, _nhwc(x_t))
    ref = conv_t(x_t).detach().numpy()
    np.testing.assert_allclose(_nchw(ours), ref, rtol=1e-4, atol=1e-5)


def test_linear_matches_torch(rng):
    x_t = torch.randn(4, 7)
    lin_t = torch.nn.Linear(7, 5)
    mod = rl.Linear(features=5)
    params = {"params": {
        "kernel": jnp.asarray(lin_t.weight.detach().numpy().T),
        "bias": jnp.asarray(lin_t.bias.detach().numpy()),
    }}
    ours = mod.apply(params, jnp.asarray(x_t.numpy()))
    np.testing.assert_allclose(np.asarray(ours), lin_t(x_t).detach().numpy(),
                               rtol=1e-4, atol=1e-6)


def test_batchnorm2d_train_and_eval_match_torch():
    torch.manual_seed(1)
    x_t = torch.randn(4, 3, 8, 8)
    bn_t = torch.nn.BatchNorm2d(3)
    bn_t.weight.data.uniform_(0.5, 1.5)
    bn_t.bias.data.uniform_(-0.5, 0.5)
    mod = rl.BatchNorm2d(features=3)
    variables = {
        "params": {"scale": jnp.asarray(bn_t.weight.detach().numpy()),
                   "bias": jnp.asarray(bn_t.bias.detach().numpy())},
        "batch_stats": {"mean": jnp.zeros(3), "var": jnp.ones(3)},
    }
    bn_t.train()
    ref = bn_t(x_t).detach().numpy()
    ours, updated = mod.apply(variables, _nhwc(x_t), train=True,
                              mutable=["batch_stats"])
    np.testing.assert_allclose(_nchw(ours), ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(updated["batch_stats"]["mean"]),
                               bn_t.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(updated["batch_stats"]["var"]),
                               bn_t.running_var.numpy(), rtol=1e-4, atol=1e-6)
    # eval mode with the updated stats
    bn_t.eval()
    ref_e = bn_t(x_t).detach().numpy()
    ours_e = mod.apply({"params": variables["params"],
                        "batch_stats": updated["batch_stats"]},
                       _nhwc(x_t), train=False)
    np.testing.assert_allclose(_nchw(ours_e), ref_e, rtol=1e-4, atol=1e-5)


def _complex_from_torch_pair(fr, fi, x_re, x_im):
    """apply_complex: (fr(xr) - fi(xi)) + i (fr(xi) + fi(xr))."""
    out_re = fr(x_re) - fi(x_im)
    out_im = fr(x_im) + fi(x_re)
    return out_re.detach().numpy(), out_im.detach().numpy()


def test_complex_conv2d_matches_pair_formula():
    torch.manual_seed(2)
    x_re, x_im = torch.randn(2, 3, 16, 16), torch.randn(2, 3, 16, 16)
    conv_r = torch.nn.Conv2d(3, 4, 5, stride=(2, 2), padding=2)
    conv_i = torch.nn.Conv2d(3, 4, 5, stride=(2, 2), padding=2)
    ref_re, ref_im = _complex_from_torch_pair(conv_r, conv_i, x_re, x_im)
    mod = cl.ComplexConv2d(features=4, kernel_size=5, stride=(2, 2), padding=2)
    params = {"params": {
        "kernel_r": jnp.asarray(conv_r.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "kernel_i": jnp.asarray(conv_i.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias_r": jnp.asarray(conv_r.bias.detach().numpy()),
        "bias_i": jnp.asarray(conv_i.bias.detach().numpy()),
    }}
    x = CArray(_nhwc(x_re), _nhwc(x_im))
    ours = mod.apply(params, x)
    np.testing.assert_allclose(_nchw(ours.re), ref_re, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_nchw(ours.im), ref_im, rtol=1e-4, atol=1e-5)


def test_complex_conv_transpose2d_matches_pair_formula():
    torch.manual_seed(3)
    x_re, x_im = torch.randn(1, 4, 8, 8), torch.randn(1, 4, 8, 8)
    ct_r = torch.nn.ConvTranspose2d(4, 2, 3, stride=1, padding=1)
    ct_i = torch.nn.ConvTranspose2d(4, 2, 3, stride=1, padding=1)
    ref_re, ref_im = _complex_from_torch_pair(ct_r, ct_i, x_re, x_im)
    mod = cl.ComplexConvTranspose2d(features=2, kernel_size=3, padding=1)
    params = {"params": {
        "kernel_r": jnp.asarray(ct_r.weight.detach().numpy().transpose(2, 3, 0, 1)),
        "kernel_i": jnp.asarray(ct_i.weight.detach().numpy().transpose(2, 3, 0, 1)),
        "bias_r": jnp.asarray(ct_r.bias.detach().numpy()),
        "bias_i": jnp.asarray(ct_i.bias.detach().numpy()),
    }}
    ours = mod.apply(params, CArray(_nhwc(x_re), _nhwc(x_im)))
    np.testing.assert_allclose(_nchw(ours.re), ref_re, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_nchw(ours.im), ref_im, rtol=1e-4, atol=1e-5)


def test_complex_linear_matches_pair_formula():
    torch.manual_seed(4)
    x_re, x_im = torch.randn(3, 6), torch.randn(3, 6)
    lin_r, lin_i = torch.nn.Linear(6, 5), torch.nn.Linear(6, 5)
    ref_re, ref_im = _complex_from_torch_pair(lin_r, lin_i, x_re, x_im)
    mod = cl.ComplexLinear(features=5)
    params = {"params": {
        "kernel_r": jnp.asarray(lin_r.weight.detach().numpy().T),
        "kernel_i": jnp.asarray(lin_i.weight.detach().numpy().T),
        "bias_r": jnp.asarray(lin_r.bias.detach().numpy()),
        "bias_i": jnp.asarray(lin_i.bias.detach().numpy()),
    }}
    ours = mod.apply(params, CArray(jnp.asarray(x_re.numpy()), jnp.asarray(x_im.numpy())))
    np.testing.assert_allclose(np.asarray(ours.re), ref_re, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.im), ref_im, rtol=1e-4, atol=1e-5)


def test_complex_batchnorm_whitens():
    """Property test: train-mode output has identity 2x2 covariance per channel
    before Gamma/beta (so with Gamma=I it whitens; with the 1/sqrt(2) init the
    total modulus variance is ~1)."""
    rng = np.random.default_rng(5)
    re = rng.standard_normal((8, 6, 6, 3)).astype(np.float32) * 2 + 1
    im = (0.5 * re + rng.standard_normal((8, 6, 6, 3)).astype(np.float32))
    x = CArray(jnp.asarray(re), jnp.asarray(im))
    mod = cl.ComplexBatchNorm2d(features=3)
    variables = mod.init(KEY, x, train=True)
    # Gamma = identity to observe the whitened signal directly
    params = dict(variables["params"])
    params["gamma_rr"] = jnp.ones(3)
    params["gamma_ii"] = jnp.ones(3)
    out, _ = mod.apply({"params": params, "batch_stats": variables["batch_stats"]},
                       x, train=True, mutable=["batch_stats"])
    o_re, o_im = np.asarray(out.re), np.asarray(out.im)
    for c in range(3):
        r, i = o_re[..., c].ravel(), o_im[..., c].ravel()
        np.testing.assert_allclose(r.mean(), 0, atol=1e-5)
        np.testing.assert_allclose(i.mean(), 0, atol=1e-5)
        np.testing.assert_allclose(r.var(), 1, atol=2e-2)
        np.testing.assert_allclose(i.var(), 1, atol=2e-2)
        np.testing.assert_allclose(np.mean(r * i), 0, atol=2e-2)
    # default init (1/sqrt(2)) → modulus variance ~1
    out2, _ = mod.apply(variables, x, train=True, mutable=["batch_stats"])
    mod_var = np.asarray(out2.re) ** 2 + np.asarray(out2.im) ** 2
    np.testing.assert_allclose(mod_var.mean(), 1.0, atol=5e-2)


def test_complex_batchnorm_eval_uses_running_stats():
    rng = np.random.default_rng(6)
    x = CArray(jnp.asarray(rng.standard_normal((4, 4, 4, 2)).astype(np.float32)),
               jnp.asarray(rng.standard_normal((4, 4, 4, 2)).astype(np.float32)))
    mod = cl.ComplexBatchNorm2d(features=2)
    variables = mod.init(KEY, x, train=True)
    # run a few train steps to move running stats
    stats = variables["batch_stats"]
    for _ in range(3):
        _, upd = mod.apply({"params": variables["params"], "batch_stats": stats},
                           x, train=True, mutable=["batch_stats"])
        stats = upd["batch_stats"]
    out_eval = mod.apply({"params": variables["params"], "batch_stats": stats},
                         x, train=False)
    assert np.all(np.isfinite(np.asarray(out_eval.re)))
    # eval out with moved stats differs from init-stats eval
    out_eval0 = mod.apply(variables, x, train=False)
    assert float(jnp.abs(out_eval.re - out_eval0.re).max()) > 1e-6


def test_activations_and_pools():
    x = CArray(jnp.asarray([[-1.0, 2.0]]), jnp.asarray([[3.0, -4.0]]))
    r = cl.complex_leaky_relu(x)
    np.testing.assert_allclose(np.asarray(r.re), [[-0.01, 2.0]])
    np.testing.assert_allclose(np.asarray(r.im), [[3.0, -0.04]])
    s = cl.complex_sigmoid(x)
    np.testing.assert_allclose(np.asarray(s.re), 1 / (1 + np.exp([[1.0, -2.0]])), rtol=1e-6)
    x4 = CArray(jnp.arange(16.0).reshape(1, 4, 4, 1), -jnp.arange(16.0).reshape(1, 4, 4, 1))
    avg = cl.complex_adaptive_avg_pool_1(x4)
    np.testing.assert_allclose(np.asarray(avg.re).squeeze(), 7.5)
    mx_faithful = cl.complex_adaptive_max_pool_1(x4, faithful_avg=True)
    np.testing.assert_allclose(np.asarray(mx_faithful.re).squeeze(), 7.5)  # quirk: avg
    mx_true = cl.complex_adaptive_max_pool_1(x4, faithful_avg=False)
    np.testing.assert_allclose(np.asarray(mx_true.re).squeeze(), 15.0)
    np.testing.assert_allclose(np.asarray(mx_true.im).squeeze(), 0.0)


def test_upsample_matches_torch():
    x_t = torch.arange(8.0).reshape(1, 2, 2, 2)
    up = torch.nn.Upsample(scale_factor=(2, 1), mode="nearest")
    ref = up(x_t).numpy()
    ours = rl.upsample_nearest(_nhwc(x_t), (2, 1))
    np.testing.assert_allclose(_nchw(ours), ref)


def test_dropout_train_and_eval():
    x = jnp.ones((4, 8))
    mod = rl.Dropout(rate=0.5)
    out_eval = mod.apply({}, x, train=False)
    np.testing.assert_allclose(np.asarray(out_eval), 1.0)
    out_train = mod.apply({}, x, train=True, rngs={"dropout": KEY})
    vals = np.unique(np.asarray(out_train))
    assert set(np.round(vals, 4)).issubset({0.0, 2.0})
    xc = CArray(jnp.ones((4, 8)), jnp.ones((4, 8)))
    cmod = cl.ComplexDropout(rate=0.5)
    out_c = cmod.apply({}, xc, train=True, rngs={"dropout": KEY})
    # independent masks: re and im patterns differ somewhere
    assert not np.array_equal(np.asarray(out_c.re), np.asarray(out_c.im))
