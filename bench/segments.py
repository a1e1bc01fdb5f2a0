"""Per-op timing of the DCS forward/backward via in-jit scan repetition.

Each segment runs R times inside ONE jitted lax.scan whose carry perturbs the
input (prevents CSE) and whose output is a D2H-fetched scalar (the fence) —
so the ~27 ms axon-tunnel round trip is paid once per segment, not per rep.

Usage: python bench/segments.py [--batch 32] [--reps 30]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax"))

import jax
import jax.numpy as jnp
import numpy as np

from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.models.unet import DCSNet
from dcs_net_tpu.ops import attention as att
from dcs_net_tpu.ops import complex_layers as cl
from dcs_net_tpu.ops.lstm import ComplexLSTM
from dcs_net_tpu.dsp import stft as dsp
from dcs_net_tpu.train import steps as S
from dcs_net_tpu.train.optim import make_optimizer
from dcs_net_tpu.utils.carray import CArray

RTT = None  # measured dispatch round trip, subtracted from every segment


def _scalar(tree):
    leaves = jax.tree.leaves(tree, is_leaf=lambda x: isinstance(x, CArray))
    tot = jnp.float32(0)
    for l in leaves:
        if isinstance(l, CArray):
            tot += l.re.astype(jnp.float32).sum() + l.im.astype(jnp.float32).sum()
        elif jnp.issubdtype(l.dtype, jnp.floating) or jnp.issubdtype(l.dtype, jnp.complexfloating):
            tot += l.astype(jnp.float32).sum() if not jnp.issubdtype(l.dtype, jnp.complexfloating) else jnp.abs(l).astype(jnp.float32).sum()
    return tot


def _perturb(tree, c):
    def f(l):
        if isinstance(l, CArray):
            return CArray(l.re + (c * 1e-30).astype(l.re.dtype), l.im)
        if jnp.issubdtype(l.dtype, jnp.floating):
            return l + (c * 1e-30).astype(l.dtype)
        return l
    return jax.tree.map(f, tree, is_leaf=lambda x: isinstance(x, CArray))


def time_op(name, fn, args, reps):
    """fn(*args) -> any pytree. Returns per-call ms (RTT removed)."""
    def scanned(c0, args):
        def body(c, _):
            out = fn(*jax.tree.map(
                lambda a: a, _perturb(args, c) if isinstance(args, tuple) else args))
            return c + _scalar(out) * 1e-30, None
        c, _ = jax.lax.scan(body, c0, None, length=reps)
        return c
    jf = jax.jit(scanned)
    c = jf(jnp.float32(0), args)
    float(np.asarray(c))  # compile + warm
    t0 = time.perf_counter()
    c = jf(jnp.float32(1), args)
    float(np.asarray(c))
    dt = time.perf_counter() - t0
    ms = max(dt - RTT, 0.0) / reps * 1e3
    print(f"{name:42s} {ms:9.3f} ms")
    return ms


def main():
    global RTT
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    B = args.batch

    cfg = config_for_variant("dcs")
    cfg = cfg.replace(quirks=cfg.quirks.perf())
    cfg = cfg.replace(
        data=cfg.data.__class__(crop_samples=8160, batch_size=B),
        model=dataclasses.replace(cfg.model, compute_dtype=args.dtype))
    m = cfg.model
    dt = jnp.dtype(args.dtype)
    rng = jax.random.PRNGKey(0)

    # RTT measurement
    triv = jax.jit(lambda x: x + 1.0)
    float(np.asarray(triv(jnp.float32(0))))
    ts = []
    for i in range(10):
        t0 = time.perf_counter()
        float(np.asarray(triv(jnp.float32(i))))
        ts.append(time.perf_counter() - t0)
    RTT = float(np.median(ts))
    print(f"{'dispatch RTT (median)':42s} {RTT*1e3:9.3f} ms")

    reps = args.reps

    def carray(shape, k=0):
        return CArray(
            jax.random.normal(jax.random.PRNGKey(k), shape, jnp.float32).astype(dt),
            jax.random.normal(jax.random.PRNGKey(k + 1), shape, jnp.float32).astype(dt))

    # ---- encoder conv layers, realistic shapes -------------------------------
    # complex channels [1,8,16,32,64,128,128,128]; spatial trace per SURVEY 2.4
    spatial = [(256, 256), (128, 128), (64, 64), (32, 32), (16, 32), (8, 32), (4, 32)]
    total_enc = 0.0
    for i in range(m.n_layers):
        cin, cout = m.enc_channels(i)
        h, w = spatial[i]
        x = carray((B, h, w, cin), k=i)
        mod = cl.ComplexConv2d(cout, m.kernel_e[i], stride=m.stride_e[i],
                               padding=m.kernel_e[i] // 2, dtype=dt)
        v = mod.init(rng, x)
        total_enc += time_op(f"enc{i}_conv {cin}->{cout} @{h}x{w}",
                             lambda p, xx, mod=mod: mod.apply(p, xx), (v, x), reps)
    print(f"{'-- encoder convs total':42s} {total_enc:9.3f} ms")

    # BN at layer-0 output shape (the big one) and a late one
    for (i, (h, w), c) in [(0, (128, 128), 8), (3, (16, 32), 64)]:
        x = carray((B, h, w, c), k=20 + i)
        mod = cl.ComplexBatchNorm2d(c)
        v = mod.init(rng, x, train=True)
        time_op(f"bn c={c} @{h}x{w} (train)",
                lambda p, xx, mod=mod: mod.apply(
                    p, xx, train=True, mutable=["batch_stats"]), (v, x), reps)

    # dropout at the biggest shape
    x = carray((B, 128, 128, 8), k=40)
    dmod = cl.ComplexDropout(0.1)
    vd = dmod.init({"params": rng, "dropout": rng}, x, train=True)
    time_op("dropout c=8 @128x128",
            lambda p, xx: dmod.apply(p, xx, train=True, rngs={"dropout": rng}),
            (vd, x), reps)

    # ---- LSTM + FC -----------------------------------------------------------
    xs = carray((B, 64, 128), k=50)
    lmod = ComplexLSTM(m.lstm_hidden, m.lstm_layers, m.lstm_bidir, dtype=dt)
    vl = lmod.init(rng, xs)
    time_op("complex LSTM (2L bidir, T=64)",
            lambda p, xx: lmod.apply(p, xx)[0], (vl, xs), reps)
    fmod = cl.ComplexLinear(m.fc_features, dtype=dt)
    vf = fmod.init(rng, xs)
    time_op("complex FC", lambda p, xx: fmod.apply(p, xx), (vf, xs), reps)

    # ---- attention at representative shapes ----------------------------------
    for (h, w), c in [((128, 128), 8), ((16, 32), 64)]:
        x = carray((B, h, w, c), k=60)
        ca = att.ComplexChannelAttention(c, m.ca_reduction, maxpool_is_avg=True,
                                         dtype=dt)
        vca = ca.init(rng, x)
        time_op(f"channel-attn c={c} @{h}x{w}",
                lambda p, xx, ca=ca: ca.apply(p, xx), (vca, x), reps)
        sa = att.ComplexSpatialAttention(m.sa_kernel, dtype=dt)
        vsa = sa.init(rng, x)
        time_op(f"spatial-attn c={c} @{h}x{w}",
                lambda p, xx, sa=sa: sa.apply(p, xx), (vsa, x), reps)

    # ---- decoder convT layers -------------------------------------------------
    dec_spatial = [(4, 32), (8, 32), (16, 32), (32, 32), (64, 64), (128, 128), (256, 256)]
    total_dec = 0.0
    for i in range(m.n_layers):
        cin, cout = m.dec_channels(i)
        h, w = dec_spatial[i]
        x = carray((B, h, w, cin), k=70 + i)
        mod = cl.ComplexConvTranspose2d(cout, m.kernel_d[i],
                                        padding=m.kernel_d[i] // 2, dtype=dt)
        v = mod.init(rng, x)
        total_dec += time_op(f"dec{i}_convt {cin}->{cout} @{h}x{w}",
                             lambda p, xx, mod=mod: mod.apply(p, xx), (v, x), reps)
    print(f"{'-- decoder convts total':42s} {total_dec:9.3f} ms")

    # ---- DSP ------------------------------------------------------------------
    waves = jax.random.normal(rng, (3, B, 8160), jnp.float32) * 0.1
    time_op("stft x3 streams", lambda w: dsp.stft(w, cfg.stft), (waves,), reps)
    spec = dsp.stft(waves, cfg.stft)
    time_op("istft x3 streams (spec_to_wave)",
            lambda s: dsp.spec_to_wave(s, cfg.stft, atan2_eps=m.atan2_eps,
                                       pad_top=cfg.quirks.istft_pad_top_bin),
            (spec,), reps)

    # ---- full model fwd / fwd+bwd / train step --------------------------------
    model = DCSNet(cfg.model, cfg.quirks)
    tx = make_optimizer(cfg.optim)
    clean = jax.random.normal(rng, (B, 8160), jnp.float32) * 0.1
    noisy = clean + jax.random.normal(jax.random.PRNGKey(1), (B, 8160),
                                      jnp.float32) * 0.02
    batch = jax.jit(lambda n, c: S.batch_from_waves(n, c, cfg))(noisy, clean)
    state = S.init_state(model, cfg, tx, rng, batch.noisy)

    def fwd(params, bs, b):
        y, _ = model.apply({"params": params, "batch_stats": bs}, b.noisy,
                           train=True, rngs={"dropout": rng},
                           mutable=["batch_stats"])
        return y
    time_op("model forward (train mode)",
            fwd, (state.params, state.batch_stats, batch), max(reps // 3, 5))

    def pipe(params, bs, b):
        def apply_net(x):
            y, _ = model.apply({"params": params, "batch_stats": bs}, x,
                               train=True, rngs={"dropout": rng},
                               mutable=["batch_stats"])
            return y
        out = S.run_model_and_masks(apply_net, b, cfg)
        return S.pipeline_losses(out, cfg)["loss"]
    time_op("pipeline fwd (masks+istfts+losses)",
            pipe, (state.params, state.batch_stats, batch), max(reps // 3, 5))

    def vg(params, bs, b):
        l, g = jax.value_and_grad(lambda p: pipe(p, bs, b))(params)
        return (l, g)  # grads consumed by _scalar -> no DCE
    time_op("pipeline fwd+bwd (grads consumed)",
            vg, (state.params, state.batch_stats, batch), max(reps // 3, 5))

    inner = S.make_train_step(model, cfg, tx)

    def full_step(st, b):
        # consume the updated params — a loss-only output lets XLA DCE the
        # backward and Adam (the round-2 "12 ms train step" artifact)
        st2, m = inner(st, b, rng)
        psum = sum(x.astype(jnp.float32).sum()
                   for x in jax.tree.leaves(st2.params))
        return m["loss"] + psum * 1e-12
    time_op("full train step (fwd+bwd+adam)",
            full_step, (state, batch), max(reps // 3, 5))


if __name__ == "__main__":
    main()
    os._exit(0)
