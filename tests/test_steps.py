"""End-to-end train/eval step tests on tiny synthetic audio, all variants.

Covers: on-device STFT front-end, variant mask pipelines (C14/C15), loss
wiring, optimizer update, NaN-skip gate, eval step audio streams.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.models.unet import DCSNet
from dcs_net_tpu.train import steps as S
from dcs_net_tpu.train.optim import make_optimizer

KEY = jax.random.PRNGKey(0)

# tiny geometry: crop 2016 samples -> T = 1 + 2016/32 = 64 frames (T must
# be divisible by 8 for skip alignment); F=256 stays (512-FFT);
# channel-reduced model (topology identical; full size runs on TPU in bench).
CROP = 2016
TINY_CHANNELS = (1, 2, 2, 4, 4, 8, 8, 8)


def _tiny_cfg(variant):
    cfg = config_for_variant(variant)
    return cfg.replace(
        data=cfg.data.__class__(crop_samples=CROP, batch_size=2),
        model=cfg.model.__class__(
            complex_valued=cfg.model.complex_valued,
            subtractive=cfg.model.subtractive,
            channels=TINY_CHANNELS, ca_reduction=2))


def _batch(cfg, rng):
    clean = jnp.asarray(rng.standard_normal((2, CROP)).astype(np.float32) * 0.1)
    noise = jnp.asarray(rng.standard_normal((2, CROP)).astype(np.float32) * 0.05)
    return S.batch_from_waves(clean + noise, clean, cfg)


def _sample_input(cfg, batch):
    return batch.noisy if cfg.model.complex_valued else batch.noisy.abs()


@pytest.mark.parametrize("variant", ["dr", "dc", "drs", "dcs"])
def test_train_step_updates_params(variant, rng):
    cfg = _tiny_cfg(variant)
    batch = _batch(cfg, rng)
    model = DCSNet(cfg.model, cfg.quirks)
    tx = make_optimizer(cfg.optim)
    state = S.init_state(model, cfg, tx, KEY, _sample_input(cfg, batch))
    step = jax.jit(S.make_train_step(model, cfg, tx))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["skipped"]) == 0.0
    assert int(new_state.step) == 1
    # params moved
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.params, new_state.params)
    assert max(jax.tree.leaves(delta)) > 0
    if cfg.model.subtractive:
        assert "noise_loss" in metrics
    assert np.isfinite(float(metrics["grad_norm"]))


def test_batch_from_waves_shapes(rng):
    cfg = _tiny_cfg("dcs")
    b = _batch(cfg, rng)
    T = cfg.stft.num_frames(CROP)
    assert b.noisy.shape == (2, 256, T)
    # noise = noisy - clean in the STFT domain too (linearity)
    np.testing.assert_allclose(
        np.asarray(b.noise.re), np.asarray(b.noisy.re - b.clean.re), atol=1e-5)


def test_eval_step_audio_streams(rng):
    cfg = _tiny_cfg("dcs")
    batch = _batch(cfg, rng)
    model = DCSNet(cfg.model, cfg.quirks)
    tx = make_optimizer(cfg.optim)
    state = S.init_state(model, cfg, tx, KEY, _sample_input(cfg, batch))
    eval_step = jax.jit(S.make_eval_step(model, cfg))
    losses, audio = eval_step(state, batch)
    assert set(audio) == {"noise", "noisy", "clean", "predict_noise", "predict_clean"}
    n = CROP  # center istft returns hop*(T-1) == crop length
    for k, v in audio.items():
        assert v.shape == (2, n), k
        assert np.all(np.isfinite(np.asarray(v))), k
    assert np.isfinite(float(losses["loss"]))


def test_eval_step_plain_variant_streams(rng):
    cfg = _tiny_cfg("dr")
    batch = _batch(cfg, rng)
    model = DCSNet(cfg.model, cfg.quirks)
    tx = make_optimizer(cfg.optim)
    state = S.init_state(model, cfg, tx, KEY, _sample_input(cfg, batch))
    losses, audio = jax.jit(S.make_eval_step(model, cfg))(state, batch)
    assert "predict_noise" not in audio
    assert set(losses) == {"speech_loss", "loss"}


def test_nan_skip_gate(rng):
    """A poisoned batch must leave params/opt state untouched and flag skipped."""
    cfg = _tiny_cfg("dr")
    batch = _batch(cfg, rng)
    bad = S.Batch(
        noise=batch.noise,
        noisy=batch.noisy.__class__(
            batch.noisy.re.at[0, 0, 0].set(jnp.nan), batch.noisy.im),
        clean=batch.clean)
    model = DCSNet(cfg.model, cfg.quirks)
    tx = make_optimizer(cfg.optim)
    state = S.init_state(model, cfg, tx, KEY, _sample_input(cfg, batch))
    step = jax.jit(S.make_train_step(model, cfg, tx))
    new_state, metrics = step(state, bad, jax.random.PRNGKey(1))
    assert float(metrics["skipped"]) == 1.0
    deltas = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          state.params, new_state.params)
    assert max(jax.tree.leaves(deltas)) == 0.0
    assert int(new_state.step) == 0


def test_polar_resynthesis_quirk_step_parity(rng):
    """The faithful polar round trip (Quirks default, reference
    network_functions.py:213-221) and the direct-iSTFT perf path
    (Quirks.perf()) agree at STEP level to the atan2-eps bound: the polar
    decomposition mag*e^{i(atan2+eps)} shifts each spectrogram value by
    O(eps)~1e-6 relative before resynthesis, so losses and gradients match
    to ~1e-4. Pins that the quirk is actually routed through
    run_model_and_masks for BOTH families."""
    import dataclasses as dc

    for variant in ("dcs", "drs"):
        cfg = _tiny_cfg(variant)
        assert cfg.quirks.polar_resynthesis  # faithful default
        cfg_perf = cfg.replace(quirks=cfg.quirks.perf())
        assert not cfg_perf.quirks.polar_resynthesis
        assert dc.replace(cfg_perf.quirks, polar_resynthesis=True) \
            == cfg.quirks  # perf() flips ONLY this axis

        batch = _batch(cfg, rng)
        model = DCSNet(cfg.model, cfg.quirks)  # quirk is step-level only
        tx = make_optimizer(cfg.optim)
        state = S.init_state(model, cfg, tx, KEY, _sample_input(cfg, batch))
        drop = jax.random.PRNGKey(3)

        losses, grads = {}, {}
        for name, c in (("polar", cfg), ("direct", cfg_perf)):
            grad_fn = S.make_loss_and_grads(model, c)
            losses[name], grads[name] = jax.jit(grad_fn)(state, batch, drop)
        np.testing.assert_allclose(float(losses["polar"]),
                                   float(losses["direct"]), rtol=1e-4)
        # per-leaf band + global floor: cancelled bias grads (~1e-8) carry
        # rounding noise set by the contribution scale, not their own
        # magnitude (same theory as test_parallel's DP tolerance)
        flat_a = jax.tree_util.tree_leaves_with_path(grads["polar"])
        gmax = max(float(np.abs(np.asarray(a)).max()) for _, a in flat_a)
        for (path, a), b in zip(flat_a, jax.tree.leaves(grads["direct"])):
            a, b = np.asarray(a), np.asarray(b)
            tol = 1e-3 * float(np.abs(a).max()) + 1e-5 * gmax
            np.testing.assert_allclose(
                b, a, rtol=0, atol=tol,
                err_msg=f"{variant} {jax.tree_util.keystr(path)}")
