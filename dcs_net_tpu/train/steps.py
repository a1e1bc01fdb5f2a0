"""Variant-aware forward + loss pipelines (reference C14/C15,
/root/reference/network_functions.py:210-448), and the jittable train step.

Everything here is trace-static over the config: variant branches are Python
conditionals resolved at trace time, so the compiled step contains no
data-dependent control flow. The five iSTFTs per step (3 reference streams +
2 predictions) run on-device as part of the same XLA program — the reference
runs its STFTs on host CPU in DataLoader workers and its iSTFTs on GPU
mid-step (SURVEY.md §3.1); here the entire spectral round-trip fuses into the
training program.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from dcs_net_tpu.core.config import Config
from dcs_net_tpu.dsp import stft as dsp
from dcs_net_tpu.ops import masks as M
from dcs_net_tpu.train import losses as L
from dcs_net_tpu.train.optim import global_grad_norm
from dcs_net_tpu.utils.carray import CArray


class Batch(NamedTuple):
    """STFT-domain batch: CArray spectrograms (B, F, T), DC bin dropped."""

    noise: CArray
    noisy: CArray
    clean: CArray


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def batch_from_waves(noisy: jnp.ndarray, clean: jnp.ndarray, cfg: Config) -> Batch:
    """On-device front-end: waveforms (B, n) -> STFT Batch.

    noise = noisy - clean before the transform (/root/reference/data.py:105).
    """
    noise = noisy - clean
    stacked = jnp.stack([noise, noisy, clean])
    spec = dsp.stft(stacked, cfg.stft)
    return Batch(noise=spec[0], noisy=spec[1], clean=spec[2])


def run_model_and_masks(
    apply_mask_net: Callable[..., Any],
    batch: Batch,
    cfg: Config,
) -> Dict[str, Any]:
    """The mask-prediction + application pipeline shared by train/val/test.

    Returns audio streams + masks. ``apply_mask_net`` maps the network input
    (noisy magnitude, or noisy CArray) to the bounded mask.
    """
    q = cfg.quirks
    eps = cfg.model.atan2_eps
    pad_top = q.istft_pad_top_bin
    polar = q.polar_resynthesis
    cx, sub = cfg.model.complex_valued, cfg.model.subtractive

    def to_wave(mag, phase):
        return dsp.polar_to_wave(mag, phase, cfg.stft, pad_top=pad_top)

    # the real family needs the polar pieces regardless (magnitude is the
    # network input, the noisy phase resynthesizes the predictions); the
    # complex family touches specs only, so with polar_resynthesis=False no
    # polar decomposition exists anywhere in its step
    if not cx:
        noise_mag = batch.noise.abs()
        noisy_mag, noisy_phase = batch.noisy.abs(), batch.noisy.angle(eps)
    # one batched iSTFT for the three reference streams (3B x T x n_fft
    # matmul instead of three B-sized ones — better MXU tiling)
    if polar:
        ref_waves = to_wave(
            jnp.stack([batch.noise.abs(), batch.noisy.abs(),
                       batch.clean.abs()]),
            jnp.stack([batch.noise.angle(eps), batch.noisy.angle(eps),
                       batch.clean.angle(eps)]))
    else:
        ref_stack = CArray(
            jnp.stack([batch.noise.re, batch.noisy.re, batch.clean.re]),
            jnp.stack([batch.noise.im, batch.noisy.im, batch.clean.im]))
        ref_waves = dsp.spec_to_wave(ref_stack, cfg.stft, atan2_eps=eps,
                                     pad_top=pad_top, polar=False)
    out: Dict[str, Any] = {
        "noise_audio": ref_waves[0],
        "noisy_audio": ref_waves[1],
        "clean_audio": ref_waves[2],
    }
    if sub:
        if not cx:  # DRS (network_functions.py:224-232)
            target_mask = M.real_subtractive_target(noise_mag, noisy_mag)
            pred_mask = apply_mask_net(noisy_mag)
            pred_noise_mag = noisy_mag * pred_mask
            pred_clean_mag = noisy_mag - pred_noise_mag
            pred_waves = to_wave(
                jnp.stack([pred_noise_mag, pred_clean_mag]),
                jnp.stack([noisy_phase, noisy_phase]))
            out.update(
                target_mask=target_mask, pred_mask=pred_mask,
                predict_noise_audio=pred_waves[0],
                predict_clean_audio=pred_waves[1])
        else:  # DCS (network_functions.py:234-247)
            target_mask = M.bound_crm(M.crm(batch.noise, batch.noisy,
                                            cfg.loss.crm_eps), eps)
            pred_out = apply_mask_net(batch.noisy)
            pred_mask = M.bound_crm(pred_out, eps) if q.double_bound_mask else pred_out
            pred_noise = batch.noisy * pred_mask
            pred_clean = batch.noisy - pred_noise
            stacked = CArray(
                jnp.stack([pred_noise.re, pred_clean.re]),
                jnp.stack([pred_noise.im, pred_clean.im]))
            pred_waves = dsp.spec_to_wave(
                stacked, cfg.stft, atan2_eps=eps, pad_top=pad_top,
                polar=polar)
            out.update(
                target_mask=target_mask, pred_mask=pred_mask,
                predict_noise_audio=pred_waves[0],
                predict_clean_audio=pred_waves[1])
    else:
        if not cx:  # DR (network_functions.py:261-267)
            pred_mask = apply_mask_net(noisy_mag)
            pred_clean_mag = noisy_mag * pred_mask
            out.update(
                pred_mask=pred_mask,
                predict_clean_audio=to_wave(pred_clean_mag, noisy_phase))
        else:  # DC (network_functions.py:269-276)
            pred_out = apply_mask_net(batch.noisy)
            pred_mask = M.bound_crm(pred_out, eps) if q.double_bound_mask else pred_out
            pred_clean = batch.noisy * pred_mask
            out.update(
                pred_mask=pred_mask,
                predict_clean_audio=dsp.spec_to_wave(
                    pred_clean, cfg.stft, atan2_eps=eps, pad_top=pad_top,
                    polar=polar))
    return out


def pipeline_losses(out: Dict[str, Any], cfg: Config) -> Dict[str, jnp.ndarray]:
    return L.calc_loss(
        cfg,
        clean_audio=out["clean_audio"],
        predict_clean_audio=out["predict_clean_audio"],
        target_mask=out.get("target_mask"),
        predict_mask=out.get("pred_mask"),
        noise_audio=out.get("noise_audio"),
        noisy_audio=out.get("noisy_audio"),
        predict_noise_audio=out.get("predict_noise_audio"),
    )


def make_train_step(model, cfg: Config, tx):
    """Build the jittable train step: forward -> losses -> grads -> update,
    with the reference's NaN-skip gate (r_network.py:203-207) implemented as a
    branchless where over the state pytree."""

    def train_step(state: TrainState, batch: Batch, rng: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def loss_fn(params):
            mutated = {}

            def apply_net(x):
                y, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x, train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
                mutated["batch_stats"] = mut["batch_stats"]
                return y

            out = run_model_and_masks(apply_net, batch, cfg)
            losses = pipeline_losses(out, cfg)
            return losses["loss"], (losses, mutated["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt_state)

        gnorm = global_grad_norm(grads)
        if cfg.optim.nan_skip:
            # gate on loss AND (unless Quirks.nan_gate_loss_only) gradient
            # finiteness: a NaN grad under a finite loss would poison the
            # params while the reference's loss-only gate
            # (r_network.py:203-207) keeps "skipping" forever
            bad = ~jnp.isfinite(loss)
            if not cfg.quirks.nan_gate_loss_only:
                bad = bad | ~jnp.isfinite(gnorm)
            new_state = jax.tree.map(
                lambda old, new: jnp.where(bad, old, new), state, new_state)
            losses = dict(losses, skipped=bad.astype(jnp.float32))

        losses = dict(losses, grad_norm=gnorm)
        return new_state, losses

    return train_step


def make_scanned_train_step(model, cfg: Config, tx, k: int):
    """K train steps per device dispatch via lax.scan over stacked raw waves.

    Host->device launch latency (milliseconds over a network-attached chip;
    nonzero everywhere) dominates this model's ~1.3 ms step, so batching K
    steps into one dispatch is the single largest throughput lever (bench.py
    --scan: ~1.8k -> ~12k audio-s/s/chip at K=8). Takes waveforms
    (K, B, crop) — the STFT front-end runs inside the scan body, so the host
    ships raw audio once per K steps. Metrics are the last inner step's.
    """
    inner = make_train_step(model, cfg, tx)

    def scanned(state: TrainState, noisy_waves: jnp.ndarray,
                clean_waves: jnp.ndarray, rng: jax.Array):
        def body(st, inp):
            noisy_w, clean_w, r = inp
            b = batch_from_waves(noisy_w, clean_w, cfg)
            st, metrics = inner(st, b, r)
            return st, metrics

        rngs = jax.random.split(rng, k)
        state, metrics = jax.lax.scan(
            body, state, (noisy_waves, clean_waves, rngs))
        return state, jax.tree.map(lambda m: m[-1], metrics)

    return scanned


def make_loss_and_grads(model, cfg: Config):
    """(state, batch, rng) -> (loss, grads): the train-step gradient path
    without the optimizer update.

    Exists for the DP==single-device invariant test: gradients are the
    quantity the SPMD partitioner actually reduces (psum over the data axis),
    so they are what the invariant is ABOUT. Post-Adam parameters are not a
    usable proxy — Adam's first-step update g/(|g|+eps) has slope up to
    1/eps at g=0, so a reduction-order rounding delta of ~1e-8 on a
    near-zero gradient element legitimately moves a parameter by ~lr/eps
    times that (>1e-6 at lr=1e-4, eps=1e-6), past any bitwise-ish tolerance.
    """

    def fn(state: TrainState, batch: Batch, rng: jax.Array):
        def loss_fn(params):
            def apply_net(x):
                y, _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    x, train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
                return y

            out = run_model_and_masks(apply_net, batch, cfg)
            return pipeline_losses(out, cfg)["loss"]

        return jax.value_and_grad(loss_fn)(state.params)

    return fn


def make_eval_step(model, cfg: Config):
    """Validation/test step: eval-mode forward, losses + audio streams
    (metrics like PESQ/STOI run host-side on the returned audio — reference
    C15 does the same D2H hop, network_functions.py:322-323)."""

    def eval_step(state: TrainState, batch: Batch
                  ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
        def apply_net(x):
            return model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x, train=False)

        out = run_model_and_masks(apply_net, batch, cfg)
        losses = pipeline_losses(out, cfg)
        audio = {k.replace("_audio", ""): v for k, v in out.items()
                 if k.endswith("_audio")}
        return losses, audio

    return eval_step


def init_state(model, cfg: Config, tx, rng: jax.Array, sample_input) -> TrainState:
    # jit the whole init: one XLA program instead of hundreds of eager
    # per-op dispatches (which dominate startup on weak hosts).
    variables = jax.jit(
        lambda r, x: model.init({"params": r, "dropout": r}, x, train=False)
    )(rng, sample_input)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
