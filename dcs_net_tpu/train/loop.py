"""The training loop: the framework-native replacement for the reference's
outsourced PyTorch-Lightning Trainer (/root/reference/train.py:137-152).

Per epoch: train steps (NaN-skip gate, grad-norm probe every
log_every_n_steps), validation (losses + PESQ/STOI host-side + epoch audio
logging), ReduceLROnPlateau on the monitored metric, SWA parameter averaging,
orbax checkpointing, throughput counters (audio-seconds/s/chip).

Faithful details: the plateau monitor is 'val_loss' for subtractive variants
but the TRAIN 'speech_loss' for plain ones (the reference's quirk at
/root/reference/r_network.py:186); a sanity-val pass of
``num_sanity_val_steps`` batches runs before training.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dcs_net_tpu.core.config import Config
from dcs_net_tpu.metrics.harness import calc_metric, stoi_metric
from dcs_net_tpu.models.unet import DCSNet
from dcs_net_tpu.obs.logging import (ThroughputMeter, Writer, log_epoch_audio,
                                     log_input_histograms)
from dcs_net_tpu.parallel import mesh as pmesh
from dcs_net_tpu.train import steps as S
from dcs_net_tpu.train.checkpoint import CheckpointManager
from dcs_net_tpu.train.optim import (SWA, ReduceLROnPlateau, get_lr,
                                     make_optimizer, set_lr)


@dataclass
class TrainerCallbacks:
    """Hook points (HPO pruning, early stop)."""

    on_validation_end: Optional[Callable[[int, Dict[str, float]], bool]] = None
    # return True to stop training (e.g. Optuna prune)


class Trainer:
    def __init__(self, cfg: Config, log_dir: Optional[str] = None,
                 use_tensorboard: bool = True, pesq_fn=None):
        self.cfg = cfg
        self.model = DCSNet(cfg.model, cfg.quirks)
        self.tx = make_optimizer(cfg.optim)
        self.n_proc = jax.process_count()
        if self.n_proc > 1:
            # multi-host DP: the mesh spans ALL processes' devices; every
            # host contributes its shard of the global batch
            # (form_global_batch) and the SPMD all-reduce rides ICI/DCN.
            self.mesh = pmesh.make_mesh(jax.devices(),
                                        axis_name=cfg.run.data_axis)
            assert cfg.data.batch_size % self.n_proc == 0, (
                f"global batch {cfg.data.batch_size} must divide over "
                f"{self.n_proc} hosts")
        else:
            self.mesh = pmesh.make_mesh(
                pmesh.dp_devices(cfg.data.batch_size),
                axis_name=cfg.run.data_axis)
        self.writer = Writer(log_dir or cfg.run.log_dir, use_tensorboard,
                             enabled=jax.process_index() == 0)
        self.plateau = ReduceLROnPlateau(
            factor=cfg.optim.plateau_factor, patience=cfg.optim.plateau_patience,
            threshold=cfg.optim.plateau_threshold, min_lr=cfg.optim.plateau_min_lr)
        self.swa = SWA(start_epoch=int(cfg.optim.swa_start_frac * cfg.run.max_epochs)) \
            if cfg.optim.swa else None
        if pesq_fn is None:
            # native P.862 module by default (reference computes PESQ every
            # val/test step); disabled only if the .so fails to build.
            try:
                from dcs_net_tpu.metrics.harness import pesq_metric
                from dcs_net_tpu.metrics.pesq import _load

                _load()
                pesq_fn = pesq_metric
            except Exception:
                pesq_fn = None
        self.pesq_fn = pesq_fn
        # honest labeling: the native module is an ESTIMATOR, not P.862 —
        # its values are not comparable to published PESQ numbers
        # (docs/PESQ_PARITY.md). A real wheel, if importable, keeps "pesq".
        try:
            from dcs_net_tpu.metrics.pesq import is_estimate

            self.pesq_key = "pesq_est" if is_estimate() else "pesq"
        except Exception:
            self.pesq_key = "pesq_est"
        self._train_step = pmesh.make_dp_train_step(self.model, cfg, self.tx, self.mesh)
        self._scan_k = max(cfg.run.steps_per_dispatch, 1)
        self._scanned_step = (
            pmesh.make_dp_scanned_train_step(self.model, cfg, self.tx,
                                             self.mesh, self._scan_k)
            if self._scan_k > 1 else None)
        self._eval_step = pmesh.make_dp_eval_step(self.model, cfg, self.mesh)
        # ragged train tails (drop_last=False) follow input shardings
        from dcs_net_tpu.train.steps import make_train_step as _mts
        self._train_step_flex = jax.jit(_mts(self.model, cfg, self.tx))
        self._make_batch = jax.jit(
            lambda noisy, clean: S.batch_from_waves(noisy, clean, cfg))
        self.state: Optional[S.TrainState] = None
        self.epoch = 0
        self._last_train_metrics: Dict[str, float] = {}

    # -- state --------------------------------------------------------------
    def init_state(self, seed: Optional[int] = None) -> None:
        rng = jax.random.PRNGKey(self.cfg.run.seed if seed is None else seed)
        crop = self.cfg.data.crop_samples
        sample = jnp.zeros((self.cfg.data.batch_size, crop))
        batch = self._make_batch(sample, sample)
        x = batch.noisy if self.cfg.model.complex_valued else batch.noisy.abs()
        self.state = S.init_state(self.model, self.cfg, self.tx, rng, x)
        self.state = jax.device_put(self.state, pmesh.replicated(self.mesh))

    def _device_batch(self, host_batch: Dict[str, np.ndarray]) -> S.Batch:
        if self.n_proc > 1:
            # each host ships its LOCAL batch shard; the global sharded wave
            # arrays are assembled across processes, then the on-device STFT
            # runs SPMD over the whole mesh.
            waves = pmesh.form_global_batch(
                {"noisy": host_batch["noisy"], "clean": host_batch["clean"]},
                self.mesh, self.cfg.run.data_axis)
            return self._make_batch(waves["noisy"], waves["clean"])
        noisy = jnp.asarray(host_batch["noisy"])
        clean = jnp.asarray(host_batch["clean"])
        batch = self._make_batch(noisy, clean)
        # ragged tails (drop_last=False val tails, batch-1 test) can't shard
        # over the full mesh; replicate them instead so every array in the
        # step lives on the same device set.
        n = noisy.shape[0]
        if n % self.mesh.devices.size == 0:
            return pmesh.shard_batch(batch, self.mesh, self.cfg.run.data_axis)
        return jax.tree.map(
            lambda x: jax.device_put(x, pmesh.replicated(self.mesh)), batch)

    def _global_n(self, local_n: int) -> int:
        """Global utterance count of a batch whose local shard has local_n."""
        return local_n * self.n_proc

    def _dispatch_train(self, host_batch: Dict[str, np.ndarray], sub):
        """One train-step dispatch; picks the mesh-sharded step for full
        batches and the sharding-flexible one for ragged tails (single-host
        only — multi-host loaders drop ragged tails via shard_ids)."""
        batch = self._device_batch(host_batch)
        n = self._global_n(host_batch["noisy"].shape[0])
        if n % self.mesh.devices.size == 0:
            step_fn = self._train_step
        else:
            assert self.n_proc == 1, (
                "ragged train batches are unsupported in multi-host mode; "
                "use drop_last loaders (data.shard_ids already drops tails)")
            step_fn = self._train_step_flex
        self.state, metrics = step_fn(self.state, batch, sub)
        return metrics, batch

    # -- epochs -------------------------------------------------------------
    def train_epoch(self, batches: Iterable[Dict[str, np.ndarray]],
                    epoch: int) -> Dict[str, float]:
        assert self.state is not None, "call init_state() first"
        cfg = self.cfg
        meter = ThroughputMeter(
            cfg.data.batch_size * cfg.data.crop_samples / cfg.data.sr)
        t_epoch0 = time.perf_counter()
        n_ticks = 0
        agg: Dict[str, List[float]] = {}
        rng = jax.random.PRNGKey((cfg.run.seed, epoch).__hash__() & 0x7FFFFFFF)

        # host-side dispatch counter for log cadence: fetching
        # `int(self.state.step)` every dispatch is a device fence (an RTT on
        # network-attached chips) that defeats async dispatch pipelining. The
        # mirror can drift ahead of state.step by the (rare) NaN-skipped
        # steps — cosmetic for cadence; checkpoints still read the real step.
        gstep = int(self.state.step)

        def record(metrics, batch=None, ticks=1):
            nonlocal gstep, n_ticks
            for _ in range(ticks):
                meter.tick()
            gstep += ticks
            n_ticks += ticks
            if gstep % cfg.run.log_every_n_steps < ticks:
                host_metrics = {k: float(v) for k, v in metrics.items()}
                self.writer.scalars(host_metrics, gstep, prefix="train/")
                self.writer.scalar("train/lr", get_lr(self.state.opt_state), gstep)
                if meter.audio_seconds_per_sec:
                    self.writer.scalar("perf/audio_seconds_per_s",
                                       meter.audio_seconds_per_sec, gstep)
                if batch is not None:
                    log_input_histograms(self.writer, batch, gstep)
            for k, v in metrics.items():
                # keep the DEVICE scalar — one fetch per key at epoch end
                # instead of len(metrics) fences per dispatch
                agg.setdefault(k, []).append(v)

        pending: List[Dict[str, np.ndarray]] = []
        for host_batch in batches:
            if self._scanned_step is not None:
                pending.append(host_batch)
                if len(pending) == self._scan_k:
                    rng, sub = jax.random.split(rng)
                    noisy = np.stack([b["noisy"] for b in pending])
                    clean = np.stack([b["clean"] for b in pending])
                    if self.n_proc > 1:
                        waves = pmesh.form_global_batch(
                            {"noisy": noisy, "clean": clean}, self.mesh,
                            cfg.run.data_axis, batch_axis=1)
                        noisy, clean = waves["noisy"], waves["clean"]
                    else:
                        noisy, clean = jnp.asarray(noisy), jnp.asarray(clean)
                    self.state, metrics = self._scanned_step(
                        self.state, noisy, clean, sub)
                    record(metrics, ticks=self._scan_k)
                    pending = []
                continue
            rng, sub = jax.random.split(rng)
            metrics, batch = self._dispatch_train(host_batch, sub)
            record(metrics, batch)
        # ragged tail of a scanned epoch: single-step dispatches
        for host_batch in pending:
            rng, sub = jax.random.split(rng)
            metrics, batch = self._dispatch_train(host_batch, sub)
            record(metrics, batch)
        # this fetch BLOCKS until every dispatched step completed on device —
        # the fence that makes the epoch wall time below honest (dispatches
        # enqueue asynchronously; the sliding-window meter times enqueues and
        # is only used for coarse in-epoch TB logging)
        out = {k: float(jnp.mean(jnp.stack([jnp.asarray(x) for x in v])))
               for k, v in agg.items() if v}
        out["epoch"] = epoch
        dt = time.perf_counter() - t_epoch0
        if n_ticks and dt > 0:
            out["audio_seconds_per_s"] = n_ticks * meter.aps / dt
        self._last_train_metrics = out
        return out

    def eval_epoch(self, batches: Iterable[Dict[str, np.ndarray]],
                   epoch: int, phase: str = "val",
                   compute_metrics: bool = True,
                   max_batches: Optional[int] = None,
                   per_utterance_csv: Optional[str] = None,
                   composite: bool = False) -> Dict[str, float]:
        """``composite=True`` additionally reports SegSNR/LLR/WSS and the
        CSIG/CBAK/COVL regressions (the reference's MATLAB semetrics harness,
        /root/reference/misc.py:296-356) per utterance and in the means."""
        assert self.state is not None
        cfg = self.cfg
        agg: Dict[str, List[float]] = {}
        sampled_audio: Dict[str, np.ndarray] = {}
        csv_f = None
        comp_cols = ("segsnr", "llr", "wss", "csig", "cbak", "covl")
        # reference-C16 parity: a RANDOM batch over the whole epoch gets its
        # audio logged (/root/reference/network_functions.py:450-476), not the
        # last one — reservoir sampling keeps one uniformly without knowing
        # the epoch length. epoch & mask: the sanity pass uses epoch == -1;
        # numpy seeds must be non-negative.
        rng = np.random.default_rng((cfg.run.seed, epoch & 0x7FFFFFFF))
        n_seen = 0
        if per_utterance_csv:
            import os

            os.makedirs(os.path.dirname(per_utterance_csv) or ".", exist_ok=True)
            csv_f = open(per_utterance_csv, "w")
            cols = f"id,start,stoi,{self.pesq_key},si_sdr"
            if composite:
                cols += "," + ",".join(comp_cols)
            csv_f.write(cols + "\n")
        # multi-host: each host evaluates its utterance shard on ITS devices
        # (metric loops are host-side); a local replica of the global state
        # keeps the local jit free of cross-host device assignments. The
        # per-host accumulators are all-reduced at the end (SURVEY.md §5).
        state = self.state
        if self.n_proc > 1:
            state = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), state)
        per_utt = cfg.run.per_utterance_eval_metrics or composite \
            or csv_f is not None
        for i, host_batch in enumerate(batches):
            if max_batches is not None and i >= max_batches:
                break
            if self.n_proc > 1:
                batch = self._make_batch(jnp.asarray(host_batch["noisy"]),
                                         jnp.asarray(host_batch["clean"]))
            else:
                batch = self._device_batch(host_batch)
            losses, audio = self._eval_step(state, batch)
            if not np.isfinite(float(losses["loss"])):
                print(f"found a NaN in {phase} loss! (batch {i}, skipped)")
                continue
            for k, v in losses.items():
                agg.setdefault(k, []).append(float(v))
            if compute_metrics:
                clean = np.asarray(audio["clean"])
                pred = np.asarray(audio["predict_clean"])
                if not per_utt:
                    # batch-mean path (reference calc_metric semantics)
                    agg.setdefault("stoi", []).append(
                        calc_metric(clean, pred, cfg.data.sr, stoi_metric))
                    if self.pesq_fn is not None:
                        agg.setdefault(self.pesq_key, []).append(
                            calc_metric(clean, pred, cfg.data.sr, self.pesq_fn))
                else:
                    # per-utterance path: compute each metric ONCE per
                    # utterance; batch means (NaN-dropped, like calc_metric)
                    # and the CSV rows both come from the same values.
                    from dcs_net_tpu.metrics.harness import si_sdr

                    ids = host_batch.get(
                        "id", [str(j) for j in range(clean.shape[0])])
                    starts = np.asarray(host_batch.get(
                        "start", np.zeros(clean.shape[0], np.int64)))
                    b_stoi, b_pesq = [], []
                    for j, utt_id in enumerate(ids):
                        try:
                            s = stoi_metric(clean[j], pred[j], cfg.data.sr)
                        except Exception:
                            s = float("nan")
                        pq = (self.pesq_fn(clean[j], pred[j], cfg.data.sr)
                              if self.pesq_fn else float("nan"))
                        b_stoi.append(s)
                        b_pesq.append(pq)
                        row = (f"{utt_id},{int(starts[j])},{s:.4f},{pq:.4f},"
                               f"{si_sdr(clean[j], pred[j]):.4f}")
                        if composite:
                            from dcs_net_tpu.metrics.composite import (
                                composite as comp_fn)

                            c = comp_fn(clean[j], pred[j], cfg.data.sr,
                                        pesq_mos=pq)
                            for k in comp_cols:
                                if np.isfinite(c[k]):
                                    agg.setdefault(k, []).append(c[k])
                            row += "," + ",".join(
                                f"{c[k]:.4f}" for k in comp_cols)
                        if csv_f is not None:
                            csv_f.write(row + "\n")
                    def _nan_drop_mean(vals):  # == calc_metric semantics
                        a = np.asarray(vals, np.float64)
                        ok = np.isfinite(a)
                        return float(a[ok].sum() / max(ok.sum(), 1))

                    agg.setdefault("stoi", []).append(_nan_drop_mean(b_stoi))
                    if self.pesq_fn is not None:
                        agg.setdefault(self.pesq_key, []).append(
                            _nan_drop_mean(b_pesq))
            n_seen += 1
            if rng.integers(n_seen) == 0:  # reservoir: keep with prob 1/n
                sampled_audio = {k: np.asarray(v) for k, v in audio.items()}
        if csv_f is not None:
            csv_f.close()
        sums = {k: (float(np.sum(v)), float(len(v)))
                for k, v in agg.items() if v}
        means = pmesh.allreduce_host_metric_sums(sums) if self.n_proc > 1 \
            else {k: s / c for k, (s, c) in sums.items()}
        out = {f"{phase}_{k}": v for k, v in means.items()}
        if sampled_audio:
            log_epoch_audio(self.writer, sampled_audio, int(self.state.step),
                            cfg.data.sr, phase, rng,
                            cfg.run.val_log_sample_size)
        self.writer.scalars(out, int(self.state.step))
        return out

    # -- schedule / SWA -----------------------------------------------------
    def monitored_metric(self, val_metrics: Dict[str, float]) -> float:
        if self.cfg.model.subtractive:
            return val_metrics.get("val_loss", float("inf"))
        # plain variants monitor the TRAIN speech loss (reference quirk,
        # r_network.py:186)
        return self._last_train_metrics.get(
            "speech_loss", val_metrics.get("val_speech_loss", float("inf")))

    def end_of_epoch(self, epoch: int, val_metrics: Dict[str, float]) -> None:
        in_swa = self.swa is not None and epoch >= self.swa.start_epoch
        if not in_swa:
            lr = get_lr(self.state.opt_state)
            new_lr = self.plateau.step(self.monitored_metric(val_metrics), lr)
            if new_lr != lr:
                self.state = self.state.replace(
                    opt_state=set_lr(self.state.opt_state, new_lr))
                print(f"epoch {epoch}: reducing lr {lr:.3e} -> {new_lr:.3e}")
        # else: Lightning SWA swaps ReduceLROnPlateau for SWALR at swa start;
        # with swa_lrs=None (the reference's stochastic_weight_avg=True,
        # /root/reference/train.py:147) SWALR anneals to the lr captured at
        # swa start — i.e. the lr is held constant and plateau stops acting.
        if self.swa is not None:
            self.swa.update(epoch, self.state.params)
        self.epoch = epoch + 1

    def finalize_swa(self, train_batches: Optional[Iterable[
            Dict[str, np.ndarray]]] = None, max_batches: Optional[int] = None
            ) -> None:
        """Swap in the SWA-averaged parameters (Lightning transfers the
        average at the end of fit) and, when train data is supplied, refresh
        the BN running statistics for them (torch.optim.swa_utils.update_bn
        semantics: reset + cumulative average of per-batch stats)."""
        if self.swa is not None and self.swa.active:
            self.state = self.state.replace(params=self.swa.avg_params)
            if train_batches is not None:
                self.recompute_batch_stats(train_batches, max_batches)

    def recompute_batch_stats(self, batches: Iterable[Dict[str, np.ndarray]],
                              max_batches: Optional[int] = None) -> None:
        """BN-statistics refresh pass: forward passes over train data in train
        mode (params frozen), running stats replaced by the CUMULATIVE average
        of the per-batch statistics — torch update_bn / Lightning-SWA
        semantics (momentum=None), which the reference gets from
        stochastic_weight_avg=True (/root/reference/train.py:147).

        Our BN modules update running stats with fixed momentum m=0.1; the
        batch statistic is recovered exactly from one application as
        (new - (1-m)*old) / m, then averaged on the host side.
        """
        assert self.state is not None
        cfg = self.cfg
        m = 0.1  # BatchNorm2d / ComplexBatchNorm2d default momentum

        @jax.jit
        def batch_stat_of(params, stats, batch, r):
            x = batch.noisy if cfg.model.complex_valued else batch.noisy.abs()
            _, mut = self.model.apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                rngs={"dropout": r}, mutable=["batch_stats"])
            return jax.tree.map(lambda new, old: (new - (1 - m) * old) / m,
                                mut["batch_stats"], stats)

        @jax.jit
        def lerp(avg, bs, n):
            return jax.tree.map(lambda a, b: a + (b - a) / n, avg, bs)

        rng = jax.random.PRNGKey(cfg.run.seed ^ 0x5A5A5A)
        avg = None
        n = 0
        for i, host_batch in enumerate(batches):
            if max_batches is not None and i >= max_batches:
                break
            batch = self._device_batch(host_batch)
            rng, sub = jax.random.split(rng)
            bs = batch_stat_of(self.state.params, self.state.batch_stats,
                               batch, sub)
            n += 1
            avg = bs if avg is None else lerp(avg, bs, jnp.float32(n))
        if avg is not None:
            self.state = self.state.replace(batch_stats=avg)

    # -- fit ----------------------------------------------------------------
    def fit(self, train_loader, val_loader,
            callbacks: Optional[TrainerCallbacks] = None,
            ckpt: Optional[CheckpointManager] = None,
            max_epochs: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        if self.state is None:
            self.init_state()
        # sanity val (num_sanity_val_steps batches) before training
        if cfg.run.num_sanity_val_steps:
            self.eval_epoch(val_loader.epoch(0), -1, phase="sanity",
                            compute_metrics=False,
                            max_batches=cfg.run.num_sanity_val_steps)
        val_metrics: Dict[str, float] = {}
        for epoch in range(self.epoch, max_epochs or cfg.run.max_epochs):
            t0 = time.perf_counter()
            train_metrics = self.train_epoch(train_loader.epoch(epoch), epoch)
            val_metrics = self.eval_epoch(val_loader.epoch(epoch), epoch)
            self.end_of_epoch(epoch, val_metrics)
            dt = time.perf_counter() - t0
            print(f"epoch {epoch}: "
                  + " ".join(f"{k}={v:.4f}" for k, v in
                             {**train_metrics, **val_metrics}.items()
                             if isinstance(v, float)) + f" ({dt:.1f}s)")
            if ckpt is not None:
                extra = {
                    "epoch": epoch,
                    "plateau": self.plateau.state_dict(),
                    "lr": get_lr(self.state.opt_state),
                }
                ckpt.save(int(self.state.step), self.state, extra=extra,
                          config=cfg)
            if callbacks and callbacks.on_validation_end:
                if callbacks.on_validation_end(epoch, val_metrics):
                    break
        self.finalize_swa(train_loader.epoch(self.epoch))
        return val_metrics

    def test(self, test_loader) -> Dict[str, float]:
        return self.eval_epoch(test_loader.epoch(0), 0, phase="test")
