"""Worker for the 2-process jax.distributed CPU test (test_multiprocess.py).

Each process sees 4 virtual CPU devices (8 global across 2 processes), joins
the localhost coordinator, and runs ONE Trainer train epoch on a deterministic
synthetic global batch — each process feeding only its host-local shard via
the multi-host path (parallel/mesh.form_global_batch). Run with nproc=1 it
produces the single-process baseline over the full global batch on 8 devices.

Writes a JSON result {loss, param_l1, allreduced} for the pytest wrapper to
compare. This is the multi-host analog the reference never had (its DDP is
commented out, /root/reference/train.py:62-63); SURVEY.md §2.3/§5 requires the
path to exist and be exercised.
"""

import json
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]
    data_root = sys.argv[5] if len(sys.argv) > 5 else None

    n_local_dev = 8 // nproc
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local_dev}")

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    if nproc > 1:
        from dcs_net_tpu.parallel.mesh import init_distributed

        init_distributed(f"localhost:{port}", nproc, pid)
    print(f"# worker {pid}: backend={jax.default_backend()} "
          f"process_count={jax.process_count()} "
          f"local={jax.local_device_count()} global={jax.device_count()}",
          flush=True)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 8  # global device count either way

    import numpy as np

    from dcs_net_tpu.core.config import config_for_variant
    from dcs_net_tpu.parallel.mesh import allreduce_host_metric_sums
    from dcs_net_tpu.train.loop import Trainer

    CROP = 2016
    GB = 8  # global utterance batch
    cfg = config_for_variant("drs")
    cfg = cfg.replace(
        model=cfg.model.__class__(
            complex_valued=False, subtractive=True,
            channels=(1, 2, 2, 4, 4, 8, 8, 8), ca_reduction=2),
        data=cfg.data.__class__(crop_samples=CROP, batch_size=GB),
        run=cfg.run.__class__(max_epochs=1, num_sanity_val_steps=0,
                              log_dir=os.path.join(
                                  os.path.dirname(out_path), f"logs{pid}")),
    )

    # deterministic global data; every process derives the SAME global
    # arrays and slices out its host shard (the loader does this by utterance
    # ID in production — data/partition.shard_ids)
    rng = np.random.default_rng(0)
    local = GB // nproc
    lo, hi = pid * local, (pid + 1) * local
    train_batches = []
    for _ in range(2):
        clean = (rng.standard_normal((GB, CROP)) * 0.1).astype(np.float32)
        noisy = clean + (rng.standard_normal((GB, CROP)) * 0.02).astype(
            np.float32)
        train_batches.append({"noisy": noisy[lo:hi], "clean": clean[lo:hi]})
    vclean = (rng.standard_normal((GB, CROP)) * 0.1).astype(np.float32)
    vnoisy = vclean + (rng.standard_normal((GB, CROP)) * 0.02).astype(
        np.float32)
    # eval: each host gets a DIFFERENT val batch; single-process baseline
    # sees both sequentially (same per-batch means, same global mean)
    if nproc > 1:
        val_batches = [{"noisy": vnoisy[lo:hi], "clean": vclean[lo:hi]}]
    else:
        val_batches = [
            {"noisy": vnoisy[:4], "clean": vclean[:4]},
            {"noisy": vnoisy[4:], "clean": vclean[4:]},
        ]

    trainer = Trainer(cfg, use_tensorboard=False, pesq_fn=lambda *a: 0.0)
    trainer.init_state()
    tm = trainer.train_epoch(iter(train_batches), epoch=0)
    vm = trainer.eval_epoch(iter(val_batches), epoch=0, compute_metrics=False)

    param_l1 = float(sum(np.abs(np.asarray(x)).sum()
                         for x in jax.tree.leaves(trainer.state.params)))
    # metric all-gather contract: per-host (sum, count) -> global mean
    red = allreduce_host_metric_sums({"m": (float(pid + 1), 1.0)})
    result = {
        "process": pid,
        "train_loss": tm["loss"],
        "val_loss": vm["val_loss"],
        "param_l1": param_l1,
        "allreduced": red["m"],
    }

    if data_root is not None:
        # the REAL loader path (VERDICT r2 task 3): make_loaders must hand
        # each host a LOCAL shard of the GLOBAL cfg.data.batch_size, and a
        # train epoch through those loaders must assemble the configured
        # global batch (Trainer._device_batch + form_global_batch).
        from dcs_net_tpu.cli.common import make_loaders

        lcfg = cfg.replace(data=cfg.data.__class__(
            root=data_root, crop_samples=CROP, batch_size=GB, num_workers=1))
        train_l, val_l, _ = make_loaders(lcfg)
        expect_local = GB // nproc
        assert train_l.batch_size == expect_local, (
            f"host loader batch {train_l.batch_size} != global {GB} / "
            f"{nproc} hosts")
        t2 = Trainer(lcfg, use_tensorboard=False, pesq_fn=lambda *a: 0.0)
        t2.init_state()
        got = next(iter(train_l.epoch(0)))
        assert got["noisy"].shape[0] == expect_local
        dev_batch = t2._device_batch(got)
        # the assembled global spectrogram batch spans cfg.data.batch_size
        assert dev_batch.noisy.shape[0] == GB, dev_batch.noisy.shape
        lm = t2.train_epoch(train_l.epoch(0), epoch=0)
        result["loader_train_loss"] = lm["loss"]
        result["loader_local_batch"] = int(train_l.batch_size)

    with open(out_path, "w") as f:
        json.dump(result, f)
    if nproc > 1:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
