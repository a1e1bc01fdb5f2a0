"""2-process jax.distributed training == single-process training.

Spawns the real multi-host path on localhost CPU: two processes x 4 virtual
devices each, coordinated by jax.distributed, running Trainer through
parallel/mesh.form_global_batch — and asserts loss and final parameters equal
a single-process 8-device run on the same global data (VERDICT r1 item 2;
SURVEY.md §2.3 DP over hosts).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ)
    # REPO only: an inherited PYTHONPATH may carry a sitecustomize that
    # registers an accelerator backend at interpreter start (overriding the
    # worker's JAX_PLATFORMS=cpu) — this test is CPU-only by design.
    env["PYTHONPATH"] = REPO
    # the worker sets its own JAX_PLATFORMS/XLA_FLAGS; scrub conftest's
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run(pid: int, nproc: int, port: int, out: str,
         data_root: str = None) -> subprocess.Popen:
    argv = [sys.executable, WORKER, str(pid), str(nproc), str(port), out]
    if data_root:
        argv.append(data_root)
    return subprocess.Popen(
        argv, env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)


@pytest.mark.timeout(900)
def test_two_process_training_matches_single(tmp_path):
    from dcs_net_tpu.data import synthetic

    port = _free_port()
    outs = [str(tmp_path / f"mp{i}.json") for i in range(2)]
    base_out = str(tmp_path / "single.json")
    # shared synthetic VoiceBank tree: the workers also drive the REAL
    # make_loaders path (host-local batch sizing + shard_ids) against it
    data_root = str(tmp_path / "vb")
    synthetic.generate(data_root, n_train=16, n_test=2, seconds=0.3)

    # two coordinated processes (concurrently) ...
    procs = [_run(i, 2, port, outs[i], data_root) for i in range(2)]
    logs = [p.communicate(timeout=840)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    # ... then the single-process baseline on the same global data
    base = _run(0, 1, _free_port(), base_out, data_root)
    blog = base.communicate(timeout=840)[0]
    assert base.returncode == 0, f"baseline failed:\n{blog[-4000:]}"

    results = [json.load(open(o)) for o in outs]
    single = json.load(open(base_out))

    # both processes agree exactly (replicated state, allreduced metrics)
    np.testing.assert_allclose(results[0]["train_loss"],
                               results[1]["train_loss"], rtol=1e-6)
    np.testing.assert_allclose(results[0]["param_l1"],
                               results[1]["param_l1"], rtol=1e-6)
    # multi-process == single-process on the same global batch
    np.testing.assert_allclose(results[0]["train_loss"],
                               single["train_loss"], rtol=1e-5)
    np.testing.assert_allclose(results[0]["val_loss"],
                               single["val_loss"], rtol=1e-5)
    np.testing.assert_allclose(results[0]["param_l1"],
                               single["param_l1"], rtol=1e-5)
    # per-host eval accumulators all-gathered: hosts contributed 1 and 2
    for r in results:
        np.testing.assert_allclose(r["allreduced"], 1.5)
    np.testing.assert_allclose(single["allreduced"], 1.0)
    # real loader path: each host's Loader got the LOCAL shard of the global
    # batch (8 utterances / 2 hosts = 4), and a loader-fed epoch ran
    for r in results:
        assert r["loader_local_batch"] == 4
        assert np.isfinite(r["loader_train_loss"])
    assert single["loader_local_batch"] == 8
