"""REAL multi-process multi-host execution tests.

The single-process suite simulates 8 chips in one process; these tests
spawn TWO actual Python processes that join one JAX distributed world
(4 virtual CPU devices each, 8 global) — the in-image analogue of the
reference's torchrun multi-rank launch (start_swin.py:137-144,
train_swin.py:81-83). They execute the process_count>1 branches that are
otherwise dead in tests: jax.distributed init, per-host DataIterator
partitioning, shard_batch's make_array_from_process_local_data assembly,
cross-process psum gradients, sync_metrics, and (slow tier) one full
production SwinIR GAN train step on the 2-process global mesh.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).resolve().parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_world(tmp_path: Path, mode: str, timeout: int) -> list[dict]:
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache_cpu")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=4"])

    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port),
             str(tmp_path), mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    return [
        json.loads((tmp_path / f"rank{pid}.json").read_text())
        for pid in range(2)
    ]


def _assert_common(results: list[dict]) -> None:
    for pid, r in enumerate(results):
        assert r["process_index"] == pid
        assert r["process_count"] == 2
        assert r["local_devices"] == 4
        assert r["global_devices"] == 8
        assert r["mesh_devices"] == 8
        assert r["partition_disjoint_exact"], "per-host streams overlap"
        assert r["global_batch_shape"] == [1, 16, 4], (
            "shard_batch did not assemble the global array from local halves"
        )
        assert r["grad_max_abs_err"] < 1e-6, r["grad_max_abs_err"]
        # sync_metrics sums host contributions: 1+2 and 10+20
        assert r["sync_metrics"]["a"] == pytest.approx(3.0)
        assert r["sync_metrics"]["b"] == pytest.approx(30.0)


def test_two_process_world_data_and_collectives(tmp_path):
    """Distributed init + per-host data partition + global-array assembly +
    cross-process psum gradient + sync_metrics, on 2 real processes."""
    results = _run_world(tmp_path, mode="light", timeout=600)
    _assert_common(results)


@pytest.mark.slow
def test_two_process_production_train_step(tmp_path):
    """One full SwinIR GAN train step (accumulation, both phases, EMA,
    spectral norm) on a mesh spanning 2 processes: losses finite and the
    updated params bitwise identical on both hosts."""
    results = _run_world(tmp_path, mode="train", timeout=1800)
    _assert_common(results)
    import numpy as np

    for r in results:
        assert np.isfinite(r["train_loss_g"]) and np.isfinite(r["train_loss_d"])
        assert r["train_step"] == 1
        assert r["params_replicated"]
        assert r["params_identical_across_hosts"]
    assert results[0]["train_loss_g"] == pytest.approx(results[1]["train_loss_g"])
