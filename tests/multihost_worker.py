"""Worker for the REAL multi-process multi-host tests (run by
tests/test_multihost.py, one subprocess per simulated host).

Each worker gets 4 virtual CPU devices (XLA_FLAGS set by the parent) and
joins a 2-process JAX distributed world — the closest in-image analogue of
the reference's torchrun multi-node launch (train_swin.py:81-83). It then
exercises exactly the code paths that are process_count-gated and therefore
invisible to the single-process 8-device suite:

- ``parallel.dist.initialize_distributed`` (jax.distributed runtime init)
- ``DataIterator(process_index/process_count)`` disjoint per-host streams
- ``parallel.mesh.shard_batch`` via ``make_array_from_process_local_data``
- replicated-param gradients on a global mesh spanning both processes
  (the autodiff-inserted cross-process psum)
- ``parallel.mesh.sync_metrics`` (process_allgather reduction)
- mode="train": one full production SwinIR GAN train step
  (make_swin_train_step) on the 2-process global mesh.

Results are written to ``<outdir>/rank<k>.json`` for the parent to assert.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    pid, nprocs, port, outdir, mode = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
        Path(sys.argv[4]), sys.argv[5],
    )

    import jax

    # the machine's sitecustomize force-registers the axon TPU plugin; pin
    # back to CPU before any device query (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    from superresolution_def_tpu.parallel import initialize_distributed

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from superresolution_def_tpu.data import (
        ManifestEntry, PatchDataset, DataIterator, write_tiff_u16,
    )
    from superresolution_def_tpu.parallel import (
        make_mesh, replicate, shard_batch, sync_metrics,
    )

    res: dict = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }

    # ---- per-host data partition: same manifest on every host (the
    # reference writes per-rank copies of one merged manifest,
    # train_swin.py:123-136); streams must partition each epoch ----
    rng = np.random.default_rng(0)  # identical on both hosts
    droot = outdir / f"host{pid}_data"
    entries = []
    n_pairs, lrs, hrs = 16, 8, 32
    for i in range(n_pairs):
        d = droot / f"pair_{i:06d}"
        d.mkdir(parents=True, exist_ok=True)
        hr = rng.random((hrs, hrs))
        write_tiff_u16(d / "hubble.tiff", hr)
        write_tiff_u16(d / "observatory.tiff", hr[::4, ::4])
        entries.append(ManifestEntry(
            f"pair_{i:06d}", str(d / "hubble.tiff"), str(d / "observatory.tiff")
        ))
    ds = PatchDataset(entries, lr_size=lrs, hr_size=hrs)
    it = DataIterator(
        ds, batch_size=8, shuffle=True, drop_last=True, seed=3,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    local_idx = it._indices(epoch=1)
    gathered = multihost_utils.process_allgather(
        np.asarray(local_idx, np.int32)
    ).reshape(-1)
    res["partition_disjoint_exact"] = bool(
        len(set(gathered.tolist())) == n_pairs and len(gathered) == n_pairs
    )

    # ---- global mesh over BOTH processes' devices ----
    mesh = make_mesh()  # all 8 global devices
    res["mesh_devices"] = int(mesh.devices.size)

    # ---- shard_batch multihost path + cross-process psum gradient ----
    # replicated params, batch sharded over the global data axis; gradient
    # of mean-squared-error must equal the local full-batch gradient (both
    # hosts can compute it: the global batch is seeded identically).
    full = np.random.default_rng(7).normal(size=(16, 4)).astype(np.float32)
    half = full[pid * 8:(pid + 1) * 8]  # this host's slice
    w = jnp.arange(4, dtype=jnp.float32) * 0.1 + 0.5
    sharded = shard_batch({"x": half[None]}, mesh, batch_axis=1)["x"]
    res["global_batch_shape"] = list(sharded.shape)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g = jax.jit(
        jax.grad(loss),
        in_shardings=(NamedSharding(mesh, P()), sharded.sharding),
        out_shardings=NamedSharding(mesh, P()),
    )(w, sharded)
    g_local = jax.jit(jax.grad(loss), device=jax.local_devices()[0])(
        w, jnp.asarray(full[None])
    )
    g_here = np.asarray(g.addressable_data(0))  # replicated: local copy
    res["grad_max_abs_err"] = float(np.max(np.abs(g_here - np.asarray(g_local))))

    # ---- sync_metrics across hosts ----
    sm = sync_metrics({"a": float(pid + 1), "b": 10.0 * (pid + 1)})
    res["sync_metrics"] = sm

    if mode == "train":
        # ---- one FULL production SwinIR GAN train step on the 2-process
        # mesh: replicated state, globally sharded batch, psum'd grads ----
        from superresolution_def_tpu.train import (
            create_swin_train_state, make_swin_train_step, cosine_annealing_lr,
        )

        state, bundle = create_swin_train_state(
            jax.random.PRNGKey(0), img_size=16, upscale=4, embed_dim=16,
            depths=(2,), num_heads=(2,), window_size=8,
        )
        step = make_swin_train_step(bundle, accum_steps=2)
        state = replicate(state, mesh)
        brng = np.random.default_rng(11)  # identical batches on both hosts
        gbatch = {
            "lr": brng.integers(0, 65535, (2, 8, 16, 16, 1), dtype=np.uint16),
            "hr": brng.integers(0, 65535, (2, 8, 64, 64, 1), dtype=np.uint16),
        }
        local = {k: v[:, pid * 4:(pid + 1) * 4] for k, v in gbatch.items()}
        batch = shard_batch(local, mesh, batch_axis=1)
        lr = cosine_annealing_lr(1)
        new_state, metrics = step(state, batch, lr, lr)
        res["train_loss_g"] = float(metrics["loss_g"])
        res["train_loss_d"] = float(metrics["loss_d"])
        res["train_step"] = int(new_state.step)
        leaf = jax.tree_util.tree_leaves(new_state.g_params)[0]
        res["params_replicated"] = bool(leaf.sharding.is_fully_replicated)
        # params must remain bitwise identical across hosts after the update
        flat = np.asarray(leaf.addressable_data(0)).ravel()[:64][None]
        allh = np.asarray(multihost_utils.process_allgather(flat))
        res["params_identical_across_hosts"] = bool(
            np.array_equal(allh[0], allh[-1])
        )

    (outdir / f"rank{pid}.json").write_text(json.dumps(res))
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
