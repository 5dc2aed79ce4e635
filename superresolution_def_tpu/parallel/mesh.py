"""Data parallelism over a device mesh — the framework's NCCL-DDP equivalent.

The reference scales with torchrun + DDP(find_unused_parameters) + NCCL
all-reduce per backward + DistributedSampler (SURVEY.md §2.6/§2.7). The
TPU-native design replaces all of that with sharding annotations:

- a 1-D ``Mesh`` over ICI with a ``data`` axis (v5e-8: 8 chips);
- train state replicated, batches sharded over the micro-batch axis
  (P(None, 'data') — the leading axis is gradient accumulation);
- the jitted train step then runs SPMD: XLA inserts the gradient
  all-reduce exactly where DDP's bucketed NCCL all-reduce sat, fused with
  the backward, and keeps params replicated after the optimizer update;
- metric scalars come out replicated — the reference's manual
  `dist.all_reduce(SUM)` of [loss_G, loss_D, valid] (train_swin.py:269-270)
  is subsumed, with `sync_metrics` covering the multi-host case.

No port, no env rendezvous, no process groups: the same step function runs
on 1 chip or a full slice depending only on where its inputs live.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Tree = Any


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_axis: int = 1, ndim: int = 5) -> NamedSharding:
    """Shard dim ``batch_axis`` over 'data' (default: (accum, B, H, W, C))."""
    spec = [None] * ndim
    spec[batch_axis] = mesh.axis_names[0]
    return NamedSharding(mesh, P(*spec))


def replicate(tree: Tree, mesh: Mesh) -> Tree:
    """Place every leaf replicated on the mesh (params / train state)."""
    sh = replicated_sharding(mesh)
    return jax.device_put(tree, sh)


def shard_batch(batch: Mapping[str, np.ndarray], mesh: Mesh, batch_axis: int = 1) -> dict:
    """Shard each array's batch axis across the mesh 'data' axis.

    Batch-axis size must divide the mesh size (the iterator's
    DistributedSampler-style padding guarantees this for whole epochs).

    Multi-host: each process passes only ITS slice of the global batch (the
    per-host ``DataIterator`` stream); the global array is assembled from
    process-local shards without any cross-host data movement — the
    TPU-native form of DistributedSampler + per-rank loaders
    (train_swin.py:141-145).
    """
    multihost = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        sh = batch_sharding(mesh, batch_axis, v.ndim)
        if multihost:
            out[k] = jax.make_array_from_process_local_data(sh, np.asarray(v))
        else:
            out[k] = jax.device_put(v, sh)
    return out


def sync_metrics(metrics: dict) -> dict:
    """Sum metric scalars across hosts (multi-host only; no-op single-host).

    Device-level aggregation already happened inside the jitted step; this
    covers per-host Python-side accumulators, mirroring the reference's
    `dist.all_reduce(SUM)` on metric tensors (train_swin.py:292-297).
    """
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vec = np.asarray([float(metrics[k]) for k in keys], np.float32)
    summed = multihost_utils.process_allgather(vec).sum(axis=0)
    return {k: float(s) for k, s in zip(keys, summed)}
