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


class _MeshPrefetcher:
    """Iterator staging batches onto the mesh from a background thread.

    Yields ``(host_batch, sharded_batch)`` pairs: the host->device copy of
    batch i+1 overlaps the device compute of batch i, instead of serializing
    transfer -> step -> transfer in the train loop. This is the TPU-native
    analogue of the reference's ``pin_memory=True`` DataLoader + async CUDA
    ``.to(device)`` copies (train_swin.py:142-145, train_hat.py:129-130);
    over a slow host link (the axon tunnel moves ~33 MB/s) the staging cost
    of an 8.9 MB uint16 window is ~270 ms/step if unoverlapped — measured as
    part of config #4's 42.8% non-phase overhead (PERF.md round-4).

    The host batch is passed through untouched (previews and shape checks
    want numpy); ``transform`` (e.g. the accum reshape) applies before
    sharding. Shutdown is deterministic: ``close()`` (or exiting the
    ``with`` block) stops the worker and joins it — no reliance on the
    consumer generator being GC'd after an early ``break``, so staged
    batches don't linger in HBM through the validation loop.

    Worker exceptions (loader IO errors etc.) are relayed and re-raised in
    the consuming thread on the next ``__next__`` — the same producer-death
    class of bug as the round-4 DataIterator deadlock.
    """

    def __init__(self, batches, mesh: Mesh, transform=None, depth: int = 2,
                 batch_axis: int = 1):
        import queue as _queue
        import threading

        self._queue_mod = _queue
        self._q: _queue.Queue = _queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._END = object()
        self._closed = False

        def worker():
            try:
                for b in batches:
                    staged = transform(b) if transform is not None else b
                    staged = shard_batch(staged, mesh, batch_axis=batch_axis)
                    while not self._stop.is_set():
                        try:
                            self._q.put((b, staged), timeout=0.25)
                            break
                        except _queue.Full:
                            continue
                    if self._stop.is_set():
                        return
                self._q.put(self._END)
            except BaseException as e:  # surface loader errors to the consumer
                self._q.put(e)

        self._thread = threading.Thread(
            target=worker, daemon=True, name="mesh-prefetch"
        )
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        if self._closed:
            raise StopIteration
        item = self._q.get()
        if item is self._END:
            self.close()
            raise StopIteration
        if isinstance(item, BaseException):
            self.close()
            raise item
        return item

    def close(self) -> None:
        """Stop the worker, drop staged batches, and join the thread."""
        if self._closed:
            return
        self._closed = True
        self._stop.set()
        # drain so a put-blocked worker can observe the stop flag and exit
        while True:
            try:
                self._q.get_nowait()
            except self._queue_mod.Empty:
                break
        self._thread.join(timeout=10.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):  # backstop only; close() is the contract
        self.close()


def prefetch_to_mesh(batches, mesh: Mesh, transform=None, depth: int = 2,
                     batch_axis: int = 1) -> _MeshPrefetcher:
    """Stage batches onto the mesh ``depth`` ahead (see :class:`_MeshPrefetcher`).

    Returns a closeable iterator; use as a context manager so early exits
    (``max_steps_per_epoch``, exceptions) release the staging thread and its
    HBM-resident batches deterministically.
    """
    return _MeshPrefetcher(batches, mesh, transform=transform, depth=depth,
                           batch_axis=batch_axis)


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
