"""Host input pipeline: threaded TIFF decode -> uint16 batches -> device.

TPU-first replacement for the reference's DataLoader + DistributedSampler
stack (train_swin.py:141-145):

- **Sharding** reproduces torch DistributedSampler(shuffle=True) semantics:
  a global epoch-seeded permutation, padded to a multiple of
  world_size * batch, then a strided per-process slice — every process sees
  the same number of batches per epoch (`set_epoch` == passing ``epoch``).
- **Decode** happens on a thread pool producing pinned numpy uint16 arrays
  (2 bytes/px over PCIe instead of 4); normalization (/65535) and
  augmentation run on-device (see augment.py), fused into the jitted step.
- **Prefetch**: a bounded background queue keeps `prefetch` batches ready so
  the TPU never waits on PIL.
- **Corrupt-file policy**: like the reference (astronomical_dataset_swin.py:
  53-55) a failed read substitutes another sample — here deterministically
  (seeded by the failing index) so all processes stay in step.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import numpy as np

from .manifest import ManifestEntry
from .tiff import read_tiff_u16
from . import fast_tiff


class PatchDataset:
    """Decodes manifest entries to {'lr': (h,w,1), 'hr': (H,W,1)} uint16.

    Decode order: native C++ decoder (native/tifffast.cpp, zero Python
    overhead) -> PIL fallback per file.
    """

    def __init__(
        self,
        entries: Sequence[ManifestEntry],
        lr_size: int = 128,
        hr_size: int = 512,
        strict: bool = False,
        use_native: bool = True,
    ):
        self.entries = list(entries)
        self.lr_size = lr_size
        self.hr_size = hr_size
        self.strict = strict
        self.use_native = use_native and fast_tiff.native_available()

    def __len__(self) -> int:
        return len(self.entries)

    def _read_one(self, path: str, size: int) -> np.ndarray:
        if self.use_native:
            arr = fast_tiff.read_tiff_u16_native(path, size, size)
            if arr is not None:
                return arr
        arr = read_tiff_u16(path)
        if arr.shape != (size, size):
            raise ValueError(f"{path}: bad shape {arr.shape}, want {(size, size)}")
        return arr

    def _read(self, idx: int) -> dict[str, np.ndarray]:
        e = self.entries[idx]
        hr = self._read_one(e.hubble_path, self.hr_size)
        lr = self._read_one(e.ground_path, self.lr_size)
        return {"lr": lr[..., None], "hr": hr[..., None]}

    def read_batch(self, idxs, nthreads: int = 8) -> dict[str, np.ndarray]:
        """Batch decode via the native thread pool; PIL-fallback per miss."""
        idxs = list(idxs)
        if self.use_native:
            hr_paths = [self.entries[i].hubble_path for i in idxs]
            lr_paths = [self.entries[i].ground_path for i in idxs]
            hr_res = fast_tiff.read_batch_u16(hr_paths, self.hr_size, self.hr_size, nthreads)
            lr_res = fast_tiff.read_batch_u16(lr_paths, self.lr_size, self.lr_size, nthreads)
            if hr_res is not None and lr_res is not None:
                hr_b, hr_st = hr_res
                lr_b, lr_st = lr_res
                for j, i in enumerate(idxs):  # per-file fallback/substitution
                    if hr_st[j] != 0 or lr_st[j] != 0:
                        item = self[i]
                        hr_b[j] = item["hr"][..., 0]
                        lr_b[j] = item["lr"][..., 0]
                return {"lr": lr_b[..., None], "hr": hr_b[..., None]}
        items = [self[i] for i in idxs]
        return {k: np.stack([it[k] for it in items]) for k in ("lr", "hr")}

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        # Reference behavior: substitute another sample on unreadable files
        # (deterministic here so every data-parallel process stays aligned).
        tries = 0
        cur = idx
        while True:
            try:
                return self._read(cur)
            except Exception:
                if self.strict or tries >= 8:
                    raise
                tries += 1
                cur = int(
                    np.random.default_rng(idx * 1000003 + tries).integers(len(self.entries))
                )


def _epoch_order(n: int, epoch: int, shuffle: bool, seed: int = 0) -> np.ndarray:
    if shuffle:
        return np.random.default_rng(seed + epoch).permutation(n)
    return np.arange(n)


class DataIterator:
    """Epoch iterator yielding device-ready numpy batches for one process."""

    def __init__(
        self,
        dataset: PatchDataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        process_index: int = 0,
        process_count: int = 1,
        num_threads: int = 8,
        prefetch: int = 4,
        drop_last: bool = False,
        seed: int = 0,
    ):
        self.ds = dataset
        self.batch = batch_size
        self.shuffle = shuffle
        self.pidx = process_index
        self.pcount = process_count
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.seed = seed

    def batches_per_epoch(self) -> int:
        n = len(self.ds)
        if n == 0:
            return 0
        global_batch = self.batch * self.pcount
        if self.drop_last:
            return n // global_batch
        return -(-n // global_batch)

    def _indices(self, epoch: int) -> np.ndarray:
        """DistributedSampler semantics: pad (wrap) then stride by rank."""
        order = _epoch_order(len(self.ds), epoch, self.shuffle, self.seed)
        global_batch = self.batch * self.pcount
        nb = self.batches_per_epoch()
        total = nb * global_batch
        if total > len(order):  # wrap-around padding, like DistributedSampler
            reps = -(-total // len(order))
            order = np.tile(order, reps)
        order = order[:total]
        return order[self.pidx :: self.pcount]  # strided per-process slice

    def epoch(self, epoch: int = 0) -> Iterator[dict[str, np.ndarray]]:
        """Yield {'lr': (B,h,w,1) uint16, 'hr': (B,H,W,1) uint16} batches."""
        idxs = self._indices(epoch)
        nb = len(idxs) // self.batch
        if nb == 0:
            return iter(())

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            # Any exception (e.g. every substitution candidate unreadable,
            # PatchDataset.__getitem__'s 8-try ladder exhausted) is shipped
            # to the consumer and re-raised there — unconditionally ending
            # with a sentinel, or the consumer's blocking get() would
            # deadlock on a dead producer.
            try:
                if self.ds.use_native:
                    for b in range(nb):
                        if stop.is_set():
                            break
                        chunk = idxs[b * self.batch : (b + 1) * self.batch]
                        out_q.put(self.ds.read_batch(chunk, nthreads=self.num_threads))
                else:
                    with ThreadPoolExecutor(self.num_threads) as pool:
                        for b in range(nb):
                            if stop.is_set():
                                break
                            chunk = idxs[b * self.batch : (b + 1) * self.batch]
                            items = list(pool.map(self.ds.__getitem__, chunk))
                            out_q.put(
                                {k: np.stack([it[k] for it in items]) for k in ("lr", "hr")}
                            )
            except BaseException as e:  # noqa: BLE001 — relayed, not swallowed
                out_q.put(e)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()

        def gen():
            try:
                while True:
                    item = out_q.get()
                    if item is None:
                        break
                    if isinstance(item, BaseException):
                        raise item
                    yield item
            finally:
                stop.set()
                # drain so the producer can exit
                while thread.is_alive():
                    try:
                        out_q.get_nowait()
                    except queue.Empty:
                        thread.join(timeout=0.1)

        return gen()
