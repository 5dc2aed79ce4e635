"""Checkpointing with the reference's schema semantics, on orbax.

Reference behavior reproduced (SURVEY.md §5 checkpoint/resume):
- swin (train_swin.py:312-327): every epoch write `latest_checkpoint`
  holding {epoch, net_g, net_d, opt_g, opt_d, best_psnr, ema_shadow} —
  here the whole GANTrainState + scalars — plus a val-PSNR-gated
  EMA-weights-only `best_gan_model`.
- hat (train_hat.py:314-322): `hybrid_epoch_NNN` every 5 epochs
  (G + opt_g only in the reference; we store the full state so D/EMA/opt_d
  actually resume — the reference's data loss is a documented defect, its
  *intent* is resumable training), plus unconditional `best_hybrid_model`
  and `best_hybrid_model_EMA`.
- resume: newest step restores everything incl. the epoch counter; the
  cosine schedule needs no state (it is a pure function of the epoch,
  schedule.py), mirroring the reference's `last_epoch` re-sync.

Rank-0-only writes (is_master), like the reference's rank discipline.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp

_async_ckptr: ocp.AsyncCheckpointer | None = None


def _get_async() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def save_pytree(path: str | Path, tree: Any, *, async_write: bool = False) -> None:
    """Write a checkpoint; async_write overlaps the write with training
    (the epoch loop no longer stalls on orbax IO — observed ~30s/epoch on
    the reference's save-every-epoch schedule). The next save waits for the
    previous one automatically."""
    path = Path(path).resolve()
    if async_write:
        ckptr = _get_async()
        ckptr.wait_until_finished()
        ckptr.save(path, tree, force=True)  # orbax overwrites atomically
        return
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def wait_for_async_saves() -> None:
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def restore_pytree(path: str | Path, target: Any = None, *, host: bool = False) -> Any:
    """Restore a checkpoint pytree.

    ``host=True`` restores every leaf as ``np.ndarray`` — tensorstore reads
    the bytes straight into host memory, no device anywhere. Use it for
    inspection paths (shape sniffing, weight porting, ``load_generator``):
    the default restore re-creates each leaf with the sharding recorded in
    the checkpoint (i.e. on the accelerator — ``jax.default_device`` does
    NOT override it), so the first ``np.asarray`` pulls the whole tree back
    through the device; over a remote-device tunnel that round-trip can
    stall outright. Compute paths that jit over the params don't need
    ``host=True``; jit stages host arrays onto the device once.
    """
    path = Path(path).resolve()
    ckptr = ocp.PyTreeCheckpointer()
    if host:
        import numpy as np

        tree = target
        if tree is None:
            im = ckptr.metadata(path).item_metadata
            tree = im.tree if hasattr(im, "tree") else im
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
        )
        if target is not None:
            return ckptr.restore(path, item=target, restore_args=restore_args)
        return ckptr.restore(path, restore_args=restore_args)
    if target is not None:
        return ckptr.restore(path, item=target)
    return ckptr.restore(path)


class CheckpointManager:
    """latest/best/epoch-N checkpoints under one run directory."""

    def __init__(self, run_dir: str | Path, master: bool | None = None):
        self.run_dir = Path(run_dir)
        self.ckpt_dir = self.run_dir / "checkpoints"
        if master is None:
            master = jax.process_index() == 0
        self.master = master
        if self.master:
            self.ckpt_dir.mkdir(parents=True, exist_ok=True)

    # -- writes (rank-0 only) ------------------------------------------------
    def save_latest(self, state, *, epoch: int, best_psnr: float = 0.0) -> None:
        if not self.master:
            return
        save_pytree(
            self.ckpt_dir / "latest_checkpoint",
            {"state": state, "epoch": epoch, "best_psnr": best_psnr},
            async_write=True,
        )

    def wait(self) -> None:
        """Block until in-flight async saves land (call at end of training)."""
        wait_for_async_saves()

    def save_epoch(self, state, *, epoch: int) -> None:
        if not self.master:
            return
        save_pytree(
            self.ckpt_dir / f"epoch_{epoch:03d}",
            {"state": state, "epoch": epoch, "best_psnr": 0.0},
        )

    def save_best_params(self, params, name: str = "best_gan_model") -> None:
        """EMA-weights-only best (reference best_gan_model.pth)."""
        if not self.master:
            return
        save_pytree(self.ckpt_dir / name, {"params": params})

    # -- reads ---------------------------------------------------------------
    def latest_path(self) -> Path | None:
        wait_for_async_saves()  # an in-flight write commits before we look
        latest = self.ckpt_dir / "latest_checkpoint"
        if latest.exists():
            return latest
        # fall back to newest epoch_NNN (hat-style resume, train_hat.py:110-112)
        epochs = sorted(
            (p for p in self.ckpt_dir.glob("epoch_*") if re.match(r"epoch_\d+$", p.name)),
            key=lambda p: int(p.name.split("_")[1]),
        )
        return epochs[-1] if epochs else None

    def restore_latest(self, target_state) -> tuple[Any, int, float] | None:
        """Returns (state, start_epoch, best_psnr) or None if no checkpoint."""
        path = self.latest_path()
        if path is None:
            return None
        out = restore_pytree(
            path, {"state": target_state, "epoch": 0, "best_psnr": 0.0}
        )
        return out["state"], int(out["epoch"]) + 1, float(out["best_psnr"])

    def restore_params(self, name: str, target_params) -> Any:
        out = restore_pytree(self.ckpt_dir / name, {"params": target_params})
        return out["params"]
