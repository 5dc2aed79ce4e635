"""Training orchestration — the epoch loops of train_swin.py / train_hat.py.

Behavior parity (SURVEY.md §2.3):

SwinIR GAN (train_swin.py:88-341):
  outputs/<targets>_DDP_SwinIR/{checkpoints,images,tensorboard}; merged
  multi-target manifests; 300 epochs, batch 2 x accum 4, cosine LR
  eta_min=1e-7; per-epoch EMA-shadow validation (PSNR/SSIM), CSV row
  [Epoch,Loss_G,Loss_D,PSNR,SSIM,Time_Sec], TensorBoard 'Metrics/PSNR',
  best-val-PSNR EMA weights -> best_gan_model, full latest checkpoint every
  epoch, auto-resume, [LR|SR|HR] preview strip.

HAT hybrid (train_hat.py:81-336):
  outputs/<targets>/{checkpoints,previews,train_log.csv}; 300 epochs,
  batch 1 x accum 16, 30 L1-only warmup epochs, no val split (train-set
  PSNR/SSIM), CSV every 10 epochs
  [Epoch,G_Total,L1,G_Adv,D_Total,PSNR,SSIM,LR], checkpoints every 5
  epochs + unconditional best/best_EMA, preview every 10 epochs.

TPU-native deltas (documented): one process drives the whole mesh (no
torchrun fork per chip); per-chip batch is preserved so the global batch is
batch_size * n_devices; bf16 compute optional; D/EMA/opt state are fully
checkpointed for HAT (the reference loses them — intent preserved).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..data import PatchDataset, DataIterator, merge_manifests
from ..parallel import (
    make_mesh, replicate, shard_batch, prefetch_to_mesh, is_master,
)
from ..train import (
    CombinedGANLoss,
    create_swin_train_state,
    create_hat_train_state,
    make_swin_train_step,
    make_hat_train_step,
    make_eval_step,
    cosine_annealing_lr,
)
from ..train.vgg import VGG19Features, init_vgg_params
from ..ckpt import CheckpointManager
from ..obs import (
    CSVLogger,
    TensorBoardLogger,
    SWIN_CSV_COLUMNS,
    HAT_CSV_COLUMNS,
    save_tris_preview,
)


@dataclasses.dataclass
class SwinTrainConfig:
    targets: Sequence[str] = ("M1",)
    data_root: str = "data"
    outputs_root: str = "outputs"
    epochs: int = 300
    # The reference trains micro 2 x accum 4 (train_swin.py:36-37), a
    # consumer-GPU VRAM envelope. The optimizer step is the mean gradient
    # over batch_size*accum_steps = 8 patches for any split (the scan in
    # train/steps.py divides each micro loss by accum), so the split is an
    # execution detail; micro 8 x accum 1 + remat_loss measured 15.535 p/s
    # vs 14.04 at 2x4 on the v5e (PERF.md round-4 session 3; plain 8x1
    # does not fit in 15.75G HBM — remat_loss below makes it fit). Set
    # batch_size=2, accum_steps=4, remat_loss=False to reproduce the
    # reference envelope.
    batch_size: int = 8  # per chip
    accum_steps: int = 1
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    ema_decay: float = 0.999
    img_size: int = 128
    upscale: int = 4
    embed_dim: int = 180
    depths: tuple = (6,) * 6
    num_heads: tuple = (6,) * 6
    window_size: int = 8
    # train_swin.py:149 passes mlp_ratio=2, but the reference constructor
    # swallows it into **kwargs (architecture_swin.py:193-194) and every
    # block builds the default 4 (:100) — so the reference-parity value is 4.
    mlp_ratio: float = 4.0
    use_bf16: bool = False
    attn_impl: str | None = None
    # fused Pallas forward+backward for the generator (kernels/swin_block):
    # 1.4x the XLA step on one TPU chip (PERF.md). None = auto: on for TPU
    # bf16 runs (multi-device meshes wrap the generator in shard_map —
    # pallas custom calls are not SPMD-partitionable), off on CPU (would
    # need interpret mode).
    fused: bool | None = None
    remat: bool = False
    # checkpoint both loss phases (D pair + VGG) so only generator residuals
    # peak in HBM — enables micro-batch >= 4 at full size (train/steps.py).
    # Default ON: it is what lets the default micro-8 split fit, and the
    # recompute (one extra D pair + VGG forward per micro) is cheaper than
    # the MXU fill it buys at micro 8 (PERF.md round-4 session 3)
    remat_loss: bool = True
    use_vgg: bool = True
    vgg_weights: str | None = None  # npz of flax params; None -> seeded init
    seed: int = 0
    num_workers: int = 8
    max_steps_per_epoch: int | None = None  # for smoke tests

    @property
    def run_name(self) -> str:
        return "_".join(self.targets) + "_DDP_SwinIR"


@dataclasses.dataclass
class HATTrainConfig:
    targets: Sequence[str] = ("M1",)
    data_root: str = "data"
    outputs_root: str = "outputs"
    epochs: int = 300
    warmup_epochs: int = 30
    # The reference trains micro 1 x accum 16 (train_hat.py:32,39) because
    # of consumer-GPU VRAM (README.md:117). The optimizer step is the mean
    # gradient over batch_size*accum_steps patches either way (the scan in
    # train/steps.py divides each micro loss by accum), so the split is an
    # execution detail; micro 2 x accum 8 measured 5.361 p/s vs 4.512 at
    # 1x16 on the v5e (PERF.md round-4; micro 4 overflows 15.75G HBM
    # without remat). Set 1x16 to reproduce the reference envelope.
    batch_size: int = 2
    accum_steps: int = 8
    lr_g: float = 1e-4
    lr_d: float = 1e-4
    ckpt_interval: int = 5
    img_interval: int = 10
    csv_interval: int = 10
    img_size: int = 128
    embed_dim: int = 90
    depths: tuple = (6, 6, 6, 6)
    num_heads: tuple = (6, 6, 6, 6)
    window_size: int = 8
    num_rrdb: int = 12
    num_feat: int = 48
    num_grow_ch: int = 24
    use_bf16: bool = False
    attn_impl: str | None = None
    # fused Pallas fwd+bwd for the RRDB trunk (kernels/fused_rdb_cm_bwd).
    # None = auto: on for ALL TPU bf16 runs (same gate as swin's fused);
    # multi-device meshes run the fused generator per-shard under shard_map
    fused: bool | None = None
    remat: bool = False
    # checkpoint both loss phases (D pair + VGG) so only generator residuals
    # peak in HBM — enables micro-batch >= 4 at full size (train/steps.py)
    remat_loss: bool = False
    use_vgg: bool = True
    vgg_weights: str | None = None
    pretrained_hat: str | None = None  # HAT-only .pth/orbax to seed the backbone
    seed: int = 0
    num_workers: int = 8
    max_steps_per_epoch: int | None = None

    @property
    def run_name(self) -> str:
        return "_".join(self.targets)


def _split_paths(cfg, split: str) -> list:
    return [
        Path(cfg.data_root) / t / "8_dataset_split" / "splits_json" / f"{split}.json"
        for t in cfg.targets
    ]


def _load_vgg(cfg):
    """Bound VGG feature fn for the perceptual loss (losses_train_swin.py:6-40)."""
    if not cfg.use_vgg:
        return None
    params = None
    if cfg.vgg_weights:
        loaded = np.load(cfg.vgg_weights, allow_pickle=True)
        params = loaded["params"].item() if "params" in loaded else dict(loaded)
    if params is None:
        params = init_vgg_params(cutoff=35, seed=0)
    # compute dtype follows the trainer (torch AMP autocasts the reference's
    # VGG forward too, losses_train_swin.py:25-40 under train_swin.py:229)
    dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    model = VGG19Features(cutoff=35, dtype=dtype)
    return lambda x: model.apply({"params": params}, x)


def _reshape_accum(batch, accum, micro):
    return {k: v.reshape(accum, micro, *v.shape[1:]) for k, v in batch.items()}


# Deferring metric fetches to epoch end removes every per-step sync, so the
# host could dispatch arbitrarily far ahead of the device, keeping each
# dispatched step's full batch alive in HBM (bounded only by PJRT's
# in-flight-computation limit) — a risk on configs near the 15.75G ceiling.
# Every _RUNAHEAD_SYNC steps the loop fetches one scalar from that many
# steps back: at most ~2x_RUNAHEAD_SYNC steps' batches are ever resident,
# while paying one tunnel round-trip per _RUNAHEAD_SYNC steps instead of
# one per step.
_RUNAHEAD_SYNC = 8


def _load_pretrained_hat(path: str, g_params, cfg):
    """Seed the hybrid's HAT backbone from a HAT-only checkpoint — the
    reference's `--pretrained_hat` intent (parsed but never used there,
    train_hat.py:84; non-strict load in hybridmodels_hat.py:133-143)."""
    from ..models.torch_port import load_torch_state_dict, hat_from_torch
    from ..ckpt.manager import restore_pytree

    if str(path).endswith(".pth"):
        sd = load_torch_state_dict(path)
        prefix = "hat." if any(k.startswith("hat.") for k in sd) else ""
        hat_params = hat_from_torch(sd, cfg.depths, prefix=prefix)
    else:
        raw = restore_pytree(path)
        hat_params = raw.get("params", raw)
        if "hat" in hat_params:
            hat_params = hat_params["hat"]
    new_g = dict(g_params)
    new_g["hat"] = hat_params
    return new_g


def train_swin_run(cfg: SwinTrainConfig, resume: bool = True) -> dict:
    """Full SwinIR-GAN training. Returns final metrics dict."""
    import jax.numpy as jnp

    mesh = make_mesh()
    ndev = mesh.devices.size
    run_dir = Path(cfg.outputs_root) / cfg.run_name
    master = is_master()
    if master:
        (run_dir / "images").mkdir(parents=True, exist_ok=True)

    train_entries = merge_manifests(_split_paths(cfg, "train"), cfg.data_root)
    val_entries = merge_manifests(_split_paths(cfg, "val"), cfg.data_root)
    hr_size = cfg.img_size * cfg.upscale
    train_ds = PatchDataset(train_entries, cfg.img_size, hr_size)
    val_ds = PatchDataset(val_entries, cfg.img_size, hr_size)

    micro = cfg.batch_size * ndev
    per_step = micro * cfg.accum_steps
    if len(train_ds) < per_step:
        raise ValueError(
            f"train split has {len(train_ds)} pairs < one optimizer step "
            f"({cfg.batch_size}/chip x {ndev} chips x {cfg.accum_steps} accum "
            f"= {per_step}); add data or lower batch/accum"
        )
    # per-host stream: each process loads a disjoint rank-strided slice of
    # the epoch (DistributedSampler semantics, train_swin.py:141-145) and
    # shard_batch assembles the global array from the local shards
    pidx, pcount = jax.process_index(), jax.process_count()
    assert per_step % pcount == 0 and ndev % pcount == 0
    it = DataIterator(
        train_ds, per_step // pcount, shuffle=True, drop_last=True,
        num_threads=cfg.num_workers, seed=cfg.seed,
        process_index=pidx, process_count=pcount,
    )
    val_it = DataIterator(
        val_ds, ndev // pcount, shuffle=False, num_threads=2,
        process_index=pidx, process_count=pcount,
    )

    dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    fused = cfg.fused
    if fused is None:
        fused = jax.default_backend() == "tpu" and cfg.use_bf16
    state, bundle = create_swin_train_state(
        jax.random.PRNGKey(cfg.seed),
        img_size=cfg.img_size,
        upscale=cfg.upscale,
        embed_dim=cfg.embed_dim,
        depths=cfg.depths,
        num_heads=cfg.num_heads,
        window_size=cfg.window_size,
        mlp_ratio=cfg.mlp_ratio,
        dtype=dtype,
        attn_impl=cfg.attn_impl,
        fused=fused,
        # pallas custom calls are not SPMD-partitionable: on a multi-device
        # mesh the fused generator runs per-shard under shard_map
        fused_mesh=mesh if (fused and ndev > 1) else None,
        remat=cfg.remat,
    )
    criterion_g = CombinedGANLoss(
        pixel_weight=1.0, perceptual_weight=0.5, adversarial_weight=0.005,
        vgg_apply=_load_vgg(cfg),
    )
    step = make_swin_train_step(
        bundle, accum_steps=cfg.accum_steps, criterion_g=criterion_g,
        ema_decay=cfg.ema_decay, remat_loss=cfg.remat_loss,
    )
    eval_step = make_eval_step(bundle.g_apply, use_ema=True)

    mgr = CheckpointManager(run_dir, master=master)
    start_epoch, best_psnr = 1, 0.0
    if resume:
        restored = mgr.restore_latest(state)
        if restored is not None:
            state, start_epoch, best_psnr = restored
            if master:
                print(f"Resumed from epoch {start_epoch}")

    state = replicate(state, mesh)
    csv_log = CSVLogger(run_dir / "metrics.csv", SWIN_CSV_COLUMNS, resume=start_epoch > 1)
    tb = TensorBoardLogger(run_dir / "tensorboard") if master else None

    last = {}
    for epoch in range(start_epoch, cfg.epochs + 1):
        t0 = time.time()
        lr_g = cosine_annealing_lr(epoch, cfg.lr_g, cfg.epochs)
        lr_d = cosine_annealing_lr(epoch, cfg.lr_d, cfg.epochs)
        # device-staged stream + deferred metric fetch: the H2D copy of
        # batch i+1 overlaps step i, and no per-step scalar fetch forces a
        # sync — the host dispatches ahead (bounded, see _RUNAHEAD_SYNC)
        # and syncs once per epoch
        step_metrics = []
        with prefetch_to_mesh(
            it.epoch(epoch), mesh,
            transform=lambda b: _reshape_accum(b, cfg.accum_steps, micro // pcount),
        ) as stream:
            for bi, (_, b) in enumerate(stream):
                if cfg.max_steps_per_epoch and bi >= cfg.max_steps_per_epoch:
                    break
                state, m = step(state, b, lr_g, lr_d)
                step_metrics.append(m)
                if len(step_metrics) % _RUNAHEAD_SYNC == 0:
                    jax.device_get(step_metrics[-_RUNAHEAD_SYNC]["loss_g"])
        g_sum = d_sum = valid = 0.0
        for m in jax.device_get(step_metrics):
            g_sum += float(m["loss_g"]) * float(m["valid_batches"])
            d_sum += float(m["loss_d"]) * float(m["valid_batches"])
            valid += float(m["valid_batches"])
        avg_g = g_sum / max(valid, 1.0)
        avg_d = d_sum / max(valid, 1.0)

        # EMA-shadow validation (train_swin.py:277-300)
        psnr_sum = ssim_sum = count = 0.0
        preview = None
        for vi, vb in enumerate(val_it.epoch(0)):
            if cfg.max_steps_per_epoch and vi >= cfg.max_steps_per_epoch:
                break
            out = eval_step(state, shard_batch(vb, mesh, batch_axis=0))
            # psnr/ssim/count come out replicated (global sums over the
            # sharded batch) — no host-side all-reduce needed
            psnr_sum += float(out["psnr_sum"])
            ssim_sum += float(out["ssim_sum"])
            count += float(out["count"])
            # first addressable shard = master's first local sample
            preview = (vb, np.asarray(out["sr"].addressable_data(0)))
        val_psnr = psnr_sum / max(count, 1.0)
        val_ssim = ssim_sum / max(count, 1.0)

        dt = time.time() - t0
        last = {"epoch": epoch, "loss_g": avg_g, "loss_d": avg_d,
                "psnr": val_psnr, "ssim": val_ssim, "time_sec": dt}
        if master:
            print(
                f"Ep {epoch}: G={avg_g:.4f} D={avg_d:.4f} "
                f"PSNR={val_psnr:.2f} SSIM={val_ssim:.4f} ({dt:.1f}s)"
            )
            csv_log.log({"Epoch": epoch, "Loss_G": avg_g, "Loss_D": avg_d,
                         "PSNR": val_psnr, "SSIM": val_ssim, "Time_Sec": round(dt, 1)})
            if tb:
                tb.scalar("Metrics/PSNR", val_psnr, epoch)
            if val_psnr > best_psnr:
                best_psnr = val_psnr
                mgr.save_best_params(state.ema, "best_gan_model")
            mgr.save_latest(state, epoch=epoch, best_psnr=best_psnr)
            if preview is not None:
                vb, sr = preview
                save_tris_preview(
                    run_dir / "images" / f"epoch_{epoch:03d}.png",
                    vb["lr"][0] / 65535.0, sr[0], vb["hr"][0] / 65535.0,
                )
    if tb:
        tb.flush()
    mgr.wait()  # land in-flight async checkpoint writes
    return last


def train_hat_run(cfg: HATTrainConfig, resume: bool = True) -> dict:
    """Full Hybrid-HAT training. Returns final metrics dict."""
    import jax.numpy as jnp

    mesh = make_mesh()
    ndev = mesh.devices.size
    run_dir = Path(cfg.outputs_root) / cfg.run_name
    master = is_master()
    if master:
        (run_dir / "previews").mkdir(parents=True, exist_ok=True)

    train_entries = merge_manifests(_split_paths(cfg, "train"), cfg.data_root)
    hr_size = cfg.img_size * 4
    train_ds = PatchDataset(train_entries, cfg.img_size, hr_size)
    micro = cfg.batch_size * ndev
    per_step = micro * cfg.accum_steps
    if len(train_ds) < per_step:
        raise ValueError(
            f"train split has {len(train_ds)} pairs < one optimizer step "
            f"({cfg.batch_size}/chip x {ndev} chips x {cfg.accum_steps} accum "
            f"= {per_step}); add data or lower batch/accum"
        )
    # per-host disjoint stream (DistributedSampler semantics) — see
    # train_swin_run; shard_batch builds global arrays from local shards
    pidx, pcount = jax.process_index(), jax.process_count()
    assert per_step % pcount == 0 and ndev % pcount == 0
    it = DataIterator(
        train_ds, per_step // pcount, shuffle=True, drop_last=True,
        num_threads=cfg.num_workers, seed=cfg.seed,
        process_index=pidx, process_count=pcount,
    )

    dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    fused = cfg.fused
    if fused is None:
        fused = jax.default_backend() == "tpu" and cfg.use_bf16
    state, bundle = create_hat_train_state(
        jax.random.PRNGKey(cfg.seed),
        img_size=cfg.img_size,
        embed_dim=cfg.embed_dim,
        depths=cfg.depths,
        num_heads=cfg.num_heads,
        window_size=cfg.window_size,
        num_rrdb=cfg.num_rrdb,
        num_feat=cfg.num_feat,
        num_grow_ch=cfg.num_grow_ch,
        dtype=dtype,
        attn_impl=cfg.attn_impl,
        fused=fused,
        fused_mesh=mesh if (fused and ndev > 1) else None,
        remat=cfg.remat,
    )
    criterion_g = CombinedGANLoss(
        pixel_weight=1.0, perceptual_weight=1.0, adversarial_weight=0.005,
        vgg_apply=_load_vgg(cfg),
    )
    step = make_hat_train_step(
        bundle, accum_steps=cfg.accum_steps, criterion_g=criterion_g,
        remat_loss=cfg.remat_loss,
    )

    if cfg.pretrained_hat:
        state = state.replace(
            g_params=_load_pretrained_hat(cfg.pretrained_hat, state.g_params, cfg)
        )
        # copy, not alias: donated steps reject states whose leaves share
        # buffers (train/ema.py ema_init has the same rule)
        state = state.replace(
            ema=jax.tree_util.tree_map(jnp.array, state.g_params)
        )
        if master:
            print(f"Seeded HAT backbone from {cfg.pretrained_hat}")

    mgr = CheckpointManager(run_dir, master=master)
    start_epoch = 1
    if resume:
        restored = mgr.restore_latest(state)
        if restored is not None:
            state, start_epoch, _ = restored
            if master:
                print(f"Resume from epoch {start_epoch}")

    state = replicate(state, mesh)
    csv_log = CSVLogger(run_dir / "train_log.csv", HAT_CSV_COLUMNS, resume=start_epoch > 1)
    eval_fwd = make_eval_step(
        lambda v, x: bundle.g_apply(v, x, True), use_ema=False
    )

    last = {}
    for epoch in range(start_epoch, cfg.epochs + 1):
        warmup = epoch <= cfg.warmup_epochs
        lr_now = cosine_annealing_lr(epoch, cfg.lr_g, cfg.epochs)
        lr_d_now = cosine_annealing_lr(epoch, cfg.lr_d, cfg.epochs)
        sums = {"g": 0.0, "l1": 0.0, "adv": 0.0, "d": 0.0,
                "psnr": 0.0, "ssim": 0.0, "count": 0.0}
        steps = 0
        last_batch = None
        # device-staged stream + deferred metric fetch (see train_swin_run)
        step_metrics = []
        with prefetch_to_mesh(
            it.epoch(epoch), mesh,
            transform=lambda b: _reshape_accum(b, cfg.accum_steps, micro // pcount),
        ) as stream:
            for bi, (batch, b) in enumerate(stream):
                if cfg.max_steps_per_epoch and bi >= cfg.max_steps_per_epoch:
                    break
                state, m = step(state, b, lr_now, lr_d_now, warmup=warmup)
                step_metrics.append(m)
                last_batch = batch
                if len(step_metrics) % _RUNAHEAD_SYNC == 0:
                    jax.device_get(step_metrics[-_RUNAHEAD_SYNC]["loss_g"])
        for m in jax.device_get(step_metrics):
            sums["g"] += float(m["loss_g"]); sums["l1"] += float(m["l1"])
            sums["adv"] += float(m["g_adv"]); sums["d"] += float(m["loss_d"])
            sums["psnr"] += float(m["psnr_sum"]); sums["ssim"] += float(m["ssim_sum"])
            sums["count"] += float(m["count"]); steps += 1
        n = max(steps, 1)
        cnt = max(sums["count"], 1.0)
        last = {
            "epoch": epoch, "g_total": sums["g"] / n, "l1": sums["l1"] / n,
            "g_adv": sums["adv"] / n, "d_total": sums["d"] / n,
            "psnr": sums["psnr"] / cnt, "ssim": sums["ssim"] / cnt, "lr": lr_now,
        }
        if master:
            tag = "WARMUP" if warmup else "GAN"
            print(
                f"Ep {epoch} [{tag}]: G={last['g_total']:.4f} L1={last['l1']:.4f} "
                f"D={last['d_total']:.4f} PSNR={last['psnr']:.2f}"
            )
            if epoch % cfg.csv_interval == 0:
                csv_log.log({
                    "Epoch": epoch, "G_Total": last["g_total"], "L1": last["l1"],
                    "G_Adv": last["g_adv"], "D_Total": last["d_total"],
                    "PSNR": last["psnr"], "SSIM": last["ssim"], "LR": lr_now,
                })
            if epoch % cfg.ckpt_interval == 0:
                mgr.save_epoch(state, epoch=epoch)
                # reference overwrites 'best' unconditionally (train_hat.py:314-322)
                mgr.save_best_params(state.g_params, "best_hybrid_model")
                mgr.save_best_params(state.ema, "best_hybrid_model_EMA")
            if epoch % cfg.img_interval == 0 and last_batch is not None:
                pv = {k: v[:1] for k, v in last_batch.items()}
                out = eval_fwd(state, pv)
                save_tris_preview(
                    run_dir / "previews" / f"epoch_{epoch:03d}_preview.png",
                    pv["lr"][0] / 65535.0, np.asarray(out["sr"][0]),
                    pv["hr"][0] / 65535.0,
                )
    return last
