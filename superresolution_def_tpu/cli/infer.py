"""Inference/evaluation CLI — infer_swin.py / infer_hat.py behavior.

Capabilities reproduced:
- checkpoint discovery order: best -> latest/epoch_* -> any
  (infer_swin.py:75-83, infer_hat.py:139-152), consuming BOTH this
  framework's orbax checkpoints and reference torch .pth files (via
  torch_port) with `module.`-strip and shape-sniffed hyperparameters
  (infer_swin.py:39-55, infer_hat.py:52-112);
- target recovery by parsing the run-folder name (strip _DDP_SwinIR,
  split on '_', infer_swin.py:108-109) and merging per-target test.json;
- per image: SR -> clamp[0,1] -> 16-bit TIFF `test_NNNN_sr.tiff` + Tris
  comparison PNG + PSNR/SSIM accumulation; HAT also writes
  test_metrics.csv [ID, PSNR, SSIM] (infer_hat.py:210-236);
- NEW (capability the reference README promises but never implements,
  README.md:158): overlap-blended tiled inference for inputs larger than
  the train patch, batched over tiles for the MXU.
"""

from __future__ import annotations

import csv as csv_mod
from pathlib import Path
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..data import PatchDataset, DataIterator, load_manifest, write_tiff_u16
from ..models import SwinIR, HybridHATRealESRGAN
from ..models.torch_port import (
    load_torch_state_dict,
    detect_swinir_params,
    detect_hybrid_params,
    swinir_from_torch,
    hybrid_from_torch,
)
from ..ops.metrics import TrainMetrics
from ..obs import save_tris_preview
from ..ckpt.manager import restore_pytree


# --------------------------------------------------------------------------- #
# checkpoint loading
# --------------------------------------------------------------------------- #
def _orbax_candidates(folder: Path, arch: str) -> list[Path]:
    ck = folder / "checkpoints"
    if arch == "swin":
        names = ["best_gan_model", "latest_checkpoint"]
    else:
        names = ["best_hybrid_model", "best_hybrid_model_EMA", "latest_checkpoint"]
    out = [ck / n for n in names if (ck / n).exists()]
    out += sorted(ck.glob("epoch_*"), reverse=True)
    return out


def _torch_candidates(folder: Path, arch: str) -> list[Path]:
    ck = folder / "checkpoints"
    if arch == "swin":
        names = ["best_gan_model.pth", "latest_checkpoint.pth"]
    else:
        names = ["best_hybrid_model.pth"]
    out = [p for n in names for p in [ck / n, folder / n] if p.exists()]
    for base in (ck, folder):
        out += sorted(base.glob("hybrid_epoch_*.pth"), reverse=True)
        out += sorted(base.glob("*.pth"))
    seen, uniq = set(), []
    for p in out:
        if p not in seen:
            uniq.append(p); seen.add(p)
    return uniq


def load_generator(folder: str | Path, arch: str):
    """Returns (apply_fn, params, info). Handles orbax dirs and torch .pth."""
    folder = Path(folder)

    for cand in _orbax_candidates(folder, arch):
        try:
            # host=True: shape sniffing + preview math happen on host; don't
            # bounce the whole checkpoint through the device (the remote-TPU
            # tunnel can stall on device->host fetches, STATUS.md gotchas)
            raw = restore_pytree(cand, host=True)
        except Exception:
            continue
        if isinstance(raw, dict) and "params" in raw:
            params = raw["params"]
        elif isinstance(raw, dict) and "state" in raw:
            params = raw["state"]["ema"]  # full state -> EMA weights
        else:
            params = raw
        model = _build_model_from_params(arch, params)
        return _apply_of(model, arch), params, {"source": str(cand), "format": "orbax"}

    for cand in _torch_candidates(folder, arch):
        try:
            sd = load_torch_state_dict(str(cand))
        except Exception:
            continue
        if arch == "swin":
            det = detect_swinir_params(sd)
            params = swinir_from_torch(sd, det["depths"])
            model = SwinIR(
                img_size=128, in_chans=1, embed_dim=det["embed_dim"],
                depths=tuple(det["depths"]), num_heads=tuple(det["num_heads"]),
                window_size=8, mlp_ratio=det.get("mlp_ratio", 4.0), upscale=4,
            )
        else:
            det = detect_hybrid_params(sd)
            params = hybrid_from_torch(sd, det)
            model = HybridHATRealESRGAN(
                img_size=128, in_chans=1, embed_dim=det["embed_dim"],
                depths=det["depths"], num_heads=det["num_heads"],
                window_size=det["window_size"], upscale=4,
                num_rrdb=det["num_rrdb"], num_feat=det["num_feat"],
                num_grow_ch=det["num_grow_ch"],
            )
        return _apply_of(model, arch), params, {
            "source": str(cand), "format": "torch", "detected": det,
        }

    raise FileNotFoundError(f"No checkpoint found under {folder}")


def _build_model_from_params(arch: str, params) -> object:
    """Shape-sniff hyperparameters from a flax params tree (reference
    auto-detection, adapted to our param naming)."""
    if arch == "swin":
        embed_dim = np.asarray(params["conv_first"]["conv"]["kernel"]).shape[-1]
        n_layers = 0
        while f"layers_{n_layers}_0" in params:
            n_layers += 1
        depth0 = 0
        while f"layers_0_{depth0}" in params:
            depth0 += 1
        heads = np.asarray(
            params["layers_0_0"]["attn"]["relative_position_bias_table"]
        ).shape[-1]
        fc1_out = np.asarray(
            params["layers_0_0"]["mlp"]["fc1"]["linear"]["kernel"]
        ).shape[-1]
        return SwinIR(
            img_size=128, in_chans=1, embed_dim=int(embed_dim),
            depths=(depth0,) * n_layers, num_heads=(heads,) * n_layers,
            window_size=8, mlp_ratio=float(fc1_out) / embed_dim, upscale=4,
        )
    hat = params["hat"]
    embed_dim = np.asarray(hat["conv_first"]["conv"]["kernel"]).shape[-1]
    num_feat = np.asarray(params["conv_adapt"]["conv"]["kernel"]).shape[-1]
    grow = np.asarray(
        params["rrdb_trunk_0"]["rdb1"]["conv1"]["conv"]["kernel"]
    ).shape[-1]
    n_rrdb = 0
    while f"rrdb_trunk_{n_rrdb}" in params:
        n_rrdb += 1
    n_stages = 0
    while f"layers_{n_stages}" in hat:
        n_stages += 1
    depth0 = 0
    while f"blocks_{depth0}" in hat["layers_0"]:
        depth0 += 1
    heads = np.asarray(
        hat["layers_0"]["blocks_0"]["attn"]["relative_position_bias_table"]
    ).shape[-1]
    return HybridHATRealESRGAN(
        img_size=128, in_chans=1, embed_dim=int(embed_dim),
        depths=(depth0,) * n_stages, num_heads=(heads,) * n_stages,
        window_size=8, upscale=4, num_rrdb=n_rrdb,
        num_feat=int(num_feat), num_grow_ch=int(grow),
    )


def _apply_of(model, arch: str) -> Callable:
    if arch == "swin":
        return lambda params, x: model.apply({"params": params}, x)
    return lambda params, x: model.apply({"params": params}, x, True)


def fused_apply_of(model) -> Callable:
    """Fused whole-block kernel forward for a sniffed SwinIR config —
    2.1x the XLA path on-chip (kernels/swin_block.py). bf16 compute."""
    from ..kernels import make_fused_swinir

    return make_fused_swinir(
        depths=model.depths, num_heads=model.num_heads,
        window_size=model.window_size, upscale=model.upscale,
    )


def fused_hybrid_apply_of(model) -> Callable:
    """Fused-HAB + packed-trunk forward for a sniffed hybrid config
    (kernels/fused_hat.py). bf16 compute."""
    from ..kernels.fused_hat import make_fused_hybrid

    return make_fused_hybrid(
        depths=model.depths, num_heads=model.num_heads,
        window_size=model.window_size, num_rrdb=model.num_rrdb,
    )


# --------------------------------------------------------------------------- #
# tiled inference
# --------------------------------------------------------------------------- #
def tiled_sr(
    apply_fn: Callable,
    params,
    img01: np.ndarray,
    *,
    tile: int = 128,
    overlap: int = 16,
    scale: int = 4,
    mesh=None,
    batch_tiles: int = 8,
) -> np.ndarray:
    """SR an arbitrarily large (H, W) or (H, W, 1) image by overlap-blending.

    Tiles of `tile` x `tile` with `overlap` halo are batched through the
    jitted generator (one compile, MXU-friendly fixed shapes) and blended
    with a linear feather in the overlap bands.

    Pass a ``jax.sharding.Mesh`` to spread the tile batch across every chip
    (params replicated, tiles sharded) — the framework's big-frame spatial
    scaling: window attention is local, so tiles are embarrassingly parallel
    and each chip SRs its share of the frame (SURVEY.md §5 long-context).
    """
    x = np.asarray(img01, np.float32)
    if x.ndim == 2:
        x = x[..., None]
    h, w, _ = x.shape
    if h <= tile and w <= tile:
        pad_h, pad_w = tile - h, tile - w
        xin = np.pad(x, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect") if (pad_h or pad_w) else x
        out = np.asarray(jax.jit(apply_fn)(params, jnp.asarray(xin[None])))[0]
        return out[: h * scale, : w * scale]

    stride = tile - 2 * overlap
    assert stride > 0, "overlap too large for tile"
    ys = list(range(0, max(h - tile, 0) + 1, stride))
    xs = list(range(0, max(w - tile, 0) + 1, stride))
    if ys[-1] + tile < h:
        ys.append(h - tile)
    if xs[-1] + tile < w:
        xs.append(w - tile)

    tiles = np.stack([x[y : y + tile, xx : xx + tile] for y in ys for xx in xs])
    fn = jax.jit(apply_fn)
    shard_in = None
    bs = batch_tiles
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = mesh.devices.size
        bs = max(bs, ndev) // ndev * ndev  # divisible tile batches
        shard_in = NamedSharding(mesh, P(mesh.axis_names[0]))
        params = jax.device_put(params, NamedSharding(mesh, P()))
    outs = []
    for i in range(0, len(tiles), bs):
        chunk = tiles[i : i + bs]
        n_real = len(chunk)
        if n_real < bs:  # pad batch to keep one compiled shape
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], bs - n_real, axis=0)])
        xin = jnp.asarray(chunk)
        if shard_in is not None:
            xin = jax.device_put(xin, shard_in)
        outs.append(np.asarray(fn(params, xin))[:n_real])
    sr_tiles = np.concatenate(outs)

    # linear feather blending; strictly positive so image-border pixels
    # (covered by a single tile's ramp) keep full signal
    ramp = np.ones(tile * scale, np.float32)
    ov = overlap * scale
    if ov:
        rise = (np.arange(ov, dtype=np.float32) + 1.0) / (ov + 1.0)
        ramp[:ov] = rise
        ramp[-ov:] = rise[::-1]
    weight2d = np.outer(ramp, ramp)[..., None]

    acc = np.zeros((h * scale, w * scale, 1), np.float32)
    wacc = np.zeros_like(acc)
    k = 0
    for y in ys:
        for xx in xs:
            ys_, xs_ = y * scale, xx * scale
            acc[ys_ : ys_ + tile * scale, xs_ : xs_ + tile * scale] += sr_tiles[k] * weight2d
            wacc[ys_ : ys_ + tile * scale, xs_ : xs_ + tile * scale] += weight2d
            k += 1
    return acc / np.maximum(wacc, 1e-8)


# --------------------------------------------------------------------------- #
# run_test — the evaluation loop
# --------------------------------------------------------------------------- #
def targets_from_folder_name(name: str) -> list[str]:
    """'M1_M33_DDP_SwinIR' -> ['M1', 'M33'] (infer_swin.py:108-109)."""
    return name.replace("_DDP_SwinIR", "").split("_")


def run_test(
    folder: str | Path,
    arch: str,
    *,
    data_root: str = "data",
    lr_size: int = 128,
    hr_size: int = 512,
    limit: int | None = None,
    write_csv: bool | None = None,
    manifest: str | None = None,
    impl: str | None = None,
) -> dict:
    """Evaluate a run folder on its targets' test split; write artifacts.

    impl='fused' routes SwinIR through the whole-block VMEM kernel (bf16).
    """
    folder = Path(folder)
    apply_fn, params, info = load_generator(folder, arch)
    if impl == "fused" and arch == "swin":
        apply_fn = fused_apply_of(_build_model_from_params(arch, params))
        info["impl"] = "fused"
    elif impl == "fused":
        apply_fn = fused_hybrid_apply_of(_build_model_from_params(arch, params))
        info["impl"] = "fused"
    fn = jax.jit(
        lambda p, x: jnp.clip(
            jnp.nan_to_num(apply_fn(p, x).astype(jnp.float32)), 0.0, 1.0
        )
    )

    if manifest is not None:
        entries = load_manifest(manifest, data_root)
    else:
        entries = []
        for t in targets_from_folder_name(folder.name):
            p = Path(data_root) / t / "8_dataset_split" / "splits_json" / "test.json"
            if p.exists():
                entries.extend(load_manifest(p, data_root))
    if limit:
        entries = entries[:limit]
    if not entries:
        raise FileNotFoundError("no test manifest entries found")

    out_dir = folder / "test_results"
    out_dir.mkdir(parents=True, exist_ok=True)
    if write_csv is None:
        write_csv = arch == "hat"
    csv_rows = []

    ds = PatchDataset(entries, lr_size, hr_size)
    metrics = TrainMetrics()
    from ..ops.metrics import psnr as psnr_fn, ssim as ssim_fn

    for i, batch in enumerate(DataIterator(ds, 1, shuffle=False).epoch(0)):
        lr01 = jnp.asarray(batch["lr"], jnp.float32) / 65535.0
        hr01 = jnp.asarray(batch["hr"], jnp.float32) / 65535.0
        sr = fn(params, lr01)
        metrics.update(sr, hr01)
        write_tiff_u16(out_dir / f"test_{i:04d}_sr.tiff", np.asarray(sr[0, ..., 0]))
        save_tris_preview(
            out_dir / f"test_{i:04d}_tris.png",
            np.asarray(lr01[0]), np.asarray(sr[0]), np.asarray(hr01[0]),
        )
        if write_csv:
            pv = float(psnr_fn(sr, hr01)[0])
            sv = float(ssim_fn(sr, jnp.clip(hr01, 0, 1)))
            csv_rows.append([i, f"{pv:.4f}", f"{sv:.6f}"])

    if write_csv:
        with open(out_dir / "test_metrics.csv", "w", newline="") as f:
            w = csv_mod.writer(f)
            w.writerow(["ID", "PSNR", "SSIM"])
            w.writerows(csv_rows)

    result = metrics.compute()
    result["num_images"] = metrics.count
    result["checkpoint"] = info
    return result
