"""Trainer orchestration smoke tests (tiny configs, CPU, 1-2 epochs)."""

import numpy as np
import pytest

from superresolution_def_tpu.cli.trainers import (
    SwinTrainConfig,
    HATTrainConfig,
    train_swin_run,
    train_hat_run,
)
from superresolution_def_tpu.data import ManifestEntry, write_manifest, write_tiff_u16


def _make_target(tmp_path, name="T1", n=40, lr=16, hr=64):
    rng = np.random.default_rng(0)
    root = tmp_path / "data" / name
    entries = []
    for i in range(n):
        d = root / "7_dataset_ready_LOG" / f"pair_{i:06d}"
        h = rng.random((hr, hr)) * 0.8
        write_tiff_u16(d / "hubble.tiff", h)
        write_tiff_u16(d / "observatory.tiff", h[::4, ::4])
        entries.append(
            ManifestEntry(f"pair_{i:06d}", str(d / "hubble.tiff"), str(d / "observatory.tiff"))
        )
    splits_dir = root / "8_dataset_split" / "splits_json"
    write_manifest(splits_dir / "train.json", entries[: n - 2])
    write_manifest(splits_dir / "val.json", entries[n - 2 : n - 1])
    write_manifest(splits_dir / "test.json", entries[n - 1 :])
    return tmp_path / "data"


def test_train_swin_run_end_to_end(tmp_path):
    data_root = _make_target(tmp_path)
    cfg = SwinTrainConfig(
        targets=("T1",),
        data_root=str(data_root),
        outputs_root=str(tmp_path / "outputs"),
        epochs=2,
        batch_size=1,
        accum_steps=2,
        img_size=16,
        embed_dim=16,
        depths=(1,),
        num_heads=(2,),
        use_vgg=False,
        max_steps_per_epoch=1,
    )
    last = train_swin_run(cfg)
    assert last["epoch"] == 2
    assert np.isfinite(last["loss_g"]) and np.isfinite(last["psnr"])
    run = tmp_path / "outputs" / "T1_DDP_SwinIR"
    assert (run / "checkpoints" / "latest_checkpoint").exists()
    assert (run / "metrics.csv").exists()
    assert (run / "images" / "epoch_002.png").exists()

    # resume continues from epoch 3
    cfg.epochs = 3
    last2 = train_swin_run(cfg, resume=True)
    assert last2["epoch"] == 3


def test_train_hat_run_warmup_and_artifacts(tmp_path):
    data_root = _make_target(tmp_path, name="T2")
    cfg = HATTrainConfig(
        targets=("T2",),
        data_root=str(data_root),
        outputs_root=str(tmp_path / "outputs"),
        epochs=1,
        warmup_epochs=30,  # epoch 1 is warmup
        batch_size=1,
        accum_steps=2,
        img_size=16,
        embed_dim=16,
        depths=(1,),
        num_heads=(2,),
        num_rrdb=1,
        num_feat=16,
        num_grow_ch=8,
        use_vgg=False,
        ckpt_interval=1,
        img_interval=1,
        csv_interval=1,
        max_steps_per_epoch=1,
    )
    last = train_hat_run(cfg)
    assert last["epoch"] == 1
    assert last["d_total"] == 0.0  # warmup: D untouched
    run = tmp_path / "outputs" / "T2"
    assert (run / "train_log.csv").exists()
    assert (run / "checkpoints" / "epoch_001").exists()
    assert (run / "previews" / "epoch_001_preview.png").exists()
