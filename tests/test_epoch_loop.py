"""Fast-tier smoke of the rewired (prefetch-staged) epoch loop.

The production epoch loops in cli/trainers.py consume prefetch_to_mesh and
defer metric fetches; until round 5 their only coverage was the slow-tier
e2e tests. This drives train_swin_run for 1 epoch x 2 steps on the virtual
CPU mesh: the staged stream, the bounded-run-ahead sync, the deterministic
stream close on the max_steps early exit, and the epoch-end metric drain
all execute. (The analogous hat loop shares the same plumbing and keeps
its slow-tier e2e in tests/test_trainers.py.)
"""

import threading

import numpy as np

from superresolution_def_tpu.cli.trainers import SwinTrainConfig, train_swin_run
from superresolution_def_tpu.data import ManifestEntry, write_manifest, write_tiff_u16


def _make_target(tmp_path, name="T1", n=12, lr=8, hr=32):
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


def test_swin_epoch_loop_staged_stream_smoke(tmp_path):
    data_root = _make_target(tmp_path)
    cfg = SwinTrainConfig(
        targets=("T1",),
        data_root=str(data_root),
        outputs_root=str(tmp_path / "outputs"),
        epochs=1,
        batch_size=1,
        accum_steps=1,
        img_size=8,
        embed_dim=8,
        depths=(1,),
        num_heads=(2,),
        use_vgg=False,
        num_workers=2,
        max_steps_per_epoch=2,  # early exit exercises the stream close
    )
    last = train_swin_run(cfg)
    assert last["epoch"] == 1
    assert np.isfinite(last["loss_g"]) and np.isfinite(last["psnr"])
    run = tmp_path / "outputs" / "T1_DDP_SwinIR"
    assert (run / "metrics.csv").exists()
    # the early exit closed the staging thread deterministically — no
    # mesh-prefetch worker lingers holding staged batches
    assert not any(
        t.name == "mesh-prefetch" and t.is_alive() for t in threading.enumerate()
    )
