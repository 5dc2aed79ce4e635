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



pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'

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


def test_load_pretrained_hat_seeds_backbone(tmp_path):
    """--pretrained_hat intent: HAT-only .pth seeds the hybrid backbone."""
    import torch
    import jax
    import numpy as np
    from tests._torch_ref import load_reference_hat
    from superresolution_def_tpu.train import create_hat_train_state
    from superresolution_def_tpu.cli.trainers import _load_pretrained_hat
    from superresolution_def_tpu.models.torch_port import hat_from_torch

    RefHAT = load_reference_hat()
    torch.manual_seed(0)
    ref = RefHAT(img_size=16, in_chans=1, embed_dim=30, depths=(1,), num_heads=(6,),
                 window_size=8, upscale=2, upsampler="pixelshuffle", img_range=1.0)
    pth = tmp_path / "hat_only.pth"
    torch.save(ref.state_dict(), pth)

    state, bundle = create_hat_train_state(
        jax.random.PRNGKey(0), img_size=16, embed_dim=30, depths=(1,),
        num_heads=(6,), window_size=8, num_rrdb=1, num_feat=16, num_grow_ch=8,
    )

    class Cfg:
        depths = (1,)

    new_g = _load_pretrained_hat(str(pth), state.g_params, Cfg)
    expect = hat_from_torch({k: v.numpy() for k, v in ref.state_dict().items()}, (1,))
    a = np.asarray(jax.tree_util.tree_leaves(new_g["hat"])[0])
    b = np.asarray(jax.tree_util.tree_leaves(expect)[0])
    np.testing.assert_array_equal(a, b)
    # non-HAT parts untouched
    c = jax.tree_util.tree_leaves(new_g["conv_adapt"])[0]
    d = jax.tree_util.tree_leaves(state.g_params["conv_adapt"])[0]
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))
    # the hybrid still runs with the seeded backbone
    out = bundle.g_apply({"params": new_g}, jax.numpy.zeros((1, 16, 16, 1)), True)
    assert out.shape == (1, 64, 64, 1)
