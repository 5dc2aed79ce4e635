"""Checkpoint manager + logger/preview tests."""

import csv

import numpy as np
import jax
import jax.numpy as jnp

from superresolution_def_tpu.ckpt import CheckpointManager, save_pytree, restore_pytree
from superresolution_def_tpu.obs import (
    CSVLogger,
    SWIN_CSV_COLUMNS,
    save_tris_preview,
    to_u8,
)
from superresolution_def_tpu.train import create_swin_train_state


def _tiny_state():
    return create_swin_train_state(
        jax.random.PRNGKey(0),
        img_size=16,
        upscale=4,
        embed_dim=16,
        depths=(1,),
        num_heads=(2,),
        window_size=8,
    )


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}, "n": 7}
    save_pytree(tmp_path / "t", tree)
    back = restore_pytree(tmp_path / "t", tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.arange(4.0))
    assert back["n"] == 7


def test_checkpoint_latest_resume_and_best(tmp_path):
    state, _ = _tiny_state()
    mgr = CheckpointManager(tmp_path / "run")
    assert mgr.restore_latest(state) is None

    mgr.save_latest(state, epoch=5, best_psnr=31.5)
    restored, start_epoch, best = mgr.restore_latest(state)
    assert start_epoch == 6 and abs(best - 31.5) < 1e-6
    a = jax.tree_util.tree_leaves(state.g_params)[0]
    b = jax.tree_util.tree_leaves(restored.g_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    mgr.save_best_params(state.ema)
    ema_back = mgr.restore_params("best_gan_model", state.ema)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(ema_back)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.ema)[0]),
    )


def test_epoch_fallback_resume(tmp_path):
    state, _ = _tiny_state()
    mgr = CheckpointManager(tmp_path / "run")
    mgr.save_epoch(state, epoch=5)
    mgr.save_epoch(state, epoch=10)
    _, start_epoch, _ = mgr.restore_latest(state)
    assert start_epoch == 11  # newest epoch_NNN wins


def test_csv_logger_schema(tmp_path):
    p = tmp_path / "metrics.csv"
    log = CSVLogger(p, SWIN_CSV_COLUMNS)
    log.log({"Epoch": 1, "Loss_G": 0.5, "Loss_D": 0.2, "PSNR": 30.1, "SSIM": 0.9, "Time_Sec": 12})
    rows = list(csv.reader(open(p)))
    assert rows[0] == SWIN_CSV_COLUMNS
    assert rows[1][0] == "1" and rows[1][3] == "30.1"


def test_tris_preview(tmp_path):
    rng = np.random.default_rng(0)
    lr = rng.random((16, 16))
    sr = rng.random((64, 64, 1))
    hr = rng.random((64, 64))
    out = tmp_path / "prev.png"
    save_tris_preview(out, lr, sr, hr)
    from PIL import Image

    img = np.array(Image.open(out))
    assert img.shape == (64, 192)
    assert to_u8(np.ones((4, 4))).max() == 255
