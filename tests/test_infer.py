"""Inference CLI tests: checkpoint discovery, shape sniffing, tiling, run_test."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from superresolution_def_tpu.ckpt import CheckpointManager
from superresolution_def_tpu.cli.infer import (
    load_generator,
    run_test,
    targets_from_folder_name,
    tiled_sr,
    _build_model_from_params,
)
from superresolution_def_tpu.data import ManifestEntry, write_manifest, write_tiff_u16
from superresolution_def_tpu.train import create_swin_train_state



pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'

def _tiny_run(tmp_path, name="T1_DDP_SwinIR"):
    state, bundle = create_swin_train_state(
        jax.random.PRNGKey(0),
        img_size=16,
        upscale=4,
        embed_dim=16,
        depths=(2,),
        num_heads=(2,),
        window_size=8,
    )
    run_dir = tmp_path / "outputs" / name
    mgr = CheckpointManager(run_dir)
    mgr.save_best_params(state.ema, "best_gan_model")
    return state, bundle, run_dir


def test_targets_from_folder_name():
    assert targets_from_folder_name("M1_M33_DDP_SwinIR") == ["M1", "M33"]
    assert targets_from_folder_name("M42") == ["M42"]


def test_load_generator_orbax_and_shape_sniffing(tmp_path):
    state, bundle, run_dir = _tiny_run(tmp_path)
    apply_fn, params, info = load_generator(run_dir, "swin")
    assert info["format"] == "orbax"
    x = jnp.zeros((1, 16, 16, 1))
    out = apply_fn(params, x)
    assert out.shape == (1, 64, 64, 1)
    # sniffed model reproduces the bundle's forward exactly
    ref = bundle.g_apply({"params": state.ema}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_build_model_sniffs_config(tmp_path):
    state, _, _ = _tiny_run(tmp_path)
    m = _build_model_from_params("swin", state.g_params)
    assert m.embed_dim == 16 and m.depths == (2,) and m.num_heads == (2,)


def test_run_test_writes_artifacts(tmp_path):
    state, bundle, run_dir = _tiny_run(tmp_path)
    rng = np.random.default_rng(0)
    entries = []
    for i in range(3):
        d = tmp_path / "pairs" / f"p{i}"
        write_tiff_u16(d / "h.tiff", rng.random((64, 64)))
        write_tiff_u16(d / "g.tiff", rng.random((16, 16)))
        entries.append(ManifestEntry(f"p{i}", str(d / "h.tiff"), str(d / "g.tiff")))
    mpath = tmp_path / "test.json"
    write_manifest(mpath, entries)

    res = run_test(
        run_dir, "swin", manifest=str(mpath), lr_size=16, hr_size=64, write_csv=True
    )
    assert res["num_images"] == 3
    assert np.isfinite(res["psnr"])
    out = run_dir / "test_results"
    assert (out / "test_0000_sr.tiff").exists()
    assert (out / "test_0002_tris.png").exists()
    lines = (out / "test_metrics.csv").read_text().strip().splitlines()
    assert lines[0] == "ID,PSNR,SSIM" and len(lines) == 4


def test_tiled_sr_matches_local_op_exactly():
    """With a purely local SR op (nearest x4), tiling+blending must be exact."""

    def nearest4(params, x):
        return jnp.repeat(jnp.repeat(x, 4, axis=1), 4, axis=2)

    img = np.random.default_rng(1).random((80, 112)).astype(np.float32)
    out = tiled_sr(nearest4, {}, img, tile=48, overlap=8, scale=4)
    ref = np.repeat(np.repeat(img[..., None], 4, axis=0), 4, axis=1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_tiled_sr_small_input_pads():
    def nearest2(params, x):
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

    img = np.random.default_rng(2).random((20, 30)).astype(np.float32)
    out = tiled_sr(nearest2, {}, img, tile=32, overlap=4, scale=2)
    assert out.shape == (40, 60, 1)
    ref = np.repeat(np.repeat(img[..., None], 2, axis=0), 2, axis=1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_tiled_sr_mesh_parallel():
    """Tile batch sharded across the 8-device CPU mesh, exact vs local op."""
    from superresolution_def_tpu.parallel import make_mesh

    def nearest4(params, x):
        import jax.numpy as jnp

        return jnp.repeat(jnp.repeat(x, 4, axis=1), 4, axis=2)

    mesh = make_mesh()
    img = np.random.default_rng(3).random((96, 96)).astype(np.float32)
    out = tiled_sr(nearest4, {}, img, tile=48, overlap=8, scale=4, mesh=mesh)
    ref = np.repeat(np.repeat(img[..., None], 4, axis=0), 4, axis=1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_load_generator_from_torch_pth(tmp_path):
    """Reference-style .pth checkpoints load with module.-strip + sniffing."""
    import torch
    from tests._torch_ref import load_reference_swinir

    RefSwinIR = load_reference_swinir()
    torch.manual_seed(0)
    ref = RefSwinIR(upscale=4, in_chans=1, img_size=32, window_size=8,
                    depths=[2], embed_dim=60, num_heads=[6], mlp_ratio=2).eval()
    # reference trainer saves {'net_g': state_dict} with 'module.' prefixes
    sd = {"module." + k: v for k, v in ref.state_dict().items()}
    ck = tmp_path / "run" / "checkpoints"
    ck.mkdir(parents=True)
    torch.save({"net_g": sd, "epoch": 7}, ck / "best_gan_model.pth")

    apply_fn, params, info = load_generator(tmp_path / "run", "swin")
    assert info["format"] == "torch"
    assert info["detected"]["embed_dim"] == 60

    x = np.random.default_rng(5).random((1, 32, 32, 1)).astype(np.float32)
    ours = apply_fn(params, jnp.asarray(x))
    with torch.no_grad():
        expected = ref(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), expected.numpy(), atol=2e-4
    )


def test_run_test_fused_impl(tmp_path):
    """SwinIR inference through the fused whole-block kernel path."""
    from jax.experimental.pallas import tpu as pltpu

    state, bundle, run_dir = _tiny_run(tmp_path, name="TF_DDP_SwinIR")
    rng = np.random.default_rng(7)
    entries = []
    for i in range(2):
        d = tmp_path / "fp" / f"p{i}"
        write_tiff_u16(d / "h.tiff", rng.random((64, 64)))
        write_tiff_u16(d / "g.tiff", rng.random((16, 16)))
        entries.append(ManifestEntry(f"p{i}", str(d / "h.tiff"), str(d / "g.tiff")))
    mpath = tmp_path / "t.json"
    write_manifest(mpath, entries)

    with pltpu.force_tpu_interpret_mode():
        res = run_test(
            run_dir, "swin", manifest=str(mpath), lr_size=16, hr_size=64,
            impl="fused",
        )
    assert res["checkpoint"]["impl"] == "fused"
    assert res["num_images"] == 2 and np.isfinite(res["psnr"])
