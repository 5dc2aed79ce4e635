"""Evaluate the RAW generator (not the EMA shadow) from a run's
latest_checkpoint on its test split — learning-proof companion.

The swin trainer's CSV follows the reference's EMA-shadow validation
(train_swin.py:277-300). On a BOUNDED proof run (tens of optimizer steps)
the 0.999-decay EMA is still mostly random init, so the CSV PSNR badly
lags what the generator actually learned. This script loads the raw
g_params from latest_checkpoint, evaluates test-split PSNR/SSIM, and
writes a Tris preview — the direct "did it learn" number.

Usage: python scripts/eval_raw_g.py RUN_DIR DATA_ROOT IMG_SIZE [OUT_DIR]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main() -> None:
    run_dir = Path(sys.argv[1])
    data_root = sys.argv[2]
    img_size = int(sys.argv[3])
    out_dir = Path(sys.argv[4]) if len(sys.argv) > 4 else run_dir / "raw_g_eval"
    out_dir.mkdir(parents=True, exist_ok=True)

    from superresolution_def_tpu.cli.trainers import _split_paths
    from superresolution_def_tpu.data import merge_manifests, PatchDataset
    from superresolution_def_tpu.cli.infer import _build_model_from_params
    from superresolution_def_tpu.ckpt.manager import restore_pytree
    from superresolution_def_tpu.ops.metrics import psnr as psnr_fn, ssim as ssim_fn
    from superresolution_def_tpu.obs.preview import save_tris_preview

    # shape-sniff the raw generator out of the latest checkpoint with the
    # same reconstructor the inference CLI uses
    raw = restore_pytree(run_dir / "checkpoints" / "latest_checkpoint")
    g = raw["state"]["g_params"]
    model = _build_model_from_params("swin", g)
    fwd = jax.jit(lambda p, x: jnp.clip(model.apply({"params": p}, x), 0.0, 1.0))

    class _Cfg:
        pass

    cfg = _Cfg()
    cfg.data_root, cfg.targets = data_root, ["SYN"]
    entries = merge_manifests(_split_paths(cfg, "test"), data_root)
    ds = PatchDataset(entries, img_size, img_size * 4)
    ps, ss = [], []
    prev = None
    for i in range(len(ds)):
        s = ds[i]
        lr = jnp.asarray(s["lr"][None].astype(np.float32) / 65535.0)
        hr = jnp.asarray(s["hr"][None].astype(np.float32) / 65535.0)
        sr = fwd(g, lr)
        ps.append(float(np.mean(np.asarray(psnr_fn(sr, hr)))))
        ss.append(float(np.mean(np.asarray(ssim_fn(sr, hr)))))
        if prev is None:
            prev = (np.asarray(lr[0]), np.asarray(sr[0]), np.asarray(hr[0]))
    save_tris_preview(out_dir / "raw_g_tris.png", *prev)
    result = {
        "raw_g_test_psnr": round(float(np.mean(ps)), 3),
        "raw_g_test_ssim": round(float(np.mean(ss)), 4),
        "num_images": len(ds),
        "note": "raw g_params from latest_checkpoint (EMA-shadow CSV lags "
                "on bounded runs; see artifacts README)",
    }
    (out_dir / "raw_g_eval.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
