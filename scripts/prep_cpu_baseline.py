"""Reference-style CPU baseline for BASELINE config #5 (fused dataset prep).

Re-creates the torch reference's steps 3+4 *algorithmic structure* on the
host CPU — per-patch Python loop with one scipy bilinear reprojection per
patch (the astropy-free equivalent of `reproject_interp` per patch,
Dataset_step3_extractpatches.py:223-284) and the two-pass normalization
with a torch DataLoader used as a CPU pixel sampler
(Dataset_step4_normalization.py:51-93,151-183) — over the SAME synthetic
registered sky that `bench.py --mode prep` uses, so the pairs/s numbers
are directly comparable. No reference code is imported or copied; this is
a from-scratch re-expression of the documented per-patch flow.

Prints ONE JSON line: {"metric": "prep_cpu_baseline_pairs_per_sec", ...}.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# host-CPU baseline: keep jax off the TPU (sitecustomize force-registers the
# axon plugin; the env var alone is ignored — in-process update required)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from superresolution_def_tpu.prep import TanWCS, write_fits, read_fits  # noqa: E402
from superresolution_def_tpu.prep.reproject import reproject_bilinear  # noqa: E402

HR_SIZE, LR_SIZE, STRIDE = 512, 128, 128
MIN_COVERAGE, MIN_PIXEL_VALUE = 0.50, 1e-4
SAMPLES_PER_IMAGE, MIN_VALID = 4000, 1e-5
P_LO, P_HI = 4.0, 99.99


def reproject_patch_cpu(data_o: np.ndarray, wcs_o: TanWCS, lr_wcs: TanWCS,
                        shape: tuple[int, int]) -> np.ndarray:
    """One patch at a time: output pixel grid -> world -> input pixel ->
    scipy bilinear sample (the reproject_interp-per-patch structure)."""
    from scipy.ndimage import map_coordinates

    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w]
    ra, dec = lr_wcs.pixel_to_world(xx.ravel(), yy.ravel())
    px, py = wcs_o.world_to_pixel(ra, dec)
    out = map_coordinates(
        np.asarray(data_o, np.float64), [py, px], order=1, mode="constant",
        cval=np.nan,
    )
    return out.reshape(h, w).astype(np.float32)


def run_step3_cpu(hub_dir: Path, obs_dir: Path, out_dir: Path) -> int:
    h_img = read_fits(sorted(hub_dir.glob("reg_*.fits"))[0])
    d_h = np.nan_to_num(h_img.data)
    w_h = TanWCS.from_header(h_img.header)
    o_img = read_fits(sorted(obs_dir.glob("reg_*.fits"))[0])
    d_o = np.nan_to_num(o_img.data)
    w_o = TanWCS.from_header(o_img.header)

    out_dir.mkdir(parents=True, exist_ok=True)
    hh, ww = d_h.shape
    idx = 0
    for y in range(0, hh - HR_SIZE + 1, STRIDE):
        for x in range(0, ww - HR_SIZE + 1, STRIDE):
            patch_h = d_h[y : y + HR_SIZE, x : x + HR_SIZE]
            if np.sum(patch_h > MIN_PIXEL_VALUE) < HR_SIZE * HR_SIZE * MIN_COVERAGE:
                continue
            patch_wcs = w_h.slice(y, x)
            lr_wcs = patch_wcs.scaled_lr(HR_SIZE / LR_SIZE)
            patch_o = np.nan_to_num(
                reproject_patch_cpu(d_o, w_o, lr_wcs, (LR_SIZE, LR_SIZE))
            )
            if np.sum(patch_o > MIN_PIXEL_VALUE) < LR_SIZE * LR_SIZE * MIN_COVERAGE:
                continue
            pd = out_dir / f"pair_{idx:06d}"
            pd.mkdir(exist_ok=True)
            write_fits(pd / "hubble.fits", patch_h.astype(np.float32),
                       patch_wcs.to_header())
            write_fits(pd / "observatory.fits", patch_o, lr_wcs.to_header())
            idx += 1
    return idx


def run_step4_cpu(pairs_dir: Path, out_dir: Path) -> int:
    """Two-pass normalization with a torch DataLoader pixel sampler (the
    reference's step-4 structure) and per-pair numpy log1p/clip/u16."""
    import torch
    from torch.utils.data import DataLoader, Dataset
    from PIL import Image

    pair_dirs = sorted(pairs_dir.glob("pair_*"))

    class RawFitsSampler(Dataset):
        def __init__(self, paths):
            self.paths = paths

        def __len__(self):
            return len(self.paths)

        def __getitem__(self, i):
            data = np.nan_to_num(read_fits(self.paths[i]).data).ravel()
            valid = data[data > MIN_VALID]
            if valid.size > SAMPLES_PER_IMAGE:
                sel = np.random.default_rng(i).choice(
                    valid.size, SAMPLES_PER_IMAGE, replace=False
                )
                valid = valid[sel]
            return torch.from_numpy(np.log1p(np.maximum(valid, 0.0)))

    def stats(paths):
        dl = DataLoader(RawFitsSampler(paths), batch_size=32, num_workers=0,
                        collate_fn=lambda b: torch.cat(b))
        allpx = torch.cat(list(dl)).numpy()
        return np.percentile(allpx, P_LO), np.percentile(allpx, P_HI)

    hr_lo, hr_hi = stats([d / "hubble.fits" for d in pair_dirs])
    lr_lo, lr_hi = stats([d / "observatory.fits" for d in pair_dirs])

    n = 0
    for d in pair_dirs:
        for name, lo, hi in (("hubble", hr_lo, hr_hi),
                             ("observatory", lr_lo, lr_hi)):
            raw = np.nan_to_num(read_fits(d / f"{name}.fits").data)
            v = np.log1p(np.maximum(raw, 0.0))
            v = np.clip((v - lo) / (hi - lo + 1e-8), 0.0, 1.0)
            u16 = (v * 65535.0).astype(np.uint16)
            pd = out_dir / d.name
            pd.mkdir(parents=True, exist_ok=True)
            Image.fromarray(u16, mode="I;16").save(pd / f"{name}.tiff")
        n += 1
    return n


def main() -> None:
    # identical synthetic sky to bench.py::bench_prep
    size, scale = 2048, 2e-4
    rng = np.random.default_rng(0)
    sky = (rng.random((size, size)) * 0.6 + 0.2).astype(np.float32)
    w_h = TanWCS((10.0, 20.0), (size / 2, size / 2), cdelt=[-scale, scale])
    tmp = Path(tempfile.mkdtemp(prefix="prep_cpu_baseline_"))
    (tmp / "hub").mkdir(); (tmp / "obs").mkdir()
    write_fits(tmp / "hub" / "reg_h.fits", sky, w_h.to_header())
    w_o = TanWCS((10.0, 20.0), (size / 8, size / 8), cdelt=[-scale * 4, scale * 4])
    obs = np.nan_to_num(reproject_bilinear(sky, w_h, w_o, (size // 4, size // 4)))
    write_fits(tmp / "obs" / "reg_o.fits", obs, w_o.to_header())

    t0 = time.perf_counter()
    n = run_step3_cpu(tmp / "hub", tmp / "obs", tmp / "pairs")
    m = run_step4_cpu(tmp / "pairs", tmp / "ready")
    dt = time.perf_counter() - t0

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({
        "metric": "prep_cpu_baseline_pairs_per_sec",
        "value": round(m / dt, 3),
        "unit": "pairs/s",
        "pairs": m,
        "seconds": round(dt, 2),
        "note": "reference-structure per-patch scipy reprojection + torch "
                "DataLoader sampling on host CPU; same synthetic sky as "
                "bench.py --mode prep",
    }))
    assert n == m


if __name__ == "__main__":
    main()
