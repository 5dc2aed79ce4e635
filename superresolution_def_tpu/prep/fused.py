"""Single-dispatch fused dataset prep — BASELINE config #5's hot path.

The reference runs steps 3+4 as per-patch CPU loops: one `reproject_interp`
per patch (Dataset_step3_extractpatches.py:247-252) and a two-pass
DataLoader-sampled normalization (Dataset_step4_normalization.py:51-93,
151-183). The step-wise TPU port (`extract_patches` + `normalize_target`)
already batches the device math, but still moves every patch across the
host<->device link several times (f32 both ways), which dominates wall
time on links slower than PCIe (measured: the batched-per-stage path
spends >40 s of a 50 s run in transfers over the axon tunnel).

This module runs the whole LR pipeline as jitted device programs with the
data resident on device throughout:

    phase 1, one dispatch per observatory frame:
      upload source frame + sampling grids once
      -> bilinear reprojection of every candidate patch (vmapped gather)
      -> coverage filter (Dataset_step3:255-257 semantics)
      (patches STAY on device)
    phase 2, one dispatch per target:
      concatenate every frame's device-resident patches
      -> per-TARGET percentiles over the kept patches' valid pixels
         (log-stretched, > MIN_VALID, multiset over all kept pairs —
          the same population the staged normalize_target reads from
          6_patches_final)
      -> log1p -> affine normalize -> clip -> uint16
    download the final uint16 patches (+ the raw f32 patches only when
    FITS pairs are requested).

The HR stream never needs the device at all — its patches are slices of a
frame already in host memory, and normalization is elementwise — so it
runs as vectorized numpy on the host, overlapping the device round-trip.
HR per-target stats are reference-true SAMPLED percentiles: each written
hubble.fits copy contributes at most 4000 randomly-chosen valid pixels to
the pool, exactly Dataset_step4_normalization.py:51-67 (see
``_hr_host_stats`` — this replaced an exact all-pixel host percentile in
round 4; the exact sort over 169x512² px cost ~5 s/run), and the HR
quantize runs inside the writer pool, overlapped with the TIFF IO.
FITS pairs (6_patches_final layout) and uint16 TIFFs (7_dataset_ready_LOG
layout) are written exactly like the step-wise path.

Documented deviation from the step-wise path: the LR stream's percentile
stats are exact (over ALL valid pixels of the kept patches, computed on
device in ``_lr_normalize_program``) instead of the reference's
4000-px-per-image subsample (Dataset_step4:26,75-80) — the subsample
exists only to keep a CPU pass cheap; with the LR data already on device
the exact reduction is cheaper than the sampling bookkeeping. The
step-wise `normalize_target` keeps the sampled semantics for both streams.
"""

from __future__ import annotations

import functools
import math
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from .fits import read_fits, write_fits
from .wcs import TanWCS
from .reproject import source_pixel_grid
from .patches import (
    HR_SIZE,
    AI_LR_SIZE,
    MIN_COVERAGE,
    MIN_PIXEL_VALUE,
    calculate_stride_for_target,
)
from .normalize_pipeline import (
    MIN_VALID,
    BLACK_CLIP_PERCENTILE,
    WHITE_CLIP_PERCENTILE,
)
from ..data.tiff import write_tiff_u16


def _masked_percentiles(v, mask, pcts):
    """np.percentile('linear') over v[mask], jit-safe with static shapes.

    Invalid entries sort to +inf; the virtual index is computed against the
    valid count and linearly interpolated, exactly like numpy's default.
    """
    flat = jnp.where(mask, v, jnp.inf).ravel()
    srt = jnp.sort(flat)
    n = jnp.sum(mask)
    out = []
    for p in pcts:
        pos = (n - 1).astype(jnp.float32) * (p / 100.0)
        lo_i = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, flat.size - 1)
        hi_i = jnp.clip(lo_i + 1, 0, flat.size - 1)
        frac = pos - lo_i.astype(jnp.float32)
        lo_v = srt[lo_i]
        hi_v = jnp.where(hi_i < n, srt[hi_i], lo_v)  # don't touch the infs
        out.append(lo_v + (hi_v - lo_v) * frac)
    return out


def _bilinear_gather(src, px, py):
    h, w = src.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx, fy = px - x0, py - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)

    def at(yy, xx):
        return src[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]

    out = (
        at(y0i, x0i) * (1 - fy) * (1 - fx)
        + at(y0i, x0i + 1) * (1 - fy) * fx
        + at(y0i + 1, x0i) * fy * (1 - fx)
        + at(y0i + 1, x0i + 1) * fy * fx
    )
    eps = 1e-3
    inside = (px >= -eps) & (px <= w - 1 + eps) & (py >= -eps) & (py <= h - 1 + eps)
    return jnp.where(inside, out, 0.0)  # reproject-NaN -> nan_to_num fused


@jax.jit
def _lr_reproject_program(src, pxs, pys):
    """(N,h,w) reprojection + coverage keep; patches stay device-resident."""
    patches = jax.vmap(lambda p, q: _bilinear_gather(src, p, q))(pxs, pys)
    n_px = patches.shape[1] * patches.shape[2]
    keep = (
        jnp.sum(patches > MIN_PIXEL_VALUE, axis=(1, 2)) >= n_px * MIN_COVERAGE
    )
    return patches, keep


@jax.jit
def _lr_normalize_program(stack, keep):
    """Per-TARGET stats + quantization over ALL frames' kept patches.

    ``stack``: (M,h,w) every frame's reprojected patches concatenated
    (device-resident, no re-upload); ``keep``: (M,) the per-frame coverage
    masks. Stats run over the kept patches' valid pixels only — one (lo,hi)
    per target, matching the staged `normalize_target` (which reads only
    the kept pairs written to 6_patches_final)."""
    v = jnp.log1p(jnp.maximum(stack, 0.0))
    mask = (stack > MIN_VALID) & keep[:, None, None]
    lo, hi = _masked_percentiles(
        v, mask, (BLACK_CLIP_PERCENTILE, WHITE_CLIP_PERCENTILE)
    )
    v01 = jnp.clip((v - lo) / (hi - lo + 1e-8), 0.0, 1.0)
    # truncation, matching the reference's `(v*65535).astype(uint16)`
    u16 = (v01 * 65535.0).astype(jnp.uint16)
    return u16, lo, hi


def _hr_host_stats(hr_v, hr_valid, counts, *, seed: int = 0):
    """Per-target HR percentile stats over the kept-pair multiset.

    Reference-true sampling (Dataset_step4_normalization.py:51-67, same
    as the staged ``calculate_robust_stats``): each written hubble.fits
    copy contributes at most SAMPLES_PER_IMAGE randomly chosen valid
    pixels to the percentile pool — ``counts[c]`` copies of candidate
    ``c`` draw independently, like step 4 reading one file per kept
    (frame, patch) pair. This replaced an exact all-pixel percentile
    (~5 s of host sort over 169x512² in the config-#5 bench; the
    sampled pool is ~700 k px and costs ~0.3 s)."""
    from .normalize_pipeline import SAMPLES_PER_IMAGE

    rng = np.random.default_rng(seed)
    chunks = []
    for c, k in enumerate(counts):
        if k <= 0:
            continue
        valid = hr_v[c][hr_valid[c]]
        for _ in range(int(k)):
            if valid.size > SAMPLES_PER_IMAGE:
                chunks.append(rng.choice(valid, SAMPLES_PER_IMAGE, replace=False))
            else:
                chunks.append(valid)
    pool = np.concatenate(chunks) if chunks else np.zeros((0,), np.float32)
    if pool.size:
        lo, hi = np.percentile(
            pool, (BLACK_CLIP_PERCENTILE, WHITE_CLIP_PERCENTILE)
        )
    else:
        lo, hi = 0.0, 1.0
    return float(lo), float(hi)


def _quantize_hr(hr_v_c, lo: float, hi: float) -> np.ndarray:
    """One candidate's stretched HR slice -> u16 (runs in the writer pool;
    numpy ufuncs drop the GIL so this overlaps the file IO)."""
    v01 = np.clip((hr_v_c - lo) / (hi - lo + 1e-8), 0.0, 1.0)
    return (v01 * 65535.0).astype(np.uint16)


class _WriterPool:
    """Async file-writer pool overlapping host IO with device compute.

    File writes release the GIL in the write syscall and PIL/FITS encode
    paths, so a small thread pool lets the pair writes proceed while the
    main thread blocks on device downloads (and, on multi-core hosts,
    parallelizes the encode itself). ``drain()`` re-raises the first
    failure so IO errors are not silently swallowed.
    """

    def __init__(self, workers: int = 4):
        self._pool = ThreadPoolExecutor(max_workers=workers)
        self._futs = []

    def submit(self, fn, *a) -> None:
        self._futs.append(self._pool.submit(fn, *a))

    def drain(self) -> None:
        for f in self._futs:
            f.result()
        self._futs.clear()
        self._pool.shutdown()


def _write_pair_fits(pd: Path, hr, lr, hdr_h, hdr_l) -> None:
    # f32 casts run here, in the pool thread, not on the dispatch thread
    pd.mkdir(exist_ok=True)
    write_fits(pd / "hubble.fits", np.asarray(hr, np.float32), hdr_h)
    write_fits(pd / "observatory.fits", np.asarray(lr, np.float32), hdr_l)


def _write_pair_tiff(rd: Path, hr_u16, lr_u16) -> None:
    rd.mkdir(exist_ok=True)
    write_tiff_u16(rd / "hubble.tiff", hr_u16)
    write_tiff_u16(rd / "observatory.tiff", lr_u16)


def _quantize_write_pair_tiff(rd: Path, hr_v_c, lo, hi, lr_u16) -> None:
    _write_pair_tiff(rd, _quantize_hr(hr_v_c, lo, hi), lr_u16)


def fused_prep_target(
    hubble_reg_dir: str | Path,
    obs_reg_dir: str | Path,
    pairs_dir: str | Path,
    ready_dir: str | Path,
    *,
    target_name: str = "",
    desired_count: int | None = None,
    stride: int | None = None,
    hr_size: int = HR_SIZE,
    lr_size: int = AI_LR_SIZE,
    write_fits_pairs: bool = True,
    log=print,
) -> int:
    """Steps 3+4 fused: registered frames -> FITS pairs + uint16 TIFF pairs.

    Returns the number of pairs written. Produces the same on-disk layouts
    as `extract_patches` + `normalize_target` (6_patches_final pair dirs
    when ``write_fits_pairs`` and the 7_dataset_ready_LOG TIFF dirs).
    """
    pairs_dir, ready_dir = Path(pairs_dir), Path(ready_dir)
    pairs_dir.mkdir(parents=True, exist_ok=True)
    ready_dir.mkdir(parents=True, exist_ok=True)
    h_files = sorted(Path(hubble_reg_dir).glob("reg_*.fits"))
    o_files = sorted(Path(obs_reg_dir).glob("reg_*.fits"))
    if not h_files or not o_files:
        log("[fused-prep] missing registered frames")
        return 0
    if stride is None:
        stride = calculate_stride_for_target(target_name, desired_count)

    h_img = read_fits(h_files[0])
    d_h = np.nan_to_num(h_img.data)
    w_h = TanWCS.from_header(h_img.header)
    h_center = w_h.crval

    # candidate grid, HR-coverage-filtered on host (slices of resident data)
    hh, ww = d_h.shape
    candidates, cand_wcs = [], []
    for y in range(0, hh - hr_size + 1, stride):
        for x in range(0, ww - hr_size + 1, stride):
            patch = d_h[y : y + hr_size, x : x + hr_size]
            if np.count_nonzero(patch > MIN_PIXEL_VALUE) < patch.size * MIN_COVERAGE:
                continue
            pw = w_h.slice(y, x)
            candidates.append((y, x))
            cand_wcs.append((pw, pw.scaled_lr(hr_size / lr_size)))
    if not candidates:
        log("[fused-prep] no candidates above coverage")
        return 0
    log(f"[fused-prep] stride={stride}: {len(candidates)} candidates")

    t0 = time.perf_counter()

    # HR host work is frame-invariant — do it ONCE, overlapping the device
    # dispatches below (stats need the per-frame keeps, quantization waits)
    hr_stack = np.stack(
        [d_h[y : y + hr_size, x : x + hr_size] for y, x in candidates]
    )
    hr_v = np.log1p(np.maximum(hr_stack, 0.0))
    hr_valid = hr_stack > MIN_VALID
    t_hr = time.perf_counter()

    # Phase 1 — one reprojection dispatch per frame; patches stay on device.
    # Dispatch is async: while the device reprojects frame i, the host
    # builds frame i+1's sampling grids (the natural double-buffer).
    frames = []  # (o_file, dev_patches, dev_keep)
    for o_file in o_files:
        try:
            o_img = read_fits(o_file)
            w_o = TanWCS.from_header(o_img.header)
        except Exception as e:
            log(f"[fused-prep] unreadable {o_file.name}: {e}")
            continue
        dist = math.sqrt(
            (w_o.crval[0] - h_center[0]) ** 2 + (w_o.crval[1] - h_center[1]) ** 2
        )
        if dist >= 0.1:  # reference distance filter (Dataset_step3:401-409)
            continue
        d_o = np.nan_to_num(o_img.data)
        grids = [
            source_pixel_grid(w_o, lrw, (lr_size, lr_size))
            for _, lrw in cand_wcs
        ]
        pxs = np.stack([g[0] for g in grids])
        pys = np.stack([g[1] for g in grids])
        patches, keep = _lr_reproject_program(
            jnp.asarray(d_o), jnp.asarray(pxs), jnp.asarray(pys)
        )
        frames.append((o_file, patches, keep))
    if not frames:
        log("[fused-prep] no observatory frames within 0.1 deg")
        return 0

    # Phase 2 — ONE per-target stats+quantize dispatch over the
    # device-resident concatenation of every frame's patches (staged
    # parity: normalize_target computes one (lo,hi) per target/stream).
    # Enqueued BEFORE any download so the device pipeline never drains.
    lr_u16_dev, lr_lo_dev, lr_hi_dev = _lr_normalize_program(
        jnp.concatenate([p for _, p, _ in frames]),
        jnp.concatenate([k for _, _, k in frames]),
    )
    t_p1 = time.perf_counter()

    # While the device runs the stats program: download per-frame keeps and
    # raw LR patches, assign pair names, and start the FITS writes on the
    # writer pool (they depend only on phase-1 results). The HR host
    # quantization overlaps the same window.
    pool = _WriterPool()
    idx = 0
    keeps = []
    pair_names: list[list[str | None]] = []  # [frame][candidate] -> name
    for o_file, patches, keep in frames:
        keep = np.asarray(keep)
        keeps.append(keep)
        # raw LR f32 patches leave the device only if FITS pairs are wanted
        lr_raw = np.asarray(patches) if write_fits_pairs else None
        log(f"[fused-prep] {o_file.name}: keep {int(keep.sum())}")
        names: list[str | None] = []
        for ci, ((y, x), (pw, lrw)) in enumerate(zip(candidates, cand_wcs)):
            if not keep[ci]:
                names.append(None)
                continue
            name = f"pair_{idx:06d}"
            names.append(name)
            if write_fits_pairs:
                pool.submit(
                    _write_pair_fits, pairs_dir / name,
                    hr_stack[ci], lr_raw[ci],
                    pw.to_header(), lrw.to_header(),
                )
            idx += 1
        pair_names.append(names)
    counts = np.sum(keeps, axis=0)
    hr_lo, hr_hi = _hr_host_stats(hr_v, hr_valid, counts)
    t_fits = time.perf_counter()

    # Quantized LR download (blocks until the stats program lands), then
    # the TIFF writes stream through the same pool — each task quantizes
    # its HR slice in the pool thread (ufuncs drop the GIL) right before
    # writing, so the 169x512² stretch never runs as a serial pass.
    lr_u16_all = np.asarray(lr_u16_dev)
    lr_lo, lr_hi = float(lr_lo_dev), float(lr_hi_dev)
    log(
        f"[fused-prep] target stats over {len(frames)} frame(s): "
        f"hr[{hr_lo:.5f},{hr_hi:.5f}] lr[{lr_lo:.5f},{lr_hi:.5f}]"
    )
    t_p2 = time.perf_counter()

    n_cand = len(candidates)
    for fi in range(len(frames)):
        lr_u16 = lr_u16_all[fi * n_cand : (fi + 1) * n_cand]
        for ci, name in enumerate(pair_names[fi]):
            if name is None:
                continue
            pool.submit(
                _quantize_write_pair_tiff, ready_dir / name,
                hr_v[ci], hr_lo, hr_hi, lr_u16[ci],
            )
    pool.drain()
    t_end = time.perf_counter()
    log(
        f"[fused-prep] wrote {idx} pairs in {t_end - t0:.2f}s "
        f"(hr-host {t_hr - t0:.2f}s, dispatches {t_p1 - t_hr:.2f}s, "
        f"fits-enqueue+hr-stats {t_fits - t_p1:.2f}s, "
        f"lr-download {t_p2 - t_fits:.2f}s, tiff-quant+drain {t_end - t_p2:.2f}s)"
    )
    return idx
