"""Fused single-dispatch prep (prep/fused.py) vs the staged pipeline."""

from pathlib import Path

import numpy as np
import pytest

from superresolution_def_tpu.prep import (
    TanWCS,
    write_fits,
    extract_patches,
    normalize_target,
    fused_prep_target,
    reproject_bilinear,
)
from superresolution_def_tpu.prep.fits import read_fits
from superresolution_def_tpu.data import read_tiff_u16


@pytest.fixture(scope="module")
def synth_sky(tmp_path_factory):
    """Small registered synthetic sky (same construction as bench_prep)."""
    tmp = tmp_path_factory.mktemp("sky")
    size, scale = 1024, 2e-4
    rng = np.random.default_rng(0)
    sky = (rng.random((size, size)) * 0.6 + 0.2).astype(np.float32)
    w_h = TanWCS((10.0, 20.0), (size / 2, size / 2), cdelt=[-scale, scale])
    (tmp / "hub").mkdir()
    (tmp / "obs").mkdir()
    write_fits(tmp / "hub" / "reg_h.fits", sky, w_h.to_header())
    w_o = TanWCS(
        (10.0, 20.0), (size / 8, size / 8), cdelt=[-scale * 4, scale * 4]
    )
    obs = np.nan_to_num(
        reproject_bilinear(sky, w_h, w_o, (size // 4, size // 4))
    )
    write_fits(tmp / "obs" / "reg_o.fits", obs, w_o.to_header())
    return tmp


def test_fused_matches_staged(synth_sky, tmp_path):
    n_staged = extract_patches(
        synth_sky / "hub", synth_sky / "obs", tmp_path / "pairs_s",
        stride=128, hr_size=512, lr_size=128, log=lambda *a: None,
    )
    m_staged = normalize_target(
        tmp_path / "pairs_s", tmp_path / "ready_s", log=lambda *a: None
    )
    n_fused = fused_prep_target(
        synth_sky / "hub", synth_sky / "obs",
        tmp_path / "pairs_f", tmp_path / "ready_f",
        stride=128, hr_size=512, lr_size=128, log=lambda *a: None,
    )
    assert n_staged == m_staged == n_fused > 0

    for i in range(n_fused):
        name = f"pair_{i:06d}"
        # FITS pairs: raw f32 patches and headers identical
        for f in ("hubble.fits", "observatory.fits"):
            a = read_fits(tmp_path / "pairs_s" / name / f)
            b = read_fits(tmp_path / "pairs_f" / name / f)
            np.testing.assert_allclose(b.data, a.data, rtol=0, atol=1e-6)
            assert b.header["CRVAL1"] == a.header["CRVAL1"]
        # TIFFs: same quantization up to the stats difference (both sides
        # use the reference's 4000-px-per-file subsample, but the draws
        # differ: staged samples decoded FITS files, fused samples the
        # resident stacks; LR-side fused stats are exact device
        # percentiles — documented deviation, tighter than sampling)
        for f in ("hubble.tiff", "observatory.tiff"):
            a = read_tiff_u16(tmp_path / "ready_s" / name / f).astype(np.int32)
            b = read_tiff_u16(tmp_path / "ready_f" / name / f).astype(np.int32)
            # same normalization family: monotone, near-identical scale
            assert abs(a.mean() - b.mean()) < 65535 * 0.02
            assert np.abs(a - b).mean() < 65535 * 0.02


def test_fused_exact_percentiles_match_numpy(synth_sky, tmp_path):
    """The device masked-percentile matches np.percentile('linear') exactly
    when the staged path is given the full pixel population (no sampling)."""
    import superresolution_def_tpu.prep.fused as F
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    v = rng.random((7, 33)).astype(np.float32)
    mask = rng.random((7, 33)) > 0.3
    lo, hi = F._masked_percentiles(
        jnp.asarray(v), jnp.asarray(mask), (4.0, 99.99)
    )
    ref = np.percentile(v[mask], (4.0, 99.99))
    np.testing.assert_allclose(
        [float(lo), float(hi)], ref, rtol=1e-5, atol=1e-6
    )


def test_fused_skips_low_coverage(tmp_path):
    """Patches below MIN_COVERAGE on the LR side are dropped, like the
    staged extractor (Dataset_step3:255-257 semantics)."""
    size, scale = 1024, 2e-4
    sky = np.zeros((size, size), np.float32)
    sky[: size // 2] = 0.5  # top half valid only
    w_h = TanWCS((10.0, 20.0), (size / 2, size / 2), cdelt=[-scale, scale])
    (tmp_path / "hub").mkdir()
    (tmp_path / "obs").mkdir()
    write_fits(tmp_path / "hub" / "reg_h.fits", sky, w_h.to_header())
    w_o = TanWCS(
        (10.0, 20.0), (size / 8, size / 8), cdelt=[-scale * 4, scale * 4]
    )
    obs = np.nan_to_num(
        reproject_bilinear(sky, w_h, w_o, (size // 4, size // 4))
    )
    write_fits(tmp_path / "obs" / "reg_o.fits", obs, w_o.to_header())
    n_fused = fused_prep_target(
        tmp_path / "hub", tmp_path / "obs",
        tmp_path / "pairs", tmp_path / "ready",
        stride=128, hr_size=512, lr_size=128, log=lambda *a: None,
    )
    n_staged = extract_patches(
        tmp_path / "hub", tmp_path / "obs", tmp_path / "pairs_s",
        stride=128, hr_size=512, lr_size=128, log=lambda *a: None,
    )
    assert n_fused == n_staged


def test_fused_multiframe_per_target_stats(synth_sky, tmp_path):
    """With 2+ observatory frames, normalization stats are per TARGET, not
    per frame: a frame at half intensity must come out darker, not be
    re-stretched to its own range (round-3 review finding)."""
    import shutil

    sky2 = tmp_path / "sky2"
    shutil.copytree(synth_sky, sky2)
    a = read_fits(sky2 / "obs" / "reg_o.fits")
    write_fits(sky2 / "obs" / "reg_o2.fits", a.data * 0.5, a.header)

    n_staged = extract_patches(
        sky2 / "hub", sky2 / "obs", tmp_path / "pairs_s",
        stride=128, hr_size=512, lr_size=128, log=lambda *a: None,
    )
    m_staged = normalize_target(
        tmp_path / "pairs_s", tmp_path / "ready_s", log=lambda *a: None
    )
    n_fused = fused_prep_target(
        sky2 / "hub", sky2 / "obs",
        tmp_path / "pairs_f", tmp_path / "ready_f",
        stride=128, hr_size=512, lr_size=128, log=lambda *a: None,
    )
    assert n_staged == m_staged == n_fused > 0
    assert n_fused % 2 == 0  # every candidate kept by both frames

    half = n_fused // 2
    bright = dark = 0.0
    for i in range(n_fused):
        name = f"pair_{i:06d}"
        # raw FITS identical to the staged extractor, both frames
        for f in ("hubble.fits", "observatory.fits"):
            sa = read_fits(tmp_path / "pairs_s" / name / f)
            fb = read_fits(tmp_path / "pairs_f" / name / f)
            np.testing.assert_allclose(fb.data, sa.data, rtol=0, atol=1e-6)
        # TIFFs agree with the staged ONE-(lo,hi)-per-target output
        for f in ("hubble.tiff", "observatory.tiff"):
            sa = read_tiff_u16(tmp_path / "ready_s" / name / f).astype(np.int32)
            fb = read_tiff_u16(tmp_path / "ready_f" / name / f).astype(np.int32)
            assert abs(sa.mean() - fb.mean()) < 65535 * 0.02
        ob = read_tiff_u16(tmp_path / "ready_f" / name / "observatory.tiff")
        if i < half:
            bright += ob.mean() / half
        else:
            dark += ob.mean() / half
    # the x0.5 frame is visibly darker under shared stats (it would be
    # nearly equal under the old per-frame normalization)
    assert dark < bright * 0.75, (dark, bright)


def test_cli_prep_fused_steps34(tmp_path):
    """`sr prep --steps 3,4 --fused` runs the fused pipeline end to end on
    the reference on-disk layout."""
    from superresolution_def_tpu.cli import main as climain

    size, scale = 1024, 2e-4
    rng = np.random.default_rng(5)
    sky = (rng.random((size, size)) * 0.6 + 0.2).astype(np.float32)
    w_h = TanWCS((10.0, 20.0), (size / 2, size / 2), cdelt=[-scale, scale])
    t = tmp_path / "SYN"
    (t / "1_originarie").mkdir(parents=True)  # marks SYN as a target
    reg_h = t / "3_registered_native" / "hubble"
    reg_o = t / "3_registered_native" / "observatory"
    reg_h.mkdir(parents=True), reg_o.mkdir(parents=True)
    write_fits(reg_h / "reg_h.fits", sky, w_h.to_header())
    w_o = TanWCS(
        (10.0, 20.0), (size / 8, size / 8), cdelt=[-scale * 4, scale * 4]
    )
    obs = np.nan_to_num(
        reproject_bilinear(sky, w_h, w_o, (size // 4, size // 4))
    )
    write_fits(reg_o / "reg_o.fits", obs, w_o.to_header())

    climain.main([
        "prep", "--data-root", str(tmp_path), "--target", "SYN",
        "--steps", "3,4", "--fused",
    ])
    pairs = sorted((t / "7_dataset_ready_LOG").glob("pair_*/observatory.tiff"))
    assert pairs, "fused CLI prep wrote no TIFF pairs"
    assert (t / "6_patches_final" / "pair_000000" / "hubble.fits").exists()
