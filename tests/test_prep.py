"""Prep pipeline tests: FITS IO, TAN WCS math, reprojection, steps 1-4."""

import numpy as np
import pytest

from superresolution_def_tpu.prep import (
    read_fits,
    write_fits,
    TanWCS,
    angular_separation_deg,
    reproject_bilinear,
    reproject_batch,
    extract_patches,
    calculate_stride_for_target,
    normalize_target,
    prepare_full_dataset,
    main_registration,
)
from superresolution_def_tpu.prep.fits import FITSImage


def _wcs(scale=1e-3, crval=(10.0, 20.0), crpix=(50.0, 50.0)):
    return TanWCS(crval, crpix, cdelt=[-scale, scale])


def test_fits_roundtrip(tmp_path):
    data = np.random.default_rng(0).random((32, 48)).astype(np.float32)
    hdr = _wcs().to_header()
    hdr["REG_METH"] = "TEST"
    write_fits(tmp_path / "x.fits", data, hdr)
    back = read_fits(tmp_path / "x.fits")
    np.testing.assert_allclose(back.data, data, rtol=1e-6)
    assert abs(back.header["CRVAL1"] - 10.0) < 1e-10
    assert back.header["REG_METH"] == "TEST"


def test_fits_bitpix16_bscale(tmp_path):
    """Integer data with BZERO/BSCALE (common for camera FITS)."""
    raw = (np.arange(12, dtype=">i2")).reshape(3, 4)
    cards = [
        f"{'SIMPLE':<8}= {'T':>20}",
        f"{'BITPIX':<8}= {16:>20}",
        f"{'NAXIS':<8}= {2:>20}",
        f"{'NAXIS1':<8}= {4:>20}",
        f"{'NAXIS2':<8}= {3:>20}",
        f"{'BZERO':<8}= {32768:>20}",
        f"{'BSCALE':<8}= {1:>20}",
        "END",
    ]
    head = "".join(c.ljust(80) for c in cards)
    blob = head.ljust(2880).encode() + raw.tobytes().ljust(2880, b"\0")
    (tmp_path / "i16.fits").write_bytes(blob)
    img = read_fits(tmp_path / "i16.fits")
    np.testing.assert_allclose(img.data, np.arange(12).reshape(3, 4) + 32768)


def test_wcs_pixel_world_inverse():
    w = _wcs()
    xx, yy = np.meshgrid(np.linspace(0, 99, 7), np.linspace(0, 99, 7))
    ra, dec = w.pixel_to_world(xx, yy)
    px, py = w.world_to_pixel(ra, dec)
    np.testing.assert_allclose(px, xx, atol=1e-8)
    np.testing.assert_allclose(py, yy, atol=1e-8)
    # center pixel (crpix is 1-based) maps to crval
    ra0, dec0 = w.pixel_to_world(np.array([49.0]), np.array([49.0]))
    assert abs(ra0[0] - 10.0) < 1e-9 and abs(dec0[0] - 20.0) < 1e-9


def test_wcs_slice_and_lr_scaling():
    w = _wcs()
    ws = w.slice(10, 20)  # y0=10, x0=20
    # same world position: original pixel (20+i, 10+j) == sliced pixel (i, j)
    ra1, dec1 = w.pixel_to_world(np.array([25.0]), np.array([17.0]))
    ra2, dec2 = ws.pixel_to_world(np.array([5.0]), np.array([7.0]))
    np.testing.assert_allclose([ra1[0], dec1[0]], [ra2[0], dec2[0]], atol=1e-12)

    lr = w.scaled_lr(4.0)
    # under the reference's crpix/4, cd*4 rule: u_lr(p) = cd*(4p + 4 - crpix)
    # so world(lr px p) == world(hr px 4p + 3)
    ra_lr, dec_lr = lr.pixel_to_world(np.array([3.0]), np.array([5.0]))
    ra_hr, dec_hr = w.pixel_to_world(np.array([3.0 * 4 + 3]), np.array([5.0 * 4 + 3]))
    np.testing.assert_allclose([ra_lr[0], dec_lr[0]], [ra_hr[0], dec_hr[0]], atol=1e-10)


def test_wcs_header_roundtrip():
    w = TanWCS((150.0, -30.0), (10.0, 20.0), cd=[[1e-4, 2e-6], [-3e-6, 1e-4]])
    back = TanWCS.from_header(w.to_header())
    np.testing.assert_allclose(back.cd, w.cd)
    np.testing.assert_allclose(back.crpix, w.crpix)


def _sip_header():
    """Synthetic ASTAP-style solved header with 2nd-order SIP distortion."""
    return {
        "CTYPE1": "RA---TAN-SIP", "CTYPE2": "DEC--TAN-SIP",
        "CRVAL1": 10.0, "CRVAL2": 20.0, "CRPIX1": 50.0, "CRPIX2": 50.0,
        "CD1_1": -2.8e-4, "CD1_2": 1e-6, "CD2_1": -1e-6, "CD2_2": 2.8e-4,
        "A_ORDER": 2, "A_0_2": 1.1e-6, "A_1_1": -2.3e-6, "A_2_0": 3.7e-6,
        "B_ORDER": 2, "B_0_2": -1.9e-6, "B_1_1": 2.9e-6, "B_2_0": -1.3e-6,
    }


def test_wcs_sip_forward_matches_manual_polynomial():
    """SIP A/B terms shift the intermediate pixel before CD (Shupe 2005);
    the reference honored these via astropy (Dataset_step1:224-248)."""
    h = _sip_header()
    w = TanWCS.from_header(h)
    assert w.has_sip
    px, py = 80.0, 30.0
    u = px + 1 - h["CRPIX1"]
    v = py + 1 - h["CRPIX2"]
    du = h["A_0_2"] * v**2 + h["A_1_1"] * u * v + h["A_2_0"] * u**2
    dv = h["B_0_2"] * v**2 + h["B_1_1"] * u * v + h["B_2_0"] * u**2
    plain = TanWCS.from_header({k: v for k, v in h.items() if k.startswith("C")})
    ra_exp, dec_exp = plain.pixel_to_world(
        np.array([u + du + h["CRPIX1"] - 1]), np.array([v + dv + h["CRPIX2"] - 1])
    )
    ra, dec = w.pixel_to_world(np.array([px]), np.array([py]))
    np.testing.assert_allclose([ra[0], dec[0]], [ra_exp[0], dec_exp[0]], atol=1e-12)
    # and the distortion is actually nonzero (silently ignoring it would fail)
    ra_p, dec_p = plain.pixel_to_world(np.array([px]), np.array([py]))
    assert abs(ra[0] - ra_p[0]) > 1e-9 or abs(dec[0] - dec_p[0]) > 1e-9


def test_wcs_sip_world_pixel_roundtrip_iterative():
    """world_to_pixel inverts the forward SIP by fixed-point iteration when
    no AP/BP inverse polynomials are in the header."""
    w = TanWCS.from_header(_sip_header())
    xx, yy = np.meshgrid(np.linspace(0, 99, 5), np.linspace(0, 99, 5))
    ra, dec = w.pixel_to_world(xx, yy)
    px, py = w.world_to_pixel(ra, dec)
    np.testing.assert_allclose(px, xx, atol=1e-7)
    np.testing.assert_allclose(py, yy, atol=1e-7)


def test_wcs_sip_header_roundtrip_and_guards():
    import pytest

    w = TanWCS.from_header(_sip_header())
    back = TanWCS.from_header(w.to_header())
    np.testing.assert_allclose(back.sip_a, w.sip_a)
    np.testing.assert_allclose(back.sip_b, w.sip_b)
    assert "SIP" in w.to_header()["CTYPE1"]
    # slice/scaled_lr would silently move the SIP origin -> loud refusal
    with pytest.raises(ValueError, match="SIP"):
        w.slice(10, 10)
    with pytest.raises(ValueError, match="SIP"):
        w.scaled_lr(4.0)


def test_angular_separation():
    assert abs(angular_separation_deg(0, 0, 0, 1) - 1.0) < 1e-9
    assert abs(angular_separation_deg(10, 89, 190, 89) - 2.0) < 1e-6


def test_reproject_identity():
    w = _wcs()
    rng = np.random.default_rng(0)
    data = rng.random((64, 64)).astype(np.float32)
    out = reproject_bilinear(data, w, w, (64, 64))
    np.testing.assert_allclose(out, data, atol=1e-5)


def test_reproject_shift():
    """Target WCS shifted one pixel -> output equals shifted source."""
    w = _wcs()
    dst = w.slice(0, 1)  # x0=1
    data = np.random.default_rng(1).random((32, 32)).astype(np.float32)
    out = reproject_bilinear(data, w, dst, (32, 32))
    np.testing.assert_allclose(out[:, :-1], data[:, 1:], atol=2e-5)
    assert np.isnan(out[:, -1]).all()  # outside the source footprint


def test_reproject_batch_matches_single():
    w = _wcs()
    data = np.random.default_rng(2).random((64, 64)).astype(np.float32)
    targets = [w.slice(4, 4), w.slice(10, 2), w.scaled_lr(2.0)]
    batch = reproject_batch(data, w, targets, (16, 16))
    for i, t in enumerate(targets):
        single = reproject_bilinear(data, w, t, (16, 16))
        np.testing.assert_allclose(batch[i], single, atol=1e-6, equal_nan=True)


def test_stride_rule():
    assert calculate_stride_for_target("M1_data", None) == 40
    assert calculate_stride_for_target("M1_data", 850) == 40
    assert calculate_stride_for_target("M82_x", 1400 * 4) == 20
    assert calculate_stride_for_target("unknown", 500) == 40
    assert calculate_stride_for_target("M8", 100000) == 10  # clamp


def _synthetic_sky(tmp_path, size=700, scale=2e-4):
    """Write a registered Hubble frame + two obs frames of the same sky."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    sky = gaussian_filter(rng.random((size, size)), 3.0)
    sky = (0.3 + 0.5 * (sky - sky.min()) / (np.ptp(sky) + 1e-9)).astype(np.float32)
    w_h = TanWCS((10.0, 20.0), (size / 2, size / 2), cdelt=[-scale, scale])
    hdir = tmp_path / "hub"; odir = tmp_path / "obs"
    hdir.mkdir(); odir.mkdir()
    write_fits(hdir / "reg_h1.fits", sky, w_h.to_header())
    # obs frame: same sky at 4x coarser scale
    w_o = TanWCS((10.0, 20.0), (size / 8, size / 8), cdelt=[-scale * 4, scale * 4])
    obs = reproject_bilinear(sky, w_h, w_o, (size // 4, size // 4))
    write_fits(odir / "reg_o1.fits", np.nan_to_num(obs), w_o.to_header())
    # far-away frame must be distance-filtered out
    w_far = TanWCS((50.0, -10.0), (30.0, 30.0), cdelt=[-scale * 4, scale * 4])
    write_fits(odir / "reg_far.fits", np.ones((60, 60), np.float32), w_far.to_header())
    return hdir, odir, sky, w_h


def test_extract_patches_end_to_end(tmp_path):
    hdir, odir, sky, w_h = _synthetic_sky(tmp_path)
    out = tmp_path / "pairs"
    n = extract_patches(
        hdir, odir, out, stride=512, hr_size=512, lr_size=128, log=lambda *a: None
    )
    assert n >= 1
    pair = sorted(out.glob("pair_*"))[0]
    h = read_fits(pair / "hubble.fits")
    o = read_fits(pair / "observatory.fits")
    assert h.data.shape == (512, 512) and o.data.shape == (128, 128)
    # alignment: the LR patch should match the HR patch 4x-downsampled (roughly)
    hr_small = h.data.reshape(128, 4, 128, 4).mean(axis=(1, 3))
    mask = o.data > 1e-4
    corr = np.corrcoef(hr_small[mask], o.data[mask])[0, 1]
    assert corr > 0.5


def test_normalize_and_split_end_to_end(tmp_path):
    hdir, odir, _, _ = _synthetic_sky(tmp_path)
    pairs = tmp_path / "t" / "6_patches_final"
    n = extract_patches(hdir, odir, pairs, stride=100, hr_size=512, lr_size=128,
                        log=lambda *a: None)
    assert n >= 3
    ready = tmp_path / "t" / "7_dataset_ready_LOG"
    m = normalize_target(pairs, ready, log=lambda *a: None)
    assert m == n
    from superresolution_def_tpu.data import read_tiff_u16

    tiff = read_tiff_u16(sorted(ready.glob("pair_*"))[0] / "hubble.tiff")
    assert tiff.shape == (512, 512) and tiff.dtype == np.uint16
    assert tiff.max() > 1000  # normalization actually stretched

    counts = prepare_full_dataset(tmp_path / "t")
    assert counts["train"] >= 1
    assert (tmp_path / "t" / "8_dataset_split" / "splits_json" / "train.json").exists()


def test_prep_logger_and_artifacts(tmp_path):
    """Step-1-style timestamped log file + step-3/4 zip + debug artifacts
    (Dataset_step1:44-54, Dataset_step3:431-435, Dataset_step4:179-189)."""
    from superresolution_def_tpu.prep import make_prep_logger

    log, log_path = make_prep_logger(tmp_path / "logs", prefix="prep")
    log("hello step")
    assert log_path.exists() and "hello step" in log_path.read_text()

    hdir, odir, _, _ = _synthetic_sky(tmp_path)
    pairs = tmp_path / "t" / "6_patches_final"
    dbg3 = tmp_path / "t" / "6_patches_final_debug"
    n = extract_patches(
        hdir, odir, pairs, stride=200, hr_size=512, lr_size=128,
        target_name="t", debug_dir=dbg3, debug_samples=2, zip_outputs=True,
        log=log,
    )
    assert n >= 1
    assert (tmp_path / "t" / "t_patches.zip").exists()
    assert (tmp_path / "t" / "t_debug_visuals.zip").exists()
    assert len(list(dbg3.glob("*_card.png"))) >= 1

    ready = tmp_path / "t" / "7_dataset_ready_LOG"
    dbg4 = tmp_path / "t" / "7_dataset_ready_LOG_debug"
    m = normalize_target(
        pairs, ready, debug_dir=dbg4, debug_interval=1, zip_debug=True, log=log
    )
    assert m == n
    assert len(list(dbg4.glob("check_pair_*.png"))) == m
    assert (tmp_path / "t" / "debug_checks_clip_4.0.zip").exists()
    # the log captured step output too
    assert "[step3]" in log_path.read_text()


def test_registration_synthetic(tmp_path):
    """Register a rotated/offset obs frame onto the Hubble CRVAL frame."""
    rng = np.random.default_rng(3)
    size = 200
    scale = 1e-4
    sky = rng.random((size, size)).astype(np.float32)
    w_h = TanWCS((30.0, 45.0), (size / 2, size / 2), cdelt=[-scale, scale])
    hs = tmp_path / "h_solved"; os_ = tmp_path / "o_solved"
    hs.mkdir(); os_.mkdir()
    write_fits(hs / "a_solved.fits", sky, w_h.to_header())
    # obs at slightly offset crval, same pixel scale
    w_o = TanWCS((30.001, 45.001), (size / 2, size / 2), cdelt=[-scale, scale])
    write_fits(os_ / "b_solved.fits", sky, w_o.to_header())
    hr_out = tmp_path / "h_reg"; ob_out = tmp_path / "o_reg"
    res = main_registration(hs, os_, hr_out, ob_out, log=lambda *a: None)
    assert res["ok"] == 2
    reg = read_fits(hr_out / "reg_a_solved.fits")
    assert reg.header["REG_METH"] == "ASTAP_SOLVE+REPROJECT"
    assert reg.data.shape == (size, size)
    # hubble frame is already centered on its own crval -> identity register
    np.testing.assert_allclose(
        np.nan_to_num(reg.data)[50:150, 50:150], sky[50:150, 50:150], atol=1e-4
    )
