"""Diagnostic card + profiling observability tests."""

import numpy as np

from superresolution_def_tpu.prep import TanWCS
from superresolution_def_tpu.prep.diagnostics import alignment_check, save_diagnostic_card
from superresolution_def_tpu.obs.profiling import ThroughputMeter


def test_alignment_check_perfect_and_mismatch():
    w = TanWCS((10.0, 20.0), (256.0, 256.0), cdelt=[-1e-4, 1e-4])
    lr = w.scaled_lr(4.0)
    chk = alignment_check(w, lr, 512, 128)
    assert chk["verdict"] == "PERFECT"
    assert chk["sep_arcsec"] < 1.0

    # an LR WCS shifted by 10 HR pixels -> 1e-3 deg = 3.6" -> MISMATCH
    lr_bad = TanWCS(lr.crval, lr.crpix + 2.5, cd=lr.cd)
    chk2 = alignment_check(w, lr_bad, 512, 128)
    assert chk2["verdict"] == "MISMATCH"


def test_diagnostic_card_renders(tmp_path):
    w = TanWCS((10.0, 20.0), (64.0, 64.0), cdelt=[-1e-4, 1e-4])
    lr = w.scaled_lr(4.0)
    rng = np.random.default_rng(0)
    chk = save_diagnostic_card(
        tmp_path / "card.png",
        rng.random((128, 128)).astype(np.float32),
        rng.random((32, 32)).astype(np.float32),
        w,
        lr,
        "pair_000000",
    )
    assert (tmp_path / "card.png").stat().st_size > 10000
    assert "verdict" in chk


def test_extract_patches_writes_cards(tmp_path):
    from tests.test_prep import _synthetic_sky
    from superresolution_def_tpu.prep import extract_patches

    hdir, odir, _, _ = _synthetic_sky(tmp_path)
    n = extract_patches(
        hdir, odir, tmp_path / "pairs", stride=512, hr_size=512, lr_size=128,
        debug_dir=tmp_path / "debug", debug_samples=2, log=lambda *a: None,
    )
    cards = list((tmp_path / "debug").glob("*_card.png"))
    assert len(cards) == min(n, 2) and len(cards) >= 1


def test_throughput_meter():
    m = ThroughputMeter(n_devices=2)
    m.tick(8)  # first tick only starts the clock
    import time

    time.sleep(0.05)
    m.tick(8)
    assert m.patches == 8
    assert 0 < m.patches_per_sec < 1000
    assert abs(m.patches_per_sec_per_chip - m.patches_per_sec / 2) < 1e-9
