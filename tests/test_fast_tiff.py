"""Native C++ TIFF decoder tests (builds libtifffast.so with g++)."""

import numpy as np
import pytest

from superresolution_def_tpu.data import fast_tiff
from superresolution_def_tpu.data.tiff import read_tiff_u16, write_tiff_u16

pytestmark = pytest.mark.skipif(
    not fast_tiff.native_available(), reason="g++ build unavailable"
)


def test_native_reads_pil_written_file(tmp_path):
    img = np.linspace(0, 1, 64 * 48).reshape(64, 48)
    write_tiff_u16(tmp_path / "a.tiff", img)  # PIL writer
    arr = fast_tiff.read_tiff_u16_native(tmp_path / "a.tiff", 64, 48)
    assert arr is not None
    np.testing.assert_array_equal(arr, read_tiff_u16(tmp_path / "a.tiff"))


def test_pil_reads_native_written_file(tmp_path):
    img = np.random.default_rng(0).random((32, 32))
    assert fast_tiff.write_tiff_u16_native(tmp_path / "b.tiff", img)
    pil = read_tiff_u16(tmp_path / "b.tiff")
    np.testing.assert_array_equal(pil, (np.clip(img, 0, 1) * 65535).astype(np.uint16))


def test_batch_read_with_bad_file(tmp_path):
    paths = []
    for i in range(4):
        img = np.full((16, 16), i / 10)
        write_tiff_u16(tmp_path / f"{i}.tiff", img)
        paths.append(tmp_path / f"{i}.tiff")
    paths.append(tmp_path / "missing.tiff")
    out, status = fast_tiff.read_batch_u16(paths, 16, 16, nthreads=4)
    assert (status[:4] == 0).all() and status[4] != 0
    np.testing.assert_array_equal(out[2], read_tiff_u16(paths[2]))


def test_shape_mismatch_rejected(tmp_path):
    write_tiff_u16(tmp_path / "c.tiff", np.zeros((8, 8)))
    assert fast_tiff.read_tiff_u16_native(tmp_path / "c.tiff", 16, 16) is None


def test_patch_dataset_uses_native(tmp_path):
    from superresolution_def_tpu.data import ManifestEntry, PatchDataset

    rng = np.random.default_rng(1)
    entries = []
    for i in range(3):
        h = rng.random((64, 64)); l = rng.random((16, 16))
        write_tiff_u16(tmp_path / f"h{i}.tiff", h)
        write_tiff_u16(tmp_path / f"g{i}.tiff", l)
        entries.append(ManifestEntry(f"p{i}", str(tmp_path / f"h{i}.tiff"), str(tmp_path / f"g{i}.tiff")))
    ds = PatchDataset(entries, lr_size=16, hr_size=64)
    assert ds.use_native
    batch = ds.read_batch([0, 2])
    assert batch["hr"].shape == (2, 64, 64, 1)
    # native batch equals the PIL item path
    np.testing.assert_array_equal(batch["hr"][1][..., 0], read_tiff_u16(entries[2].hubble_path))
