"""tfevents writer: framing + proto encoding round-trips through TF's reader."""

import glob

import numpy as np
import pytest

from superresolution_def_tpu.obs.tbevents import EventFileWriter, _crc32c


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC-32C (Castagnoli)
    assert _crc32c(b"") == 0x00000000
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_event_file_readable_by_tf(tmp_path):
    tf = pytest.importorskip("tensorflow")
    w = EventFileWriter(tmp_path)
    w.scalar("Metrics/PSNR", 23.45, 1)
    w.scalar("Metrics/PSNR", 24.67, 2)
    w.flush()
    f = glob.glob(str(tmp_path / "events.out.tfevents.*"))[0]
    got = []
    for e in tf.compat.v1.train.summary_iterator(f):
        if e.summary.value:
            v = e.summary.value[0]
            got.append((v.tag, round(float(v.simple_value), 2), int(e.step)))
        elif e.file_version:
            got.append(("__version__", e.file_version, 0))
    assert ("__version__", "brain.Event:2", 0) in got
    assert ("Metrics/PSNR", 23.45, 1) in got
    assert ("Metrics/PSNR", 24.67, 2) in got


def test_records_have_valid_framing(tmp_path):
    """Parse the framing by hand: lengths + masked CRCs must all verify."""
    import struct

    from superresolution_def_tpu.obs.tbevents import _masked_crc

    w = EventFileWriter(tmp_path)
    for i in range(5):
        w.scalar("x", float(i), i)
    w.flush()
    raw = open(w.path, "rb").read()
    off, n = 0, 0
    while off < len(raw):
        (length,) = struct.unpack_from("<Q", raw, off)
        (lcrc,) = struct.unpack_from("<I", raw, off + 8)
        assert lcrc == _masked_crc(raw[off : off + 8])
        data = raw[off + 12 : off + 12 + length]
        (dcrc,) = struct.unpack_from("<I", raw, off + 12 + length)
        assert dcrc == _masked_crc(data)
        off += 12 + length + 4
        n += 1
    assert n == 6  # version record + 5 scalars
