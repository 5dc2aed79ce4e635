"""16-bit grayscale TIFF IO (PIL 'I;16'), matching the reference's format.

The reference reads pairs with PIL and converts ``float32 / 65535.0``
(astronomical_dataset_swin.py:30-35) and writes SR outputs the same way
(infer_swin.py:32-37). Decoding here returns raw uint16 — the /65535
normalization is fused into the on-device step (see pipeline.py) so the
host→device transfer is 2 bytes/px instead of 4.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def read_tiff_u16(path: str | Path) -> np.ndarray:
    """Read a 16-bit grayscale TIFF to (H, W) uint16."""
    with Image.open(path) as im:
        arr = np.asarray(im)
    if arr.dtype == np.int32:  # PIL decodes I;16 as mode 'I' on some paths
        arr = arr.astype(np.uint16)
    elif arr.dtype != np.uint16:
        arr = np.clip(np.asarray(arr, dtype=np.float64), 0, 65535).astype(np.uint16)
    return arr


def write_tiff_u16(path: str | Path, img01: np.ndarray) -> None:
    """Write a [0,1] float image as 16-bit TIFF (reference save_tiff_16bit).

    uint16 input is written as-is (already-quantized device output).
    Encodes through the native writer (native/tifffast.cpp tiff_write_u16,
    same uncompressed little-endian single-strip layout PIL produces and
    both decoders read) with a PIL fallback when the lib is unavailable."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    arr = np.asarray(img01)
    if arr.dtype != np.uint16:
        arr = (np.clip(arr.astype(np.float64), 0.0, 1.0) * 65535.0).astype(np.uint16)
    from .fast_tiff import write_u16_native

    if not write_u16_native(path, arr):
        Image.fromarray(arr).save(str(path))  # uint16 -> PIL mode 'I;16'
