"""JSON split manifests — reference-compatible schema.

Schema identical to the reference's prepare_data.py:40-44: a JSON list of
``{"patch_id", "hubble_path", "ground_path"}`` with absolute paths, written
as ``8_dataset_split/splits_json/{train,val,test}.json``. Splitting uses the
reference's exact procedure (prepare_data.py:46-55): ``random.seed(42)``
shuffle, then 80/10/10 train/val/test.

Path re-rooting reproduces astronomical_dataset_swin.py:19-23: if a stored
absolute path does not exist, re-root everything after the '/data/' substring
under the local base path.
"""

from __future__ import annotations

import dataclasses
import json
import random
from pathlib import Path
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class ManifestEntry:
    patch_id: str
    hubble_path: str
    ground_path: str

    def to_json(self) -> dict:
        return {
            "patch_id": self.patch_id,
            "hubble_path": self.hubble_path,
            "ground_path": self.ground_path,
        }


def fix_path(path: str, base_path: str | Path | None) -> str:
    """Re-root a stale absolute path on the '/data/' marker (reference rule)."""
    if base_path is None:
        return path
    p = Path(path)
    if p.exists():
        return path
    spath = str(path).replace("\\", "/")
    marker = "/data/"
    idx = spath.find(marker)
    if idx < 0:
        return path
    rel = spath[idx + len(marker):]
    return str(Path(base_path) / rel)


def load_manifest(path: str | Path, base_path: str | Path | None = None) -> list[ManifestEntry]:
    with open(path) as f:
        raw = json.load(f)
    out = []
    for e in raw:
        out.append(
            ManifestEntry(
                patch_id=str(e["patch_id"]),
                hubble_path=fix_path(e["hubble_path"], base_path),
                ground_path=fix_path(e["ground_path"], base_path),
            )
        )
    return out


def write_manifest(path: str | Path, entries: Sequence[ManifestEntry]) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump([e.to_json() for e in entries], f, indent=2)


def merge_manifests(paths: Sequence[str | Path], base_path=None) -> list[ManifestEntry]:
    """Concatenate several split files (multi-target training, train_swin.py:123-136)."""
    out: list[ManifestEntry] = []
    for p in paths:
        out.extend(load_manifest(p, base_path))
    return out


def split_pairs(
    entries: Sequence[ManifestEntry],
    train_ratio: float = 0.8,
    val_ratio: float = 0.1,
    seed: int = 42,
) -> dict[str, list[ManifestEntry]]:
    """Seeded shuffle + 80/10/10 split (reference prepare_data.py:10-11,46-55)."""
    items = list(entries)
    rng = random.Random(seed)
    rng.shuffle(items)
    n = len(items)
    n_train = int(n * train_ratio)
    n_val = int(n * val_ratio)
    return {
        "train": items[:n_train],
        "val": items[n_train : n_train + n_val],
        "test": items[n_train + n_val :],
    }
