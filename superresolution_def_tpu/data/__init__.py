from .manifest import (
    ManifestEntry,
    load_manifest,
    write_manifest,
    merge_manifests,
    split_pairs,
    fix_path,
)
from .tiff import read_tiff_u16, write_tiff_u16
from .augment import augment_pair_batch
from .pipeline import PatchDataset, DataIterator
from .synth import synth_pair, synth_batch_u16

__all__ = [
    "ManifestEntry",
    "load_manifest",
    "write_manifest",
    "merge_manifests",
    "split_pairs",
    "fix_path",
    "read_tiff_u16",
    "write_tiff_u16",
    "augment_pair_batch",
    "PatchDataset",
    "DataIterator",
    "synth_pair",
    "synth_batch_u16",
]
