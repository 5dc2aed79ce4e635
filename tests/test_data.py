"""Data layer tests: TIFF IO, manifests, splits, sharded iterator, augment."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superresolution_def_tpu.data import (
    ManifestEntry,
    load_manifest,
    write_manifest,
    split_pairs,
    read_tiff_u16,
    write_tiff_u16,
    augment_pair_batch,
    PatchDataset,
    DataIterator,
)


def _make_pairs(tmp_path, n=12, lr=16, hr=64):
    rng = np.random.default_rng(0)
    entries = []
    for i in range(n):
        d = tmp_path / f"pair_{i:06d}"
        d.mkdir(parents=True, exist_ok=True)
        hr_img = rng.random((hr, hr))
        lr_img = rng.random((lr, lr))
        write_tiff_u16(d / "hubble.tiff", hr_img)
        write_tiff_u16(d / "observatory.tiff", lr_img)
        entries.append(
            ManifestEntry(f"pair_{i:06d}", str(d / "hubble.tiff"), str(d / "observatory.tiff"))
        )
    return entries


def test_tiff_roundtrip(tmp_path):
    img = np.linspace(0, 1, 64 * 64, dtype=np.float64).reshape(64, 64)
    write_tiff_u16(tmp_path / "x.tiff", img)
    back = read_tiff_u16(tmp_path / "x.tiff")
    assert back.dtype == np.uint16
    np.testing.assert_allclose(back / 65535.0, img, atol=1.0 / 65535)


def test_manifest_roundtrip_and_fix_path(tmp_path):
    entries = _make_pairs(tmp_path / "data", n=3)
    mpath = tmp_path / "train.json"
    write_manifest(mpath, entries)
    loaded = load_manifest(mpath)
    assert [e.patch_id for e in loaded] == [e.patch_id for e in entries]

    # stale absolute path with '/data/' marker re-roots under base_path
    stale = [
        ManifestEntry("p0", "/gone/data/pair_000000/hubble.tiff",
                      "/gone/data/pair_000000/observatory.tiff")
    ]
    write_manifest(mpath, stale)
    fixed = load_manifest(mpath, base_path=tmp_path / "data")
    assert fixed[0].hubble_path == str(tmp_path / "data" / "pair_000000" / "hubble.tiff")


def test_split_ratios_and_determinism():
    entries = [ManifestEntry(f"p{i}", f"h{i}", f"g{i}") for i in range(100)]
    s1 = split_pairs(entries)
    s2 = split_pairs(entries)
    assert len(s1["train"]) == 80 and len(s1["val"]) == 10 and len(s1["test"]) == 10
    assert [e.patch_id for e in s1["train"]] == [e.patch_id for e in s2["train"]]
    ids = {e.patch_id for split in s1.values() for e in split}
    assert len(ids) == 100


def test_iterator_sharding_covers_and_aligns(tmp_path):
    entries = _make_pairs(tmp_path, n=10)
    ds = PatchDataset(entries, lr_size=16, hr_size=64)
    its = [
        DataIterator(ds, batch_size=2, process_index=p, process_count=2, seed=7)
        for p in range(2)
    ]
    assert its[0].batches_per_epoch() == its[1].batches_per_epoch() == 3
    seen = []
    for it in its:
        for b in it.epoch(epoch=1):
            assert b["lr"].shape == (2, 16, 16, 1) and b["lr"].dtype == np.uint16
            assert b["hr"].shape == (2, 64, 64, 1)
            seen.append(b)
    assert len(seen) == 6
    # same epoch twice -> same order (deterministic); different epoch differs
    i1 = its[0]._indices(1)
    assert np.array_equal(i1, its[0]._indices(1))
    assert not np.array_equal(i1, its[0]._indices(2))
    # ranks cover the padded permutation: every sample appears
    both = np.concatenate([its[0]._indices(1), its[1]._indices(1)])
    assert set(both.tolist()) == set(range(10))


def test_iterator_multihost_partition_exact(tmp_path):
    """Two simulated hosts' index streams partition each epoch disjointly and
    exactly — the property DistributedSampler exists for (train_swin.py:
    141-145); identical per-host data = silently wrong gradients."""
    entries = _make_pairs(tmp_path, n=12)
    ds = PatchDataset(entries, lr_size=16, hr_size=64)
    # the trainers' wiring: global per-step batch 12, 2 hosts -> 6 per host
    its = [
        DataIterator(
            ds, batch_size=6, shuffle=True, drop_last=True, seed=0,
            process_index=p, process_count=2,
        )
        for p in range(2)
    ]
    for epoch in (1, 2, 5):
        streams = [it._indices(epoch) for it in its]
        assert len(streams[0]) == len(streams[1]) == 6
        s0, s1 = set(streams[0].tolist()), set(streams[1].tolist())
        assert s0.isdisjoint(s1), "hosts fed overlapping samples"
        assert s0 | s1 == set(range(12)), "epoch not exactly covered"
    # different epochs shuffle differently but keep the partition property
    assert not np.array_equal(its[0]._indices(1), its[0]._indices(2))


def test_corrupt_file_substitution(tmp_path):
    entries = _make_pairs(tmp_path, n=4)
    bad = ManifestEntry("bad", str(tmp_path / "missing.tiff"), str(tmp_path / "missing2.tiff"))
    ds = PatchDataset([bad] + entries, lr_size=16, hr_size=64)
    item = ds[0]  # substitutes deterministically instead of raising
    assert item["hr"].shape == (64, 64, 1)
    with pytest.raises(Exception):
        PatchDataset([bad], lr_size=16, hr_size=64, strict=True)[0]


def test_iterator_propagates_reader_errors(tmp_path):
    """A persistently-unreadable dataset must RAISE from the iterator, not
    deadlock it. Regression: the prefetch producer died on the exhausted
    8-try substitution ladder without posting its sentinel, leaving the
    consumer blocked on out_q.get() forever (found via a wrong-size dataset
    in the round-4 verify drive)."""
    entries = _make_pairs(tmp_path, n=4)
    # every file is 64px HR; ask for 512 -> all reads fail, substitution
    # ladder can never succeed
    ds = PatchDataset(entries, lr_size=128, hr_size=512)
    it = DataIterator(ds, batch_size=2, shuffle=False)
    with pytest.raises(Exception):
        next(iter(it.epoch(0)))


def test_restore_pytree_host_returns_numpy(tmp_path):
    """host=True restores leaves as np.ndarray (no device round-trip)."""
    from superresolution_def_tpu.ckpt import save_pytree, restore_pytree

    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}}
    save_pytree(tmp_path / "ck", tree)
    out = restore_pytree(tmp_path / "ck", host=True)
    leaves = jax.tree_util.tree_leaves(out)
    assert all(isinstance(l, np.ndarray) for l in leaves)
    np.testing.assert_allclose(out["params"]["w"], np.arange(6.0).reshape(2, 3))


def test_augment_pairs_consistent():
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(1)
    lr = jnp.asarray(rng.random((8, 4, 4, 1), dtype=np.float32))
    # HR = LR upscaled x2 (nearest) so paired transforms must commute
    hr = jnp.repeat(jnp.repeat(lr, 2, axis=1), 2, axis=2)
    lr_a, hr_a = augment_pair_batch(lr, hr, key)
    hr_from_lr = jnp.repeat(jnp.repeat(lr_a, 2, axis=1), 2, axis=2)
    np.testing.assert_allclose(np.asarray(hr_a), np.asarray(hr_from_lr), atol=1e-7)
    # something actually flipped/rotated across the batch
    assert not np.allclose(np.asarray(lr_a), np.asarray(lr))


def test_augment_distribution():
    # identity occurs for (no flip, k=0) and (hflip+vflip, k=2) -> 2/16
    key = jax.random.PRNGKey(0)
    n = 2048
    img = jnp.arange(16.0).reshape(1, 4, 4, 1)
    lr = jnp.tile(img, (n, 1, 1, 1))
    lr_a, _ = augment_pair_batch(lr, lr, key)
    ident = np.mean(np.all(np.asarray(lr_a) == np.asarray(lr), axis=(1, 2, 3)))
    assert 0.08 < ident < 0.17
