"""CLI front-end tests: target scanning, interactive pickers, arg wiring."""

import builtins

import pytest

from superresolution_def_tpu.cli.main import (
    get_available_targets,
    get_available_pair_targets,
    _pick_from,
)
from superresolution_def_tpu.data import ManifestEntry, write_manifest



pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'

def test_get_available_targets_scans_train_json(tmp_path):
    for t, has in (("M1", True), ("M33", True), ("JUNK", False)):
        d = tmp_path / t / "8_dataset_split" / "splits_json"
        if has:
            write_manifest(d / "train.json", [ManifestEntry("p", "h", "g")])
        else:
            (tmp_path / t).mkdir()
    assert get_available_targets(str(tmp_path)) == ["M1", "M33"]


def test_get_available_pair_targets(tmp_path):
    (tmp_path / "A" / "7_dataset_ready_LOG").mkdir(parents=True)
    (tmp_path / "B" / "7_dataset_ready").mkdir(parents=True)
    (tmp_path / "C").mkdir()
    assert get_available_pair_targets(str(tmp_path)) == ["A", "B"]


def test_pick_from_multi(monkeypatch):
    monkeypatch.setattr(builtins, "input", lambda *a: "1,3")
    assert _pick_from(["a", "b", "c"], "targets", multi=True) == ["a", "c"]
    monkeypatch.setattr(builtins, "input", lambda *a: "all")
    assert _pick_from(["a", "b"], "targets", multi=True) == ["a", "b"]
    monkeypatch.setattr(builtins, "input", lambda *a: "2")
    assert _pick_from(["a", "b"], "folders") == ["b"]


def test_pick_from_empty_exits():
    with pytest.raises(SystemExit):
        _pick_from([], "targets")


def test_train_parser_flags():
    """All documented train flags parse (catches argparse format bugs)."""
    import argparse

    from superresolution_def_tpu.cli import main as climain

    # build the parser exactly as main() does, but intercept before dispatch
    called = {}

    def fake_cmd_train(args):
        called.update(vars(args))

    orig = climain.cmd_train
    climain.cmd_train = fake_cmd_train
    try:
        climain.main([
            "train", "--arch", "hat", "--target", "M1,M33", "--epochs", "5",
            "--bf16", "--remat", "--no-vgg", "--batch-size", "2",
            "--img-size", "64", "--depths", "2,2", "--num-heads", "3",
            "--pretrained-hat", "/tmp/x.pth", "--max-steps-per-epoch", "1",
        ])
    finally:
        climain.cmd_train = orig
    assert called["arch"] == "hat"
    assert called["target"] == "M1,M33"
    assert called["bf16"] and called["remat"] and called["no_vgg"]
    assert called["pretrained_hat"] == "/tmp/x.pth"
    assert called["depths"] == "2,2" and called["num_heads"] == 3
