"""Leakage guards for the leave-one-out fold builder.

The held-out protocol (scripts/leave_one_out.py, docs/heldout_eval.md)
is only as honest as its fold construction: the held-out clip must not
appear in the fold's train metadata (acoustic training reads train.txt;
vocoder GAN training is restricted to it via FinetuneSampler's --split).
These tests pin that property on a synthetic corpus layout.
"""

import importlib.util
import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

spec = importlib.util.spec_from_file_location(
    "leave_one_out", REPO / "scripts" / "leave_one_out.py")
loo = importlib.util.module_from_spec(spec)
spec.loader.exec_module(loo)

NAMES = ["UTT-0001", "UTT-0002", "UTT-0003"]


@pytest.fixture
def base_corpus(tmp_path, monkeypatch):
    base = tmp_path / "base_pre"
    for d in ("mel", "pitch", "energy", "duration", "wav"):
        (base / d).mkdir(parents=True)
    for f in ("stats.json", "speakers.json"):
        (base / f).write_text("{}")
    lines = [f"{n}|LJSpeech|{{AH0}}|text {i}\n" for i, n in enumerate(NAMES)]
    (base / "train.txt").write_text("".join(lines))
    monkeypatch.setattr(loo, "BASE_PRE", base)
    return base


def test_build_fold_excludes_heldout_from_train(base_corpus, tmp_path):
    out_root = tmp_path / "fold"
    fold_pre = loo.build_fold("UTT-0002", out_root)

    train = (fold_pre / "train.txt").read_text()
    val = (fold_pre / "val.txt").read_text()
    assert "UTT-0002" not in train
    assert val.startswith("UTT-0002|")
    assert len(val.splitlines()) == 1
    assert len(train.splitlines()) == len(NAMES) - 1
    # original metadata order preserved for the remaining clips
    assert [ln.split("|")[0] for ln in train.splitlines()] == [
        "UTT-0001", "UTT-0003"]


def test_build_fold_links_features_not_copies(base_corpus, tmp_path):
    fold_pre = loo.build_fold("UTT-0001", tmp_path / "fold")
    for d in ("mel", "pitch", "energy", "duration", "wav",
              "stats.json", "speakers.json"):
        assert (fold_pre / d).is_symlink(), d


def test_build_fold_rejects_unknown_clip(base_corpus, tmp_path):
    with pytest.raises(SystemExit):
        loo.build_fold("UTT-9999", tmp_path / "fold")


def test_build_fold_is_idempotent(base_corpus, tmp_path):
    out_root = tmp_path / "fold"
    loo.build_fold("UTT-0003", out_root)
    fold_pre = loo.build_fold("UTT-0003", out_root)  # re-run: no crash
    assert "UTT-0003" not in (fold_pre / "train.txt").read_text()
