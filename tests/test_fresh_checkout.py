"""Fresh-checkout contract: a clean clone must be able to synthesize from
the tracked weight snapshots.

That requires (a) the 10-clip dev corpus and its preprocessing stats to be
tracked in git, (b) `FastSpeech2Config.build` to pick the tracked stats up
quietly, and (c) a LOUD warning when stats are absent — the failure mode is
silently mis-binned pitch/energy in the variance adaptor, not a crash
(reference analogue: model/modules.py:41-46 reads stats.json at model
construction and hard-fails instead).
"""

import copy
import json
import os
import warnings

import pytest

from fastspeech2_tpu.configs.config import (
    FastSpeech2Config,
    load_yaml_configs,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRACKED = [
    "config/LJSpeech10/preprocess.yaml",
    "config/LJSpeech10/model.yaml",
    "config/LJSpeech10/train.yaml",
    "preprocessed_data/LJSpeech10/stats.json",
    "preprocessed_data/LJSpeech10/speakers.json",
    "preprocessed_data/LJSpeech10/train.txt",
    # alignment is platform-sensitive; the tracked weights' quality only
    # reproduces under these exact TextGrids (docs/native_training.md)
    "preprocessed_data/LJSpeech10/TextGrid/LJSpeech/LJ001-0012.TextGrid",
    "weights/acoustic_LJSpeech10_100k.npz",
    "weights/vocoder_gen_mixed60k.npz",
]


@pytest.fixture(scope="module")
def configs():
    return load_yaml_configs(
        os.path.join(REPO, "config/LJSpeech10/preprocess.yaml"),
        os.path.join(REPO, "config/LJSpeech10/model.yaml"),
        os.path.join(REPO, "config/LJSpeech10/train.yaml"))


def test_tracked_artifacts_exist():
    missing = [p for p in TRACKED
               if not os.path.exists(os.path.join(REPO, p))]
    assert not missing, f"fresh-checkout artifacts missing: {missing}"
    # 10 wav+lab pairs of the dev corpus
    corpus = os.path.join(REPO, "raw_data/LJSpeech10/LJSpeech")
    wavs = [f for f in os.listdir(corpus) if f.endswith(".wav")]
    labs = [f for f in os.listdir(corpus) if f.endswith(".lab")]
    assert len(wavs) == 10 and len(labs) == 10


def test_tracked_stats_load_quietly(configs, monkeypatch):
    pre, model, _ = configs
    monkeypatch.chdir(REPO)  # preprocessed_path is repo-relative
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        cfg = FastSpeech2Config.build(pre, model)
    assert not [w for w in caught if "stats.json" in str(w.message)]
    # real corpus stats, not the unit-range placeholder
    stats_path = os.path.join(REPO, "preprocessed_data/LJSpeech10/stats.json")
    with open(stats_path) as f:
        stats = json.load(f)
    assert (cfg.pitch_min, cfg.pitch_max) == tuple(stats["pitch"][:2])
    assert cfg.pitch_max > 1.0, "placeholder stats leaked into the config"


def test_missing_stats_warn_loudly(configs):
    pre, model, _ = configs
    pre = copy.deepcopy(pre)
    pre["path"]["preprocessed_path"] = "/nonexistent/preprocessed"
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        cfg = FastSpeech2Config.build(pre, model)
    assert [w for w in caught if "stats.json not found" in str(w.message)]
    assert (cfg.pitch_min, cfg.pitch_max) == (0.0, 1.0)
