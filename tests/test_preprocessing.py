"""Preprocessing tests: TextGrid parsing and the end-to-end feature
extraction pipeline on a synthetic aligned corpus."""

import os

import numpy as np
import pytest

from fastspeech2_tpu.audio.wav import save_wav
from fastspeech2_tpu.preprocessing import Preprocessor, read_textgrid

# sil-trimmed speech spans 0.25-1.73 s = 32634 samples: one 32768 DSP
# bucket.  (At the round 1.75 the trim was 33075 samples -- 307 over the
# bucket edge, doubling every mel/DIO dispatch shape in these tests.)
LONG_TG = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 2.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 2.0
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 2.0
            text = "hello"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 2.0
        intervals: size = 4
        intervals [1]:
            xmin = 0
            xmax = 0.25
            text = "sil"
        intervals [2]:
            xmin = 0.25
            xmax = 1.0
            text = "HH"
        intervals [3]:
            xmin = 1.0
            xmax = 1.73
            text = "OW1"
        intervals [4]:
            xmin = 1.73
            xmax = 2.0
            text = "sp"
"""


def test_read_long_textgrid(tmp_path):
    p = tmp_path / "a.TextGrid"
    p.write_text(LONG_TG)
    tg = read_textgrid(str(p))
    phones = tg.get_tier_by_name("phones")
    assert [iv.text for iv in phones.intervals] == ["sil", "HH", "OW1", "sp"]
    assert phones.intervals[1].start_time == 0.25
    assert phones.intervals[2].end_time == 1.73


def test_mfa_wrapper(tmp_path, monkeypatch):
    """mfa present -> correct command; absent -> actionable instructions."""
    from fastspeech2_tpu.preprocessing import mfa as mfa_mod
    from fastspeech2_tpu.preprocessing.mfa import (
        MFANotInstalled,
        run_mfa_align,
    )

    monkeypatch.setattr(mfa_mod, "mfa_binary", lambda: None)

    cfg = {"path": {"raw_path": str(tmp_path / "raw"),
                    "preprocessed_path": str(tmp_path / "pre"),
                    "lexicon_path": str(tmp_path / "lex.txt")}}
    calls = []

    def fake_runner(cmd, check):
        calls.append(cmd)
        return 0

    out_dir, _ = run_mfa_align(cfg, binary="/fake/mfa", runner=fake_runner)
    assert out_dir == str(tmp_path / "pre" / "TextGrid")
    assert os.path.isdir(out_dir)
    cmd = calls[0]
    assert cmd[:2] == ["/fake/mfa", "align"]
    assert cfg["path"]["raw_path"] in cmd
    assert "english_us_arpa" in cmd

    import pytest

    with pytest.raises(MFANotInstalled) as e:
        run_mfa_align(cfg, binary=None)
    assert "mfa align" in str(e.value)


def _make_raw_corpus(root, n_utts=3):
    """Sine-wave 'speech' + TextGrids with a sil/phone/phone/sp layout."""
    sr = 22050
    raw = os.path.join(root, "raw")
    out = os.path.join(root, "pre")
    spk = "spk0"
    os.makedirs(os.path.join(raw, spk), exist_ok=True)
    os.makedirs(os.path.join(out, "TextGrid", spk), exist_ok=True)
    rng = np.random.RandomState(0)
    for u in range(n_utts):
        dur = 2.0
        t = np.arange(int(sr * dur)) / sr
        freq = 180 + 40 * u
        y = 0.5 * np.sin(2 * np.pi * freq * t) * (1 + 0.1 * rng.randn(len(t)))
        y = np.clip(y, -1, 1)
        save_wav(os.path.join(raw, spk, f"u{u}.wav"), y, sr)
        with open(os.path.join(raw, spk, f"u{u}.lab"), "w") as f:
            f.write("hello")
        with open(os.path.join(out, "TextGrid", spk, f"u{u}.TextGrid"),
                  "w") as f:
            f.write(LONG_TG)
    return raw, out


def _config(raw, out):
    return {
        "dataset": "synthetic",
        "path": {"corpus_path": raw, "raw_path": raw,
                 "preprocessed_path": out,
                 "lexicon_path": "unused"},
        "preprocessing": {
            "val_size": 1,
            "text": {"text_cleaners": ["english_cleaners"],
                     "language": "en"},
            "audio": {"sampling_rate": 22050, "max_wav_value": 32768.0},
            "stft": {"filter_length": 1024, "hop_length": 256,
                     "win_length": 1024},
            "mel": {"n_mel_channels": 80, "mel_fmin": 0, "mel_fmax": 8000},
            "pitch": {"feature": "phoneme_level", "normalization": True},
            "energy": {"feature": "phoneme_level", "normalization": True},
        },
    }


def test_preprocessor_end_to_end(tmp_path):
    raw, out = _make_raw_corpus(str(tmp_path))
    cfg = _config(raw, out)
    results = Preprocessor(cfg).build_from_path()
    assert len(results) == 3

    # artifacts exist
    for sub in ["mel", "pitch", "energy", "duration"]:
        files = os.listdir(os.path.join(out, sub))
        assert len(files) == 3, sub
    assert os.path.exists(os.path.join(out, "stats.json"))
    assert os.path.exists(os.path.join(out, "speakers.json"))

    # feature consistency: mel frames == duration sum; phoneme-level pitch
    mel = np.load(os.path.join(out, "mel", "spk0-mel-u0.npy"))
    dur = np.load(os.path.join(out, "duration", "spk0-duration-u0.npy"))
    pitch = np.load(os.path.join(out, "pitch", "spk0-pitch-u0.npy"))
    energy = np.load(os.path.join(out, "energy", "spk0-energy-u0.npy"))
    assert mel.shape[0] == dur.sum()
    assert mel.shape[1] == 80
    # sil trimmed front, sp kept then trimmed at tail -> 2 phones
    assert len(dur) == 2
    assert len(pitch) == 2 and len(energy) == 2

    # durations: 0.25-1.0s and 1.0-1.73s at hop 256 => ~65, ~63 frames
    assert abs(int(dur[0]) - 65) <= 1 and abs(int(dur[1]) - 63) <= 1

    # normalized stats: roughly zero-mean
    import json

    stats = json.load(open(os.path.join(out, "stats.json")))
    assert stats["pitch"][0] < 0 < stats["pitch"][1]

    # metadata loads through the Dataset
    from fastspeech2_tpu.data import FeatureDataset

    ds = FeatureDataset("train.txt", cfg)
    assert len(ds) == 2
    s = ds[0]
    assert s["mel"].shape[0] == s["duration"].sum()

    # pitch reflects the per-utterance tone ordering after normalization:
    # utterances have 180/220/260 Hz tones; check monotone in raw pitch space
    p_mean, p_std = stats["pitch"][2], stats["pitch"][3]
    means = []
    for u in range(3):
        p = np.load(os.path.join(out, "pitch", f"spk0-pitch-u{u}.npy"))
        means.append((p * p_std + p_mean).mean())
    assert means[0] < means[1] < means[2]
    assert abs(means[0] - 180) < 20


def test_batched_dsp_matches_per_utterance(tmp_path):
    """dsp_batch_size > 1 stacks same-bucket wavs into one dispatch; the
    saved features must match the per-utterance path (to fp32 reduction
    reordering, ~1e-7: vmap changes XLA's fusion order)."""
    # 2 utterances suffice: the batched path still stacks (and pads) a
    # partial dsp_batch_size=4 batch, and DIO compute dominates this test
    raw1, out1 = _make_raw_corpus(str(tmp_path / "a"), n_utts=2)
    raw2, out2 = _make_raw_corpus(str(tmp_path / "b"), n_utts=2)
    cfg1 = _config(raw1, out1)
    cfg2 = _config(raw2, out2)
    cfg2["preprocessing"]["dsp_batch_size"] = 4

    r1 = Preprocessor(cfg1).build_from_path()
    r2 = Preprocessor(cfg2).build_from_path()
    assert sorted(r1) == sorted(r2)
    for sub in ["mel", "pitch", "energy", "duration"]:
        files = sorted(os.listdir(os.path.join(out1, sub)))
        assert files == sorted(os.listdir(os.path.join(out2, sub)))
        for f in files:
            a = np.load(os.path.join(out1, sub, f))
            b = np.load(os.path.join(out2, sub, f))
            np.testing.assert_allclose(
                a, b, rtol=1e-6, atol=1e-6, err_msg=f"{sub}/{f}")
