"""Forced aligner tests: duration recovery on synthetic data, exact
partition invariants, optional-silence skips, and TextGrid roundtrip
through the real Preprocessor alignment reader (the aligner is a
capability superset — the reference requires external MFA,
reference preprocessor/preprocessor.py:163-167)."""

import numpy as np
import pytest

from fastspeech2_tpu.align import (
    ForcedAligner,
    Utterance,
    write_textgrid,
)
from fastspeech2_tpu.preprocessing.textgrid import read_textgrid


def _synthetic_corpus(rng, n_utts=6, n_types=8, d=12, noise=0.25):
    """Each phone type = a distinct Gaussian mean in feature space."""
    means = rng.normal(size=(n_types, d)) * 2.0
    utts, gold = [], []
    for _ in range(n_utts):
        n_tokens = rng.integers(4, 9)
        types = rng.integers(0, n_types, size=n_tokens)
        durs = rng.integers(3, 12, size=n_tokens)
        frames = np.concatenate([
            means[t][None] + rng.normal(size=(dur, d)) * noise
            for t, dur in zip(types, durs)
        ])
        # letter-only names: digits would be eaten by the ARPAbet
        # stress-stripping tie (strip_stress)
        tokens = [f"P{chr(65 + t)}" for t in types]
        utts.append(Utterance(
            feats=frames.astype(np.float32), n_frames=len(frames),
            tokens=tokens, optional=[False] * n_tokens))
        gold.append(durs)
    return utts, gold


def test_recovers_synthetic_durations():
    rng = np.random.default_rng(0)
    utts, gold = _synthetic_corpus(rng)
    aligner = ForcedAligner(n_states=1, n_iters=8)
    results = aligner.align(utts)
    total = correct = 0
    for utt, res, durs in zip(utts, results, gold):
        assert res.durations.sum() == utt.n_frames
        # frame-level agreement between gold and recovered segmentations
        gold_lab = np.repeat(np.arange(len(durs)), durs)
        got_lab = np.repeat(np.arange(len(res.durations)), res.durations)
        correct += (gold_lab == got_lab).sum()
        total += len(gold_lab)
    assert correct / total > 0.9, f"frame accuracy {correct / total:.2f}"


def test_multi_state_min_duration_and_partition():
    rng = np.random.default_rng(1)
    utts, _ = _synthetic_corpus(rng, n_utts=4)
    results = ForcedAligner(n_states=3, n_iters=6).align(utts)
    for utt, res in zip(utts, results):
        assert res.durations.sum() == utt.n_frames
        # mandatory first state => every (non-optional) token >= 1 frame
        assert (res.durations >= 1).all()


def test_optional_silence_can_take_zero_frames():
    rng = np.random.default_rng(2)
    n_types, d = 4, 8
    means = rng.normal(size=(n_types + 1, d)) * 2.5   # last = silence
    utts = []
    # utterance A: has real leading silence; utterance B: none
    for has_sil in (True, False):
        types = [0, 1, 2, 3, 1]
        durs = [6, 7, 5, 8, 6]
        segs = []
        if has_sil:
            segs.append(means[-1][None]
                        + rng.normal(size=(9, d)) * 0.2)
        for t, dur in zip(types, durs):
            segs.append(means[t][None] + rng.normal(size=(dur, d)) * 0.2)
        if has_sil:
            segs.append(means[-1][None]
                        + rng.normal(size=(7, d)) * 0.2)
        frames = np.concatenate(segs).astype(np.float32)
        tokens = ["sil"] + [f"P{chr(65 + t)}" for t in types] + ["sil"]
        optional = [True] + [False] * len(types) + [True]
        utts.append(Utterance(feats=frames, n_frames=len(frames),
                              tokens=tokens, optional=optional))
    results = ForcedAligner(n_states=1, n_iters=8).align(utts)
    with_sil, without_sil = results
    assert with_sil.durations.sum() == utts[0].n_frames
    assert without_sil.durations.sum() == utts[1].n_frames
    # the sil-free utterance should give (nearly) nothing to silence
    assert without_sil.durations[0] <= 1
    assert without_sil.durations[-1] <= 1
    # the sil-ful one should give silence roughly its real extent
    assert with_sil.durations[0] >= 6
    assert with_sil.durations[-1] >= 4


def test_textgrid_roundtrip_preserves_durations(tmp_path):
    """write_textgrid -> read_textgrid -> Preprocessor.get_alignment
    reproduces the aligner's integer durations exactly."""
    phones = ["sil", "HH", "AH0", "L", "OW1", "sp", "W", "ER1", "D", "sil"]
    durations = [12, 3, 5, 4, 9, 0, 6, 11, 7, 15]
    hop, sr = 256, 22050
    path = str(tmp_path / "spk" / "utt.TextGrid")
    write_textgrid(path, phones, durations, hop, sr)

    tg = read_textgrid(path)
    tier = tg.get_tier_by_name("phones")
    # zero-duration sp was dropped from the tier
    assert [iv.text for iv in tier.intervals] == [
        p for p, d in zip(phones, durations) if d > 0]

    class _Stub:
        sampling_rate = sr
        hop_length = hop

    from fastspeech2_tpu.preprocessing.preprocessor import Preprocessor
    got_phones, got_durs, start, end = Preprocessor.get_alignment(
        _Stub(), tier)
    # leading/trailing sil trimmed (reference preprocessor:253-291);
    # interior phones + the interior zero-sp dropped by the writer
    expect = [(p, d) for p, d in zip(phones, durations)][1:-1]
    expect = [(p, d) for p, d in expect if d > 0]
    assert got_phones == [p for p, _ in expect]
    assert got_durs == [d for _, d in expect]
    assert start == pytest.approx(12 * hop / sr)
    assert end == pytest.approx(sum(d for _, d in expect) * hop / sr
                                + 12 * hop / sr)
