"""DSP validation on REAL speech (round-1 verdict #3, real-data leg).

The reference mirror ships real LJSpeech ground-truth wavs in demo/
(22.05 kHz, the corpus the shipped stats.json was computed from).  With
pyworld not installable offline, the strongest available real-speech pin
is cross-validation: the DIO+StoneMask port and the YIN port are
independent algorithms — their voiced-frame agreement on real speech
bounds each one's error.  Plausibility is additionally anchored to the
corpus statistics the reference shipped (mean F0 207.6 Hz,
preprocessed_data/LJSpeech/stats.json)."""

import glob
import json
import os

import numpy as np
import pytest

DEMO = "/root/reference/demo/LJSpeech"


@pytest.fixture(scope="module")
def demo_wavs(reference_root):
    # 3 wavs: DIO+YIN compute dominates the file's wall time and the
    # agreement/median assertions are already stable at 3 utterances
    paths = sorted(glob.glob(os.path.join(DEMO, "*ground-truth.wav")))[:3]
    if not paths:
        pytest.skip("reference demo wavs not available")
    from scipy.io import wavfile

    out = []
    for p in paths:
        sr, w = wavfile.read(p)
        y = (w / 32768.0).astype(np.float32)
        n_frames = 1 + len(y) // 256
        # pad/truncate every wav to one static length so the jitted F0
        # extractors compile once for all files (6 s of real speech keeps
        # every statistical assertion stable at ~60% of the DSP cost)
        padded = np.zeros(22050 * 6, np.float32)
        padded[: len(y)] = y[: len(padded)]
        out.append((sr, padded, min(n_frames, 1 + len(padded) // 256)))
    return out


def test_dio_vs_yin_on_real_speech(demo_wavs):
    from fastspeech2_tpu.audio.dio import dio_f0
    from fastspeech2_tpu.audio.f0 import yin_f0

    stats = json.load(open(
        "/root/reference/preprocessed_data/LJSpeech/stats.json"))
    corpus_mean_hz = stats["pitch"][2]          # 207.6 Hz

    medians = []
    for sr, y, n_frames in demo_wavs:
        d = np.asarray(dio_f0(y, sr, 256))[:n_frames]
        v = np.asarray(yin_f0(y, sr, 256))[:n_frames]
        voiced = d > 0
        # real speech is a mix of voiced/unvoiced; LJ speaker ~half voiced
        assert 0.3 < voiced.mean() < 0.8, voiced.mean()
        both = voiced & (v > 0)
        assert both.mean() > 0.25
        rel = np.abs(d[both] - v[both]) / v[both]
        # two independent estimators agree closely on real speech
        assert np.median(rel) < 0.02, np.median(rel)
        assert np.percentile(rel, 90) < 0.06, np.percentile(rel, 90)
        medians.append(np.median(d[voiced]))
    # speaker-level median F0 near the corpus mean the reference shipped
    assert abs(np.median(medians) - corpus_mean_hz) < 50.0, medians


def test_mel_energy_on_real_speech(demo_wavs):
    from fastspeech2_tpu.audio.stft import MelSpectrogram

    mel_fn = MelSpectrogram()
    sr, y, n_frames = demo_wavs[0]
    mel, energy = mel_fn(y[None, :])
    mel = np.asarray(mel)[0, :, :n_frames]
    energy = np.asarray(energy)[0, :n_frames]
    y = y[: n_frames * 256]
    assert mel.shape == (80, n_frames)
    # log-compressed mel: clamp floor log(1e-5) and speech-plausible peaks
    assert mel.min() >= np.log(1e-5) - 1e-4
    assert 0.0 < mel.max() < 6.0
    # frame energy tracks waveform loudness: silent tails are low-energy
    rms = np.sqrt(np.convolve(y ** 2, np.ones(256) / 256, "same"))[::256]
    rms = rms[: len(energy)]
    loud = rms > np.percentile(rms, 75)
    quiet = rms < np.percentile(rms, 10)
    assert energy[loud].mean() > 5.0 * max(energy[quiet].mean(), 1e-6)
