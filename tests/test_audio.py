"""Audio DSP tests: STFT parity with torch.stft, mel filterbank oracle,
F0 estimation on synthetic tones, griffin-lim reconstruction, wav IO."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastspeech2_tpu.audio import (
    MelSpectrogram,
    griffin_lim,
    interpolate_unvoiced,
    istft,
    load_wav,
    mel_filterbank,
    save_wav,
    stft_magnitude,
    yin_f0,
)


def test_stft_magnitude_matches_torch():
    """torch.stft(center=True, reflect, periodic hann) is numerically the
    reference's conv-based STFT (audio/stft.py:26-81)."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    y = rng.uniform(-1, 1, size=(2, 22050)).astype(np.float32)
    n_fft, hop, win = 1024, 256, 1024
    t_mag = torch.stft(
        torch.from_numpy(y), n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win, periodic=True),
        center=True, pad_mode="reflect", return_complex=True,
    ).abs().numpy()
    j_mag = np.asarray(stft_magnitude(jnp.asarray(y), n_fft, hop, win))
    assert j_mag.shape == t_mag.shape
    np.testing.assert_allclose(j_mag, t_mag, atol=2e-3)


def _oracle_slaney_mel(sr, n_fft, n_mels, fmin, fmax):
    """Independent implementation of librosa's slaney mel filterbank."""
    def to_mel(f):
        f = np.atleast_1d(np.asarray(f, dtype=float))
        out = f * 3.0 / 200.0
        mask = f >= 1000.0
        out[mask] = 15.0 + np.log(f[mask] / 1000.0) / (np.log(6.4) / 27.0)
        return out

    def to_hz(m):
        m = np.atleast_1d(np.asarray(m, dtype=float))
        out = m * 200.0 / 3.0
        mask = m >= 15.0
        out[mask] = 1000.0 * np.exp((np.log(6.4) / 27.0) * (m[mask] - 15.0))
        return out

    pts = to_hz(np.linspace(to_mel(fmin)[0], to_mel(fmax)[0], n_mels + 2))
    freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    fb = np.zeros((n_mels, len(freqs)))
    for m in range(n_mels):
        left, center, right = pts[m], pts[m + 1], pts[m + 2]
        up = (freqs - left) / (center - left)
        down = (right - freqs) / (right - center)
        fb[m] = np.maximum(0, np.minimum(up, down))
        fb[m] *= 2.0 / (right - left)
    return fb


def test_mel_filterbank_matches_oracle():
    got = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    expect = _oracle_slaney_mel(22050, 1024, 80, 0.0, 8000.0)
    np.testing.assert_allclose(got, expect, atol=1e-6)
    assert got.shape == (80, 513)


def test_mel_spectrogram_shapes_and_energy():
    mel_fn = MelSpectrogram()
    t = np.linspace(0, 1, 22050, endpoint=False)
    y = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None, :]
    mel, energy = mel_fn(jnp.asarray(y))
    mel, energy = np.asarray(mel), np.asarray(energy)
    assert mel.shape[0] == 1 and mel.shape[1] == 80
    assert energy.shape == (1, mel.shape[2])
    assert mel.min() >= np.log(1e-5) - 1e-6
    # energy must equal the L2 norm of the magnitude spectrum
    mag = np.asarray(stft_magnitude(jnp.asarray(y), 1024, 256, 1024))
    np.testing.assert_allclose(
        energy, np.linalg.norm(mag, axis=1), rtol=1e-4)


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0])
def test_yin_on_pure_tone(freq):
    sr, hop = 22050, 256
    t = np.arange(sr * 1) / sr
    y = 0.6 * np.sin(2 * np.pi * freq * t)
    f0 = np.asarray(yin_f0(jnp.asarray(y), sr, hop))
    mid = f0[10:-10]
    voiced = mid[mid > 0]
    assert len(voiced) > 0.9 * len(mid)
    np.testing.assert_allclose(np.median(voiced), freq, rtol=0.02)


def test_yin_silence_unvoiced():
    sr, hop = 22050, 256
    y = np.zeros(sr // 2)
    f0 = np.asarray(yin_f0(jnp.asarray(y), sr, hop))
    assert (f0 == 0).all()


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0])
def test_dio_on_pure_tone(freq):
    from fastspeech2_tpu.audio import dio_f0

    sr, hop = 22050, 256
    t = np.arange(sr * 1) / sr
    y = 0.6 * np.sin(2 * np.pi * freq * t)
    f0 = np.asarray(dio_f0(jnp.asarray(y), sr, hop))
    mid = f0[10:-10]
    voiced = mid[mid > 0]
    assert len(voiced) > 0.9 * len(mid)
    # StoneMask refinement should land within 0.5% on a clean tone
    np.testing.assert_allclose(np.median(voiced), freq, rtol=0.005)


def test_dio_weak_fundamental():
    """Harmonic complex with a nearly-missing fundamental: interval-based
    DIO must still report the true F0, not a harmonic."""
    from fastspeech2_tpu.audio import dio_f0

    sr, hop = 22050, 256
    t = np.arange(sr * 1) / sr
    y = 0.1 * np.sin(2 * np.pi * 150 * t) + sum(
        np.sin(2 * np.pi * 150 * k * t) / k for k in range(2, 8))
    y = (y / np.abs(y).max()).astype(np.float32)
    f0 = np.asarray(dio_f0(jnp.asarray(y), sr, hop))
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * len(f0)
    np.testing.assert_allclose(np.median(voiced), 150.0, rtol=0.01)


def test_dio_vibrato_tracks():
    from fastspeech2_tpu.audio import dio_f0

    sr, hop = 22050, 256
    # 1 s = 5 vibrato cycles, and the same dio jit shape as the
    # pure-tone tests (one compiled executable serves all of them)
    t = np.arange(sr * 1) / sr
    # 200 Hz carrier, +-10 Hz vibrato at 5 Hz
    phase = 2 * np.pi * (200 * t - 10 / (2 * np.pi * 5)
                         * np.cos(2 * np.pi * 5 * t))
    y = np.sin(phase).astype(np.float32)
    f0 = np.asarray(dio_f0(jnp.asarray(y), sr, hop))
    frames = np.arange(len(f0)) * hop / sr
    true = 200 + 10 * np.sin(2 * np.pi * 5 * frames)
    voiced = f0 > 0
    assert voiced.mean() > 0.9
    err = np.abs(f0[voiced] - true[voiced])
    assert err.mean() < 1.0, err.mean()


def test_dio_silence_and_noise_unvoiced():
    from fastspeech2_tpu.audio import dio_f0

    sr, hop = 22050, 256
    assert (np.asarray(dio_f0(jnp.zeros(sr), sr, hop)) == 0).all()
    rng = np.random.RandomState(0)
    noise = rng.randn(sr).astype(np.float32)
    f0 = np.asarray(dio_f0(jnp.asarray(noise), sr, hop))
    assert (f0 > 0).mean() < 0.1


def test_dio_voiced_unvoiced_boundary():
    from fastspeech2_tpu.audio import dio_f0

    sr, hop = 22050, 256
    t = np.arange(sr) / sr
    y = np.concatenate([np.sin(2 * np.pi * 180 * t),
                        np.zeros(sr)]).astype(np.float32)
    f0 = np.asarray(dio_f0(jnp.asarray(y), sr, hop))
    n1 = len(f0) // 2
    assert (f0[: n1 - 2] > 0).mean() > 0.9
    assert (f0[n1 + 2:] == 0).all()


def test_interpolate_unvoiced():
    f0 = np.array([0.0, 100.0, 0.0, 0.0, 200.0, 0.0])
    out = interpolate_unvoiced(f0)
    assert out[0] == 100.0           # edge extends
    np.testing.assert_allclose(out[2], 100 + (200 - 100) / 3)
    assert out[-1] == 200.0


def test_istft_roundtrip():
    rng = np.random.RandomState(1)
    y = rng.uniform(-0.5, 0.5, size=(1, 4096)).astype(np.float32)
    n_fft, hop, win = 1024, 256, 1024
    # full complex stft for phase
    from fastspeech2_tpu.audio.stft import _hann, frame_signal

    f = frame_signal(jnp.asarray(y), n_fft, hop) * jnp.asarray(
        _hann(win, n_fft))
    cspec = jnp.fft.rfft(f, axis=-1).transpose(0, 2, 1)
    recon = np.asarray(istft(jnp.abs(cspec), jnp.angle(cspec),
                             n_fft, hop, win))
    L = min(recon.shape[1], y.shape[1])
    # interior must reconstruct (edges lack full overlap)
    np.testing.assert_allclose(recon[0, 512:L - 512], y[0, 512:L - 512],
                               atol=1e-3)


def test_griffin_lim_converges():
    t = np.linspace(0, 0.5, 11025, endpoint=False)
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None, :]
    n_fft, hop, win = 1024, 256, 1024
    mag = stft_magnitude(jnp.asarray(y), n_fft, hop, win)

    def spectral_err(n_iters):
        wav = griffin_lim(mag, n_fft, hop, win, n_iters=n_iters)
        mag2 = np.asarray(stft_magnitude(wav, n_fft, hop, win))
        m1 = np.asarray(mag)
        F = min(m1.shape[2], mag2.shape[2])
        # interior frames only: edges lack full overlap-add coverage
        return np.abs(mag2[:, :, 4:F - 4] - m1[:, :, 4:F - 4]).mean()

    few, many = spectral_err(3), spectral_err(40)
    assert many < few * 0.6, (few, many)
    assert many < 0.1 * float(np.asarray(mag).mean())


def test_wav_roundtrip(tmp_path):
    sr = 22050
    y = 0.25 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
    p = str(tmp_path / "t.wav")
    save_wav(p, y, sr)
    y2, sr2 = load_wav(p)
    assert sr2 == sr
    np.testing.assert_allclose(y2, y, atol=1e-3)


def test_load_wav_resample(tmp_path):
    sr = 44100
    y = 0.25 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
    p = str(tmp_path / "t.wav")
    save_wav(p, y, sr)
    y2, sr2 = load_wav(p, target_sr=22050)
    assert sr2 == 22050
    assert abs(len(y2) - 22050) <= 1
