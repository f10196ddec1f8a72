"""STFT + mel spectrogram + frame energy in JAX.

Numerics match the reference TacotronSTFT (audio/stft.py:130-178): reflect
padding of n_fft//2 samples, periodic Hann window, hop 256, magnitude
spectra, Slaney mel filterbank, log-compression log(clamp(x, 1e-5)), and
energy = per-frame L2 norm of the magnitude spectrum (audio/stft.py:176).
The reference realizes the DFT as a CUDA conv against a Fourier basis
(audio/stft.py:26-72); on TPU a framed gather + rfft (one batched matmul
inside XLA) is the natural formulation and produces identical values.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import get_window

from fastspeech2_tpu.audio.mel import mel_filterbank


def _hann(win_length, n_fft):
    w = get_window("hann", win_length, fftbins=True)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    return w.astype(np.float32)


def frame_signal(y, n_fft, hop_length):
    """[B, T] -> [B, n_frames, n_fft] with reflect-centered frames."""
    pad = n_fft // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (y.shape[1] - n_fft) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    return y[:, idx]


@partial(jax.jit, static_argnums=(1, 2, 3))
def stft_magnitude(y, n_fft, hop_length, win_length):
    """[B, T] float in [-1, 1] -> [B, 1 + n_fft//2, n_frames] magnitudes."""
    frames = frame_signal(y, n_fft, hop_length)
    window = jnp.asarray(_hann(win_length, n_fft))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    return jnp.abs(spec).transpose(0, 2, 1).astype(jnp.float32)


def dynamic_range_compression(x, clip_val=1e-5):
    return jnp.log(jnp.clip(x, clip_val, None))


def dynamic_range_decompression(x):
    return jnp.exp(x)


@dataclasses.dataclass(frozen=True)
class MelSpectrogram:
    """Callable mel+energy extractor (TacotronSTFT equivalent)."""

    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 80
    sampling_rate: int = 22050
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0

    @property
    def mel_basis(self):
        return jnp.asarray(mel_filterbank(
            self.sampling_rate, self.filter_length, self.n_mel_channels,
            self.mel_fmin, self.mel_fmax))

    def __call__(self, y):
        """y: [B, T] in [-1, 1] -> (mel [B, n_mels, F], energy [B, F])."""
        mag = stft_magnitude(
            y, self.filter_length, self.hop_length, self.win_length)
        mel = jnp.einsum("mf,bft->bmt", self.mel_basis, mag)
        mel = dynamic_range_compression(mel)
        energy = jnp.linalg.norm(mag, axis=1)
        return mel, energy


def istft(magnitude, phase, n_fft, hop_length, win_length):
    """Inverse STFT via overlap-add with window-sum-square correction
    (reference audio/stft.py:83-122 semantics)."""
    spec = magnitude * jnp.exp(1j * phase)          # [B, F_bins, n_frames]
    frames = jnp.fft.irfft(spec.transpose(0, 2, 1), n=n_fft, axis=-1)
    window = jnp.asarray(_hann(win_length, n_fft))
    frames = frames * window

    b, n_frames, _ = frames.shape
    total = n_fft + hop_length * (n_frames - 1)
    starts = jnp.arange(n_frames) * hop_length
    sig = jnp.zeros((b, total))

    def add_frame(i, sig):
        return jax.lax.dynamic_update_slice(
            sig,
            jax.lax.dynamic_slice(sig, (0, starts[i]), (b, n_fft))
            + frames[:, i, :],
            (0, starts[i]),
        )

    sig = jax.lax.fori_loop(0, n_frames, add_frame, sig)

    # window sum-square envelope
    wss = jnp.zeros((total,))
    wsq = window ** 2

    def add_w(i, wss):
        return jax.lax.dynamic_update_slice(
            wss, jax.lax.dynamic_slice(wss, (starts[i],), (n_fft,)) + wsq,
            (starts[i],))

    wss = jax.lax.fori_loop(0, n_frames, add_w, wss)
    sig = jnp.where(wss[None, :] > 1e-11, sig / wss[None, :], sig)
    pad = n_fft // 2
    return sig[:, pad: total - pad]


def griffin_lim(magnitude, n_fft, hop_length, win_length, n_iters=30,
                seed=0):
    """Phase recovery (reference audio/audio_processing.py:66-82)."""
    key = jax.random.PRNGKey(seed)
    phase = jax.random.uniform(
        key, magnitude.shape, minval=-np.pi, maxval=np.pi)

    def body(_, phase):
        sig = istft(magnitude, phase, n_fft, hop_length, win_length)
        spec = jnp.fft.rfft(
            frame_signal(sig, n_fft, hop_length)
            * jnp.asarray(_hann(win_length, n_fft)), axis=-1)
        return jnp.angle(spec).transpose(0, 2, 1)

    phase = jax.lax.fori_loop(0, n_iters, body, phase)
    return istft(magnitude, phase, n_fft, hop_length, win_length)
