"""Acoustic features for forced alignment: MFCC + deltas + CMVN.

The reference outsources alignment to external Montreal Forced Aligner
(its preprocessor only *consumes* MFA TextGrids,
reference preprocessor/preprocessor.py:163-167).  This framework ships its
own aligner; these are its front-end features.  They are computed from the
same MelSpectrogram used for training features (audio/stft.py), so frame
indices here are exactly training mel-frame indices (hop 256 @ 22.05 kHz)
and alignment durations transfer to the acoustic model without resampling.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.audio.stft import MelSpectrogram


def _dct_matrix(n_out, n_in):
    """Orthonormal DCT-II basis [n_out, n_in] (scipy.fft.dct norm='ortho')."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    basis = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    basis *= np.sqrt(2.0 / n_in)
    basis[0] *= np.sqrt(0.5)
    return basis.astype(np.float32)


def _delta(x, width=2):
    """HTK-style regression deltas over +-width frames. x: [B, T, D]."""
    num = jnp.zeros_like(x)
    left = x[:, :1]
    right = x[:, -1:]
    for k in range(1, width + 1):
        fwd = jnp.concatenate(
            [x[:, k:], jnp.repeat(right, k, axis=1)], axis=1)
        bwd = jnp.concatenate(
            [jnp.repeat(left, k, axis=1), x[:, :-k]], axis=1)
        num = num + k * (fwd - bwd)
    denom = 2 * sum(k * k for k in range(1, width + 1))
    return num / denom


@partial(jax.jit, static_argnames=("mel_fn", "n_mfcc"))
def _mfcc_from_wav(wavs, mel_fn, n_mfcc):
    logmel, _ = mel_fn(wavs)                      # [B, n_mels, T] (log)
    logmel = logmel.transpose(0, 2, 1)            # [B, T, n_mels]
    dct = jnp.asarray(_dct_matrix(n_mfcc, logmel.shape[-1]))
    mfcc = jnp.einsum("btm,cm->btc", logmel, dct)
    d1 = _delta(mfcc)
    d2 = _delta(d1)
    return jnp.concatenate([mfcc, d1, d2], axis=-1)   # [B, T, 3*n_mfcc]


def alignment_features(wavs, lengths, mel_fn: MelSpectrogram, n_mfcc=13):
    """Padded wav batch -> CMVN'd MFCC+deltas and per-utterance frame counts.

    wavs: [B, L] float in [-1, 1] (zero-padded); lengths: [B] sample counts.
    Returns (feats [B, T, 3*n_mfcc] float32, n_frames [B] int32) where
    frame t covers samples [t*hop, t*hop + n_fft) of the centered STFT —
    identical gridding to the training mels.
    """
    wavs = jnp.asarray(np.stack(wavs), jnp.float32)
    feats = _mfcc_from_wav(wavs, mel_fn, n_mfcc)
    n_frames = np.asarray(
        [int(l) // mel_fn.hop_length + 1 for l in lengths], np.int32)
    # per-utterance CMVN over valid frames only
    t_idx = np.arange(feats.shape[1])
    mask = jnp.asarray(t_idx[None, :] < n_frames[:, None])
    m = mask[..., None]
    cnt = jnp.maximum(m.sum(axis=1), 1)
    mean = (feats * m).sum(axis=1, keepdims=True) / cnt[:, None]
    var = ((feats - mean) ** 2 * m).sum(axis=1, keepdims=True) / cnt[:, None]
    feats = (feats - mean) / jnp.sqrt(var + 1e-8)
    return np.asarray(feats * m, np.float32), n_frames
