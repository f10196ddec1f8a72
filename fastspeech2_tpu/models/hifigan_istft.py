"""iSTFT-head HiFi-GAN generator — the TPU fast vocoder variant.

Why this exists: in the stock HiFi-GAN topology (hifigan/models.py:112-174,
rates 8,8,2,2) the two tail stages run at 64 and 32 channels over 115k/229k
samples; channel counts below the TPU's 128-wide vector lanes leave the MXU
at 8-30% utilization, and those stages are ~2/3 of the generator's wall
time (docs/tpu_notes.md).  This variant follows the public iSTFTNet recipe
(Kaneko et al., ICASSP 2022, arXiv:2203.02395, "C8C8I"): keep the first two
upsample stages (8x, 8x — channels 256 and 128, both MXU-friendly), then
predict a tiny complex spectrum (n_fft=16, hop=4) per 64x-rate frame and
synthesize the waveform with a fixed inverse-STFT filterbank.  Total
upsampling 8*8*4 = 256 = hop_length, identical io contract to
HiFiGANGenerator: [B, T, n_mels] -> [B, T*256].

NOT weight-compatible with the reference's pretrained checkpoints — this is
a documented non-parity variant selected via model.yaml
`vocoder: {model: "HiFi-GAN-iSTFT"}`; the parity path ("HiFi-GAN") is
unchanged.  Trainable with the same GAN trainer (training/vocoder.py).

The iSTFT head is expressed in real arithmetic (cos/sin basis matmuls +
static overlap-add) — no complex dtypes, so it compiles on every backend
and the [*, 9] x [9, 16] basis matmuls are negligible next to the conv
stack.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fastspeech2_tpu.models.hifigan import LRELU_SLOPE, ResBlock


def _istft_bases(n_fft):
    """Real irfft bases: frames = real @ C + imag @ S, [n_bins, n_fft]."""
    k = np.arange(n_fft // 2 + 1)[:, None]
    t = np.arange(n_fft)[None, :]
    w = np.where((k == 0) | (k == n_fft // 2), 1.0, 2.0)
    ang = 2.0 * np.pi * k * t / n_fft
    c = (w * np.cos(ang) / n_fft).astype(np.float32)
    s = (-w * np.sin(ang) / n_fft).astype(np.float32)
    return c, s


def _hann_periodic(n):
    t = np.arange(n)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * t / n)).astype(np.float32)


def overlap_add_istft(real, imag, n_fft, hop):
    """[B, F, n_bins] real/imag -> [B, F*hop] waveform.

    Windowed overlap-add with window-sum-square normalization; the
    (n_fft - hop) // 2 warmup/cooldown samples at each edge are trimmed
    symmetrically so the output is exactly F*hop samples (hop-aligned, as
    vocoder_infer's mel_len*hop trim expects).  Static shapes throughout:
    the OLA is a sum of n_fft//hop shifted reshapes, not a scatter loop.
    """
    c, s = _istft_bases(n_fft)
    window = _hann_periodic(n_fft)
    frames = (jnp.matmul(real, jnp.asarray(c))
              + jnp.matmul(imag, jnp.asarray(s)))     # [B, F, n_fft]
    frames = frames * jnp.asarray(window)

    b, f, _ = frames.shape
    n_overlap = n_fft // hop                           # frames per sample
    # out[(q + j)*hop + r] += frames[q, j*hop + r]
    parts = []
    wss_parts = []
    wsq = window ** 2
    for j in range(n_overlap):
        chunk = frames[:, :, j * hop: (j + 1) * hop]   # [B, F, hop]
        chunk = jnp.pad(chunk,
                        ((0, 0), (j, n_overlap - 1 - j), (0, 0)))
        parts.append(chunk.reshape(b, -1))             # [B, (F+n_ov-1)*hop]
        wchunk = np.tile(wsq[j * hop: (j + 1) * hop], (f, 1))
        wchunk = np.pad(wchunk, ((j, n_overlap - 1 - j), (0, 0)))
        wss_parts.append(wchunk.reshape(-1))
    sig = sum(parts)
    wss = np.sum(np.stack(wss_parts), axis=0)
    sig = sig / jnp.asarray(np.where(wss > 1e-11, wss, 1.0))
    trim = (n_fft - hop) // 2
    return sig[:, trim: trim + f * hop]


class HiFiGANiSTFTGenerator(nn.Module):
    """C8C8I iSTFTNet-style generator; io-compatible with HiFiGANGenerator."""

    upsample_rates: Sequence[int] = (8, 8)
    upsample_kernel_sizes: Sequence[int] = (16, 16)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Tuple[int, ...]] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    gen_istft_n_fft: int = 16
    gen_istft_hop_size: int = 4
    n_mel_channels: int = 80
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        """mel: [B, T, n_mels] -> wav [B, T * prod(rates) * istft_hop]."""
        x = nn.Conv(
            self.upsample_initial_channel, (7,), padding=((3, 3),),
            dtype=self.dtype, param_dtype=jnp.float32, name="conv_pre",
        )(mel)
        num_kernels = len(self.resblock_kernel_sizes)
        for i, (u, k) in enumerate(
            zip(self.upsample_rates, self.upsample_kernel_sizes)
        ):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.ConvTranspose(
                ch, (k,), strides=(u,), padding="VALID",
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"up_{i}",
            )(x)
            crop = (k - u) // 2
            if crop:
                x = x[:, crop:-crop, :]
            acc = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                y = ResBlock(
                    ch, rk, tuple(rd), dtype=self.dtype,
                    name=f"resblock_{i * num_kernels + j}",
                )(x)
                acc = y if acc is None else acc + y
            x = acc / num_kernels
        x = nn.leaky_relu(x, 0.01)
        n_bins = self.gen_istft_n_fft // 2 + 1
        x = nn.Conv(
            2 * n_bins, (7,), padding=((3, 3),),
            dtype=self.dtype, param_dtype=jnp.float32, name="conv_post",
        )(x).astype(jnp.float32)
        # iSTFTNet head: log-magnitude + raw phase channels
        mag = jnp.exp(jnp.clip(x[..., :n_bins], -20.0, 6.0))
        phase = x[..., n_bins:]
        real = mag * jnp.cos(phase)
        imag = mag * jnp.sin(phase)
        return overlap_add_istft(
            real, imag, self.gen_istft_n_fft, self.gen_istft_hop_size)
