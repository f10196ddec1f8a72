"""HiFi-GAN discriminators (MPD + MSD) in Flax.

The reference vendors only the HiFi-GAN *generator*
(reference hifigan/models.py:112-174) — its training code is absent — so
vocoder training is a capability superset of the reference.  Architectures
follow the HiFi-GAN paper / upstream jik876/hifi-gan trainer:

* MultiPeriodDiscriminator: one 2-D conv stack per period p in
  (2, 3, 5, 7, 11); the waveform is reflect-padded to a multiple of p and
  folded to [B, T/p, p, 1] so periodic structure lands on the second axis.
* MultiScaleDiscriminator: three 1-D grouped-conv stacks at x1, x2, x4
  average-pooled scales.

Each sub-discriminator returns (feature_maps, score) so the generator can
use feature-matching loss.  Weight/spectral normalization from the torch
trainer is intentionally not replicated: plain kernels train fine with the
same losses and keep every conv a single fused XLA op on the MXU.

Everything is channels-last; wavs enter as [B, T].
"""

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

LRELU_SLOPE = 0.1


class PeriodDiscriminator(nn.Module):
    """One MPD branch: fold at ``period`` then conv2d (5,1)/(3,1) stack."""

    period: int
    channels: Sequence[int] = (32, 128, 512, 1024, 1024)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y):
        b, t = y.shape
        p = self.period
        pad = (p - t % p) % p
        if pad:
            y = jnp.concatenate([y, y[:, t - pad:][:, ::-1]], axis=1)
        x = y.reshape(b, -1, p, 1)                        # [B, T/p, p, 1]
        fmap = []
        for i, ch in enumerate(self.channels):
            stride = 1 if i == len(self.channels) - 1 else 3
            x = nn.Conv(
                ch, (5, 1), strides=(stride, 1),
                padding=((2, 2), (0, 0)),
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.Conv(
            1, (3, 1), padding=((1, 1), (0, 0)),
            dtype=self.dtype, param_dtype=jnp.float32, name="conv_post",
        )(x)
        fmap.append(x)
        return fmap, x.reshape(b, -1)


class ScaleDiscriminator(nn.Module):
    """One MSD branch: grouped 1-D conv stack over the raw waveform."""

    dtype: jnp.dtype = jnp.float32
    # (channels, kernel, stride, groups)
    layers: Sequence[Tuple[int, int, int, int]] = (
        (128, 15, 1, 1),
        (128, 41, 2, 4),
        (256, 41, 2, 16),
        (512, 41, 4, 16),
        (1024, 41, 4, 16),
        (1024, 41, 1, 16),
        (1024, 5, 1, 1),
    )

    @nn.compact
    def __call__(self, y):
        x = y[:, :, None]                                  # [B, T, 1]
        fmap = []
        for i, (ch, k, s, g) in enumerate(self.layers):
            x = nn.Conv(
                ch, (k,), strides=(s,), padding=((k // 2, k // 2),),
                feature_group_count=g,
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.Conv(
            1, (3,), padding=((1, 1),),
            dtype=self.dtype, param_dtype=jnp.float32, name="conv_post",
        )(x)
        fmap.append(x)
        return fmap, x[..., 0]


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channels: Sequence[int] = (32, 128, 512, 1024, 1024)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y):
        fmaps, scores = [], []
        for p in self.periods:
            f, s = PeriodDiscriminator(
                p, channels=self.channels, dtype=self.dtype,
                name=f"period_{p}")(y)
            fmaps.append(f)
            scores.append(s)
        return fmaps, scores


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 3
    layers: Sequence[Tuple[int, int, int, int]] = \
        ScaleDiscriminator.layers
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y):
        fmaps, scores = [], []
        x = y
        for i in range(self.n_scales):
            if i > 0:
                # torch AvgPool1d(4, stride=2, padding=2),
                # count_include_pad=True
                x = nn.avg_pool(
                    x[:, :, None], (4,), strides=(2,),
                    padding=((2, 2),), count_include_pad=True)[..., 0]
            f, s = ScaleDiscriminator(
                layers=self.layers, dtype=self.dtype, name=f"scale_{i}")(x)
            fmaps.append(f)
            scores.append(s)
        return fmaps, scores


class HiFiGANDiscriminators(nn.Module):
    """MPD + MSD under one param tree, one apply."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    n_scales: int = 3
    period_channels: Sequence[int] = (32, 128, 512, 1024, 1024)
    scale_layers: Sequence[Tuple[int, int, int, int]] = \
        ScaleDiscriminator.layers
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y):
        fp, sp = MultiPeriodDiscriminator(
            self.periods, channels=self.period_channels,
            dtype=self.dtype, name="mpd")(y)
        fs, ss = MultiScaleDiscriminator(
            self.n_scales, layers=self.scale_layers,
            dtype=self.dtype, name="msd")(y)
        return fp + fs, sp + ss
