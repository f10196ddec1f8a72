"""Tacotron-2 style PostNet (reference transformer/Layers.py:67-137).

5 conv1d(k=5, 512ch) + BatchNorm layers, tanh on all but the last, dropout
0.5 after every layer; the residual add is done by the caller
(model/fastspeech2.py:97).  BatchNorm uses torch semantics (eps 1e-5,
running-stat momentum 0.1); under pjit the batch statistics are computed
over the global (all-chip) batch, which supersedes the reference's
per-replica DataParallel stats.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastspeech2_tpu.models.common import torch_bias_init, torch_kernel_init


class _MaskedBatchNorm(nn.Module):
    """BatchNorm1d with torch semantics whose batch statistics exclude
    frames beyond the batch's max mel length.

    The reference convolves exactly max(mel_len) frames, so its BatchNorm
    stats cover [B, max(mel_len)] — including each utterance's own padding
    inside that range but nothing past it.  With static bucketed T >=
    max(mel_len) a plain BatchNorm would dilute the stats with the extra
    bucket padding; masking the stat reduction restores reference parity.
    Variable tree matches nn.BatchNorm ({scale,bias} params, {mean,var}
    batch_stats) so checkpoints and the torch converters are unchanged.
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average=True, keep=None):
        # x: [B, T, C] fp32; keep: [B, T] bool, True = include in stats
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if keep is None:
                n = x.shape[0] * x.shape[1]
                mean = jnp.mean(x, axis=(0, 1))
                var = jnp.mean(jnp.square(x), axis=(0, 1)) - jnp.square(mean)
            else:
                w = keep.astype(jnp.float32)[:, :, None]
                n = jnp.maximum(jnp.sum(w), 1.0)
                mean = jnp.sum(x * w, axis=(0, 1)) / n
                var = (jnp.sum(jnp.square(x) * w, axis=(0, 1)) / n
                       - jnp.square(mean))
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                # torch updates running_var with the UNBIASED variance
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class PostNet(nn.Module):
    n_mel_channels: int = 80
    embedding_dim: int = 512
    kernel_size: int = 5
    n_convolutions: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, frame_mask=None):
        """x: [B, T, n_mels] -> [B, T, n_mels] residual correction.

        frame_mask: optional [B, T] bool, True = frame beyond the batch's
        max mel length.  The reference operates on exactly max(mel_len)
        frames, so each conv zero-pads past that boundary; with a larger
        static T we must re-zero those frames before every conv, otherwise
        BatchNorm's affine output turns them nonzero and leaks into valid
        frames through later conv windows.
        """
        zero = None
        if frame_mask is not None:
            zero = frame_mask[:, :, None]
        for i in range(self.n_convolutions):
            if zero is not None:
                x = jnp.where(zero, jnp.asarray(0.0, x.dtype), x)
            is_last = i == self.n_convolutions - 1
            features = self.n_mel_channels if is_last else self.embedding_dim
            fan_in = x.shape[-1] * self.kernel_size
            x = nn.Conv(
                features,
                kernel_size=(self.kernel_size,),
                padding="SAME",
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(fan_in),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv_{i}",
            )(x)
            x = _MaskedBatchNorm(
                features=features,
                momentum=0.9,
                epsilon=1e-5,
                name=f"bn_{i}",
            )(
                x.astype(jnp.float32),
                use_running_average=not train,
                keep=None if frame_mask is None else ~frame_mask,
            ).astype(self.dtype)
            if not is_last:
                x = jnp.tanh(x)
            x = nn.Dropout(0.5)(x, deterministic=not train)
        return x
