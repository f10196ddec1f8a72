"""Tacotron-2 style PostNet (reference transformer/Layers.py:67-137).

5 conv1d(k=5, 512ch) + BatchNorm layers, tanh on all but the last, dropout
0.5 after every layer; the residual add is done by the caller
(model/fastspeech2.py:97).  BatchNorm uses torch semantics (eps 1e-5,
running-stat momentum 0.1); under pjit the batch statistics are computed
over the global (all-chip) batch, which supersedes the reference's
per-replica DataParallel stats.
"""

import jax.numpy as jnp
from flax import linen as nn

from fastspeech2_tpu.models.common import torch_bias_init, torch_kernel_init


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
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                name=f"bn_{i}",
            )(x.astype(jnp.float32)).astype(self.dtype)
            if not is_last:
                x = jnp.tanh(x)
            x = nn.Dropout(0.5)(x, deterministic=not train)
        return x
