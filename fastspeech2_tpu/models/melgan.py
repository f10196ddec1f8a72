"""MelGAN generator (alternative vocoder) in Flax.

The reference pulls this model from torch.hub "descriptinc/melgan-neurips"
(utils/model.py:46-56) — unavailable offline, so the architecture is
implemented natively: reflection-padded conv stem, 4 transposed-conv
upsample stages (rates 8,8,2,2, kernel 2r) each followed by 3 dilated
residual blocks (dilations 3^i), leaky_relu(0.2) activations, tanh output
conv.  Weight norm folds at conversion.  At inference the
reference divides log-e mels by ln(10) (utils/model.py:78) — that belongs
to the caller (vocoder_infer), not the network.
"""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def _reflect_pad(x, pad):
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class MelGANResBlock(nn.Module):
    channels: int
    dilation: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.leaky_relu(x, 0.2)
        y = _reflect_pad(y, self.dilation)
        y = nn.Conv(self.channels, (3,), kernel_dilation=(self.dilation,),
                    padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_dilated")(y)
        y = nn.leaky_relu(y, 0.2)
        y = nn.Conv(self.channels, (1,), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_1x1")(y)
        shortcut = nn.Conv(self.channels, (1,), dtype=self.dtype,
                           param_dtype=jnp.float32, name="shortcut")(x)
        return shortcut + y


class MelGANGenerator(nn.Module):
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    ngf: int = 32
    n_residual_layers: int = 3
    n_mel_channels: int = 80
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        """mel: [B, T, n_mels] -> wav [B, T * prod(rates)]."""
        mult = int(2 ** len(self.upsample_rates))
        x = _reflect_pad(mel, 3)
        x = nn.Conv(mult * self.ngf, (7,), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_pre")(x)
        for i, r in enumerate(self.upsample_rates):
            x = nn.leaky_relu(x, 0.2)
            ch = mult * self.ngf // 2
            # torch: ConvTranspose1d(k=2r, stride=r, padding=r//2 + r%2,
            # output_padding=r%2) -> exactly T*r frames
            x = nn.ConvTranspose(ch, (2 * r,), strides=(r,),
                                 padding="VALID", dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name=f"up_{i}")(x)
            lo = r // 2 + r % 2
            hi = x.shape[1] - (r // 2)
            x = x[:, lo:hi, :]
            for j in range(self.n_residual_layers):
                x = MelGANResBlock(ch, dilation=3 ** j, dtype=self.dtype,
                                   name=f"res_{i}_{j}")(x)
            mult //= 2
        x = nn.leaky_relu(x, 0.2)
        x = _reflect_pad(x, 3)
        x = nn.Conv(1, (7,), padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]
