"""HiFi-GAN generator (vocoder) in Flax.

Behavioral parity with the vendored reference generator
(hifigan/models.py:112-174, hyperparams hifigan/config.json:10-14):
conv_pre(80->512, k7) -> 4 x [leaky_relu(0.1) -> ConvTranspose upsample
(rates 8,8,2,2; kernels 16,16,4,4) -> mean of 3 multi-receptive-field
ResBlocks (k=3,7,11; dilations (1,3,5))] -> leaky_relu -> conv_post(->1, k7)
-> tanh.  Weight norm is folded into plain kernels at checkpoint conversion
(mirroring remove_weight_norm() at load, utils/model.py:68).

Everything here is channels-last [B, T, C]; XLA lowers the transposed convs
and dilated convs onto the MXU.  Trainable: MPD/MSD discriminators live in
models/hifigan_disc.py and the GAN trainer in training/vocoder.py (a
capability superset — the reference ships no vocoder trainer).  For the
TPU-fast non-parity topology see models/hifigan_istft.py.
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LRELU_SLOPE = 0.1


def _same_pad(kernel_size, dilation=1):
    pad = (kernel_size * dilation - dilation) // 2
    return ((pad, pad),)


class _RawConv(nn.Module):
    """Conv1d params under the exact tree path/shapes/inits nn.Conv uses,
    so checkpoints and the torch converters are layout-identical while the
    forward can be routed through either XLA or the fused Pallas kernel."""

    features: int
    kernel_size: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_features, self.features),
            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return kernel, bias


def resolve_resblock_backend(backend):
    """'auto' -> XLA, by measurement.  The fused Pallas resblock
    (ops/pallas_resblock.py) was built to attack the narrow-channel MXU
    underfill but measured ~2x SLOWER than XLA on v5e (e.g. C=64 k=11:
    45.5 vs 22.5 ms/resblock at B=32): XLA's im2col conv already packs
    the k taps into a full contraction dim, while the kernel pays VPU
    sublane-rotation copies to build the same lhs, and the N=C output
    underfill caps both equally (docs/tpu_notes.md).  The kernel remains
    available as an explicit 'pallas' opt-in."""
    if backend != "auto":
        return backend
    return "xla"


class ResBlock(nn.Module):
    """MRF residual block: 3 x [lrelu -> dilated conv -> lrelu -> conv]."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32
    backend: str = "xla"

    @nn.compact
    def __call__(self, x):
        convs = []
        for j, d in enumerate(self.dilations):
            w1, b1 = _RawConv(self.channels, self.kernel_size,
                              self.channels, name=f"conv1_{j}")()
            w2, b2 = _RawConv(self.channels, self.kernel_size,
                              self.channels, name=f"conv2_{j}")()
            convs.append((w1, b1, w2, b2, d))

        backend = resolve_resblock_backend(self.backend)
        if backend in ("pallas", "pallas_interpret"):
            from fastspeech2_tpu.ops.pallas_resblock import fused_resblock

            w1s = jnp.stack([c[0] for c in convs])
            b1s = jnp.stack([c[1] for c in convs])
            w2s = jnp.stack([c[2] for c in convs])
            b2s = jnp.stack([c[3] for c in convs])
            return fused_resblock(x, w1s, b1s, w2s, b2s,
                                  tuple(self.dilations),
                                  backend == "pallas_interpret")

        for w1, b1, w2, b2, d in convs:
            xt = nn.leaky_relu(x, LRELU_SLOPE).astype(self.dtype)
            xt = jax.lax.conv_general_dilated(
                xt, w1.astype(self.dtype), (1,),
                _same_pad(self.kernel_size, d), rhs_dilation=(d,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + b1.astype(self.dtype)
            xt = nn.leaky_relu(xt, LRELU_SLOPE).astype(self.dtype)
            xt = jax.lax.conv_general_dilated(
                xt, w2.astype(self.dtype), (1,),
                _same_pad(self.kernel_size, 1),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + b2.astype(self.dtype)
            x = x + xt
        return x


class HiFiGANGenerator(nn.Module):
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Tuple[int, ...]] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    n_mel_channels: int = 80
    dtype: jnp.dtype = jnp.float32
    resblock_backend: str = "auto"

    @nn.compact
    def __call__(self, mel):
        """mel: [B, T, n_mels] -> wav [B, T * prod(upsample_rates)]."""
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
            # torch ConvTranspose1d(k, stride=u, padding=(k-u)//2) yields
            # exactly T*u output frames; flax 'VALID' yields T*u + (k-u),
            # so crop the same (k-u)//2 border torch's padding removes.
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
                    backend=self.resblock_backend,
                    name=f"resblock_{i * num_kernels + j}",
                )(x)
                acc = y if acc is None else acc + y
            x = acc / num_kernels
        x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(
            1, (7,), padding=((3, 3),),
            dtype=self.dtype, param_dtype=jnp.float32, name="conv_post",
        )(x)
        return jnp.tanh(x)[..., 0]
