"""Shared Flax building blocks: torch-compatible initializers, layer norm.

Initializers replicate PyTorch layer defaults so that training dynamics match
the reference: nn.Linear / nn.Conv1d use kaiming_uniform(a=sqrt(5)) for
weights — equivalent to U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — and the same
bound for biases; nn.Embedding uses N(0, 1) with the padding row zeroed.
"""

import jax.numpy as jnp
from flax import linen as nn
from jax import random

# kaiming_uniform(a=sqrt(5)) == variance_scaling(1/3, fan_in, uniform):
# bound = sqrt(3 * (1/3) / fan_in) = 1/sqrt(fan_in)
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_bias_init(fan_in):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def embedding_init_with_pad(pad_id=0):
    """N(0,1) embedding with the pad row zeroed (torch padding_idx)."""

    def init(key, shape, dtype=jnp.float32):
        emb = random.normal(key, shape, dtype)
        return emb.at[pad_id].set(0.0)

    return init


class TorchLayerNorm(nn.Module):
    """LayerNorm with torch's eps, computed in fp32, cast back to dtype."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32)(x.astype(jnp.float32))
        return y.astype(self.dtype)


class TorchDense(nn.Module):
    """Dense layer with torch-default init."""

    features: int
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class TorchConv1d(nn.Module):
    """1-D convolution over [B, L, C] with torch-default init.

    `padding` 'SAME' reproduces torch's pad=(k-1)//2 for odd kernels.
    """

    features: int
    kernel_size: int
    dilation: int = 1
    padding: str = "SAME"
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel_size
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
