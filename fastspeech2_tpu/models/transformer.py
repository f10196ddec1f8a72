"""FFT-block transformer encoder/decoder (Flax).

Architecture parity with the reference (transformer/{Models,Layers,
SubLayers,Modules}.py): post-LN residual multi-head self-attention followed
by a conv(k=9)->ReLU->conv(k=1) position-wise FFN, padded rows zeroed after
each sublayer, fixed sinusoid position encodings added to the input.

TPU-first differences: static shapes everywhere, heads kept as a tensor axis
(shardable for TP), fp32 softmax/LN under a bf16 compute dtype, and the
sinusoid table generated per static length (subsuming the reference's
eval-time PE extension, Models.py:82-87/145-151).
"""

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from fastspeech2_tpu.models.common import (
    TorchDense,
    TorchLayerNorm,
    embedding_init_with_pad,
)
from fastspeech2_tpu.ops.attention import multi_head_attention
from fastspeech2_tpu.ops.masking import fill_masked
from fastspeech2_tpu.ops.positional import sinusoid_position_encoding

PAD_ID = 0


class MultiHeadSelfAttention(nn.Module):
    """Post-LN residual MHA (reference transformer/SubLayers.py:8-57)."""

    n_head: int
    d_model: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "xla"

    @nn.compact
    def __call__(self, x, key_pad_mask, deterministic=True):
        d_head = self.d_model // self.n_head
        residual = x
        b, l, _ = x.shape

        def proj(name):
            y = TorchDense(self.n_head * d_head, dtype=self.dtype, name=name)(x)
            return y.reshape(b, l, self.n_head, d_head).transpose(0, 2, 1, 3)

        q, k, v = proj("w_qs"), proj("w_ks"), proj("w_vs")
        if self.attention_backend == "xla":
            out = multi_head_attention(q, k, v, key_pad_mask,
                                       dtype=self.dtype)
        else:
            from fastspeech2_tpu.ops.pallas_attention import attention_op

            out = attention_op(q, k, v, key_pad_mask,
                               backend=self.attention_backend)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, self.n_head * d_head)
        out = TorchDense(self.d_model, dtype=self.dtype, name="fc")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return TorchLayerNorm(self.d_model, dtype=self.dtype)(out + residual)


class _ConvParamsLeaf(nn.Module):
    """Raw conv1d parameters under the same tree path nn.Conv would use."""

    out_features: int
    kernel_size: int
    in_features: int

    @nn.compact
    def __call__(self):
        from fastspeech2_tpu.models.common import (
            torch_bias_init,
            torch_kernel_init,
        )

        kernel = self.param(
            "kernel", torch_kernel_init,
            (self.kernel_size, self.in_features, self.out_features))
        bias = self.param(
            "bias", torch_bias_init(self.in_features * self.kernel_size),
            (self.out_features,))
        return kernel, bias


class _ConvParams(nn.Module):
    out_features: int
    kernel_size: int
    in_features: int

    @nn.compact
    def __call__(self):
        return _ConvParamsLeaf(self.out_features, self.kernel_size,
                               self.in_features, name="Conv_0")()


class _LNParamsLeaf(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _LNParams(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        return _LNParamsLeaf(self.features, name="LayerNorm_0")()


class ConvFeedForward(nn.Module):
    """conv1d(k0) -> ReLU -> conv1d(k1) -> dropout -> post-LN residual
    (reference transformer/SubLayers.py:60-93).

    In deterministic mode with a Pallas backend the whole block runs as one
    fused VMEM-resident kernel (ops/pallas_ffn.py); training (dropout
    active), hidden-sharded TP, and CPU use the XLA formulation.  Both
    share the same params.  Measured resolution (docs/tpu_notes.md): XLA
    runs the training FFN fwd+bwd at ~230/167 TF/s on-chip — at the bf16
    speed of light — so no training/TP kernel is warranted; TP value
    parity and the partial-sum collective are pinned by
    test_pallas_ffn.py::test_xla_ffn_tp_parity_hidden_sharded.
    """

    d_model: int
    d_inner: int
    kernel_size: Tuple[int, int]
    dropout: float
    dtype: jnp.dtype = jnp.float32
    ffn_backend: str = "xla"

    @nn.compact
    def __call__(self, x, deterministic=True):
        w1, b1 = _ConvParams(self.d_inner, self.kernel_size[0],
                             self.d_model, name="w_1")()
        w2, b2 = _ConvParams(self.d_model, self.kernel_size[1],
                             self.d_inner, name="w_2")()
        ln_scale, ln_bias = _LNParams(self.d_model,
                                      name="TorchLayerNorm_0")()

        backend = self.ffn_backend
        if backend == "auto":
            import jax

            # pltpu (Mosaic) kernels only compile on TPU backends
            backend = ("pallas" if jax.default_backend() == "tpu"
                       else "xla")
        if backend == "pallas":
            from fastspeech2_tpu.ops.pallas_ffn import ffn_fits_vmem

            L = x.shape[1]
            if not ffn_fits_vmem(L, self.d_model, self.d_inner,
                                 self.kernel_size[0], self.kernel_size[1],
                                 x.dtype):
                backend = "xla"
        if deterministic and backend in ("pallas", "pallas_interpret"):
            from fastspeech2_tpu.ops.pallas_ffn import fused_conv_ffn

            return fused_conv_ffn(
                x, w1, b1, w2, b2, ln_scale, ln_bias,
                backend == "pallas_interpret")

        import jax as _jax

        # no preferred_element_type here: its transpose rule rejects the
        # mixed f32-cotangent/bf16-operand convs under jax.grad; the MXU
        # accumulates bf16 matmuls in f32 internally regardless
        residual = x.astype(jnp.float32)
        y = _jax.lax.conv_general_dilated(
            x, w1.astype(x.dtype), (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC")) + b1.astype(x.dtype)
        y = jnp.maximum(y, 0.0)
        y = _jax.lax.conv_general_dilated(
            y, w2.astype(x.dtype), (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC")) + b2.astype(x.dtype)
        y = nn.Dropout(self.dropout)(
            y.astype(self.dtype), deterministic=deterministic)
        y = y.astype(jnp.float32) + residual
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - jnp.square(mu)
        out = (y - mu) * _jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias
        return out.astype(self.dtype)


class FFTBlock(nn.Module):
    """Self-attention + conv FFN, zeroing padded rows after each sublayer
    (reference transformer/Layers.py:11-30)."""

    d_model: int
    n_head: int
    d_inner: int
    kernel_size: Tuple[int, int]
    dropout: float
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "xla"
    ffn_backend: str = "xla"

    @nn.compact
    def __call__(self, x, pad_mask, deterministic=True):
        x = MultiHeadSelfAttention(
            self.n_head, self.d_model, self.dropout, dtype=self.dtype,
            attention_backend=self.attention_backend, name="slf_attn",
        )(x, pad_mask, deterministic=deterministic)
        x = fill_masked(x, pad_mask)
        x = ConvFeedForward(
            self.d_model, self.d_inner, self.kernel_size, self.dropout,
            dtype=self.dtype, ffn_backend=self.ffn_backend, name="pos_ffn",
        )(x, deterministic=deterministic)
        x = fill_masked(x, pad_mask)
        return x


class Encoder(nn.Module):
    """Phone embedding + PE + N x FFTBlock (reference transformer/Models.py:33-100)."""

    vocab_size: int
    n_layers: int
    n_head: int
    d_model: int
    d_inner: int
    kernel_size: Tuple[int, int]
    dropout: float
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "xla"
    ffn_backend: str = "xla"
    remat: bool = False

    @nn.compact
    def __call__(self, src_seq, src_pad_mask, deterministic=True):
        emb = nn.Embed(
            self.vocab_size,
            self.d_model,
            embedding_init=embedding_init_with_pad(PAD_ID),
            param_dtype=jnp.float32,
            dtype=self.dtype,
            name="src_word_emb",
        )(src_seq)
        seq_len = src_seq.shape[1]
        pe = sinusoid_position_encoding(seq_len, self.d_model, dtype=self.dtype)
        x = emb + pe[None, :, :]
        # deterministic passes positionally: remat static_argnums counts
        # the module itself as arg 0
        block_cls = (nn.remat(FFTBlock, static_argnums=(3,))
                     if self.remat else FFTBlock)
        for i in range(self.n_layers):
            x = block_cls(
                self.d_model, self.n_head, self.d_inner, self.kernel_size,
                self.dropout, dtype=self.dtype,
                attention_backend=self.attention_backend,
                ffn_backend=self.ffn_backend, name=f"layer_{i}",
            )(x, src_pad_mask, deterministic)
        return x


class Decoder(nn.Module):
    """PE + N x FFTBlock over frames; truncates to max_seq_len like the
    reference's training path (transformer/Models.py:154-162).  With static
    bucketed frame lengths the truncation is a compile-time slice."""

    n_layers: int
    n_head: int
    d_model: int
    d_inner: int
    kernel_size: Tuple[int, int]
    dropout: float
    max_seq_len: int = 1000
    dtype: jnp.dtype = jnp.float32
    attention_backend: str = "xla"
    ffn_backend: str = "xla"
    remat: bool = False

    @nn.compact
    def __call__(self, x, mel_pad_mask, deterministic=True,
                 truncate_to_max_len=True):
        seq_len = x.shape[1]
        if truncate_to_max_len and seq_len > self.max_seq_len:
            x = x[:, : self.max_seq_len]
            mel_pad_mask = mel_pad_mask[:, : self.max_seq_len]
            seq_len = self.max_seq_len
        pe = sinusoid_position_encoding(seq_len, self.d_model, dtype=self.dtype)
        x = x + pe[None, :, :]
        block_cls = (nn.remat(FFTBlock, static_argnums=(3,))
                     if self.remat else FFTBlock)
        for i in range(self.n_layers):
            x = block_cls(
                self.d_model, self.n_head, self.d_inner, self.kernel_size,
                self.dropout, dtype=self.dtype,
                attention_backend=self.attention_backend,
                ffn_backend=self.ffn_backend, name=f"layer_{i}",
            )(x, mel_pad_mask, deterministic)
        return x, mel_pad_mask
