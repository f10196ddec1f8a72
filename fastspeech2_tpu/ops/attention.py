"""Masked multi-head scaled-dot-product attention core.

Semantics match the reference's ScaledDotProductAttention
(transformer/Modules.py:6-25): scores = QK^T / sqrt(d_k), padded KEYS are
masked before softmax, probabilities multiply V.  Two differences, both
deliberate TPU choices:

* masked scores use a large negative finite value instead of -inf, so fully
  padded query rows produce finite (uniform) probabilities instead of NaN;
  those rows are zeroed by the caller exactly as the reference's
  masked_fill does after each sublayer (transformer/Layers.py:25,28).
* softmax runs in float32 regardless of the compute dtype.

Heads stay a tensor axis ([B, H, L, Dh]) rather than being folded into the
batch dim (reference SubLayers.py:39-46) — XLA maps the batched matmuls onto
the MXU directly and the head axis is shardable for tensor parallelism.
"""

import jax.numpy as jnp

_NEG_INF = -1e9


def multi_head_attention(q, k, v, key_pad_mask, dtype=None):
    """Attention over [B, H, L, Dh] tensors.

    Args:
      q, k, v:       [B, H, L, Dh]
      key_pad_mask:  [B, L] bool, True = padded key position.
      dtype:         output dtype (defaults to q.dtype).

    Returns:
      [B, H, L, Dh] attention output.
    """
    out_dtype = dtype or q.dtype
    d_k = q.shape[-1]
    scale = 1.0 / (d_k ** 0.5)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(key_pad_mask[:, None, None, :], _NEG_INF, scores)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(out_dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)
