"""Fused multi-head self-attention as a Pallas TPU kernel.

TTS FFT-block attention is small (L <= ~1024, d_head 128): a whole
(batch, head) slice — Q, K, V tiles and the LxL score matrix — fits in
VMEM, so instead of flash-style tiling the kernel computes
QK^T -> mask -> softmax -> PV in one VMEM-resident pass per grid cell,
eliminating the HBM round-trips XLA's unfused lowering makes for the score
and probability tensors.  Numerics match fastspeech2_tpu.ops.attention
(fp32 scores/softmax, -1e9 key masking).

The backward pass is the XLA reference implementation via jax.custom_vjp —
recomputed from saved inputs, which for these sizes is cheaper than saving
probabilities.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastspeech2_tpu.ops.attention import multi_head_attention as _xla_mha

_NEG_INF = -1e9


def _mha_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0, 0]                      # [L, D]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    mask = mask_ref[0, 0]                # [L] float, 1.0 = padded key

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                            # [L, L]
    scores = jnp.where(mask[None, :] > 0.5, _NEG_INF, scores)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _pallas_forward(q, k, v, key_pad_mask, interpret=False):
    B, H, L, D = q.shape
    scale = 1.0 / math.sqrt(D)
    # [B, 1, L]: a (1, 1, L) block satisfies Mosaic's (8, 128)-divisible-
    # or-full-dimension rule for the trailing two dims
    maskf = key_pad_mask.astype(jnp.float32)[:, None, :]
    kernel = functools.partial(_mha_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
        interpret=interpret,
    )(q, k, v, maskf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_multi_head_attention(q, k, v, key_pad_mask, interpret=False):
    """Drop-in replacement for ops.attention.multi_head_attention on TPU."""
    return _pallas_forward(q, k, v, key_pad_mask, interpret=interpret)


def _fwd(q, k, v, key_pad_mask, interpret):
    out = _pallas_forward(q, k, v, key_pad_mask, interpret=interpret)
    return out, (q, k, v, key_pad_mask)


def _bwd(interpret, residuals, g):
    q, k, v, key_pad_mask = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_mha(q, k, v, key_pad_mask), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


fused_multi_head_attention.defvjp(_fwd, _bwd)


def _fits_vmem(L, D, dtype, budget=12 * 1024 * 1024):
    """Conservative VMEM estimate for one grid cell: q/k/v/o tiles plus the
    fp32 LxL score/probability matrices (double-counted for scratch)."""
    itemsize = jnp.dtype(dtype).itemsize
    return 4 * L * D * itemsize + 2 * L * L * 4 <= budget


def attention_op(q, k, v, key_pad_mask, backend="auto"):
    """Select the attention implementation.

    backend: "auto" (pallas on TPU, XLA elsewhere), "pallas",
    "pallas_interpret" (testing), or "xla".  Falls back to XLA when the
    per-(batch, head) working set would overflow VMEM (long sequences).
    """
    L, D = q.shape[-2:]
    if backend == "auto":
        backend = ("pallas"
                   if jax.default_backend() not in ("cpu",) else "xla")
    if backend == "pallas" and not _fits_vmem(L, D, q.dtype):
        backend = "xla"
    if backend == "pallas":
        return fused_multi_head_attention(q, k, v, key_pad_mask)
    if backend == "pallas_interpret":
        return fused_multi_head_attention(q, k, v, key_pad_mask, True)
    return _xla_mha(q, k, v, key_pad_mask)
