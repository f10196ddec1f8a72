"""Fused multi-head self-attention as a Pallas TPU kernel.

TTS FFT-block attention is small (L <= ~1024, d_head 128): a whole
(batch, head) slice — Q, K, V tiles and the LxL score matrix — fits in
VMEM, so instead of flash-style tiling the kernel computes
QK^T -> mask -> softmax -> PV in one VMEM-resident pass per grid cell,
eliminating the HBM round-trips XLA's unfused lowering makes for the score
and probability tensors.  Numerics match fastspeech2_tpu.ops.attention
(fp32 scores/softmax, -1e9 key masking).

The backward pass is also a fused Pallas kernel: probabilities are
recomputed in VMEM from the saved inputs (one extra QK^T), then
dV = P^T g, dP = g V^T, dS = P (dP - rowsum(dP o P)) scale, dQ = dS K,
dK = dS^T Q — five MXU matmuls per (batch, head) with no HBM round-trips
for P/dP/dS.  When the backward working set would overflow VMEM the op
falls back to the XLA recompute VJP (and to an unfused XLA forward when
even the forward tile does not fit).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

from fastspeech2_tpu.ops.attention import multi_head_attention as _xla_mha

_NEG_INF = -1e9


def _qkv_sharding(mesh, arg_shapes):
    """Partitioning rule shared by the attention kernels: [B, H, L, D]
    operands may be sharded on batch (data parallel) and heads (tensor
    parallel); L and D are replicated because each kernel instance needs
    the full sequence and head_dim.  Mosaic kernels have no GSPMD rule of
    their own, so without this XLA gathers every operand and runs the
    kernel fully replicated on sharded meshes."""
    q = arg_shapes[0].sharding
    spec = q.spec if isinstance(q, NamedSharding) else P()
    b = spec[0] if len(spec) > 0 else None
    h = spec[1] if len(spec) > 1 else None
    qkv = NamedSharding(mesh, P(b, h, None, None))
    mask = NamedSharding(mesh, P(b, None))
    return qkv, mask


def _make_partitioned(is_bwd, interpret):
    """Wrap the forward or backward Pallas call in custom_partitioning so
    batch/head-sharded operands run the kernel per-shard instead of being
    gathered.  The shardy rule (and the legacy GSPMD callbacks) mark L and
    D as must-replicate: each kernel instance needs the full sequence and
    head_dim."""
    if is_bwd:
        def impl(q, k, v, maskf, g):
            return _pallas_backward_impl(q, k, v, maskf, g, interpret)
        rule = ("b h l d, b h l d, b h l d, b l, b h l d "
                "-> b h l d, b h l d, b h l d")
    else:
        def impl(q, k, v, maskf):
            return _pallas_forward_impl(q, k, v, maskf, interpret)
        rule = "b h l d, b h l d, b h l d, b l -> b h l d"

    fn = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        qkv, _ = _qkv_sharding(mesh, arg_shapes)
        return (qkv, qkv, qkv) if is_bwd else qkv

    def partition(mesh, arg_shapes, result_shape):
        qkv, mask = _qkv_sharding(mesh, arg_shapes)
        if is_bwd:
            arg_sh = (qkv, qkv, qkv, mask, qkv)
            res_sh = (qkv, qkv, qkv)
        else:
            arg_sh = (qkv, qkv, qkv, mask)
            res_sh = qkv
        return mesh, impl, res_sh, arg_sh

    fn.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        need_replication_factors=("l", "d"),
        decode_shardings=True,
    )
    return fn


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


def _pallas_forward_impl(q, k, v, maskf, interpret):
    B, H, L, D = q.shape
    scale = 1.0 / math.sqrt(D)
    # [B, 1, L]: a (1, 1, L) block satisfies Mosaic's (8, 128)-divisible-
    # or-full-dimension rule for the trailing two dims
    maskf = maskf[:, None, :]
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


def _mha_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref,
                    dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0, 0]                      # [L, D]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    mask = mask_ref[0, 0]                # [L] float, 1.0 = padded key
    g = g_ref[0, 0]                      # [L, D]

    # recompute probabilities in VMEM (cheaper than streaming P from HBM)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    scores = jnp.where(mask[None, :] > 0.5, _NEG_INF, scores)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)          # [L, L] fp32

    gf = g.astype(jnp.float32)
    # dV = P^T g
    dv = jax.lax.dot_general(
        p, gf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dP = g V^T
    dp = jax.lax.dot_general(
        gf, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # softmax VJP: dS = P * (dP - rowsum(dP * P)); masked cols have P = 0
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds * scale
    dq = jnp.dot(ds, k.astype(jnp.float32),
                 preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _pallas_backward_impl(q, k, v, maskf, g, interpret):
    B, H, L, D = q.shape
    scale = 1.0 / math.sqrt(D)
    maskf = maskf[:, None, :]
    kernel = functools.partial(_mha_bwd_kernel, scale=scale)
    qkv_spec = pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, 1, L), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            qkv_spec,
        ],
        out_specs=[qkv_spec, qkv_spec, qkv_spec],
        out_shape=[jax.ShapeDtypeStruct((B, H, L, D), q.dtype)] * 3,
        interpret=interpret,
    )(q, k, v, maskf, g)


_PARTITIONED_CACHE = {}


def _partitioned(is_bwd, interpret):
    key = (is_bwd, interpret)
    if key not in _PARTITIONED_CACHE:
        _PARTITIONED_CACHE[key] = _make_partitioned(is_bwd, interpret)
    return _PARTITIONED_CACHE[key]


def _pallas_forward(q, k, v, key_pad_mask, interpret=False):
    maskf = key_pad_mask.astype(jnp.float32)
    return _partitioned(False, interpret)(q, k, v, maskf)


def _pallas_backward(q, k, v, key_pad_mask, g, interpret=False):
    maskf = key_pad_mask.astype(jnp.float32)
    return _partitioned(True, interpret)(q, k, v, maskf, g)


def _bwd_fits_vmem(L, D, dtype, budget=12 * 1024 * 1024):
    """q/k/v/g + dq/dk/dv tiles plus P, dP, dS fp32 [L, L] temps."""
    itemsize = jnp.dtype(dtype).itemsize
    return 7 * L * D * itemsize + 3 * L * L * 4 <= budget


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_multi_head_attention(q, k, v, key_pad_mask, interpret=False):
    """Drop-in replacement for ops.attention.multi_head_attention on TPU."""
    return _pallas_forward(q, k, v, key_pad_mask, interpret=interpret)


def _fwd(q, k, v, key_pad_mask, interpret):
    out = _pallas_forward(q, k, v, key_pad_mask, interpret=interpret)
    return out, (q, k, v, key_pad_mask)


def _bwd(interpret, residuals, g):
    q, k, v, key_pad_mask = residuals
    L, D = q.shape[-2:]
    if interpret or _bwd_fits_vmem(L, D, q.dtype):
        dq, dk, dv = _pallas_backward(q, k, v, key_pad_mask, g,
                                      interpret=interpret)
        return dq, dk, dv, None
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
        # pltpu (Mosaic) kernels only compile on TPU backends
        backend = ("pallas"
                   if jax.default_backend() == "tpu" else "xla")
    if backend == "pallas" and not _fits_vmem(L, D, q.dtype):
        backend = "xla"
    if backend == "pallas":
        return fused_multi_head_attention(q, k, v, key_pad_mask)
    if backend == "pallas_interpret":
        return fused_multi_head_attention(q, k, v, key_pad_mask, True)
    return _xla_mha(q, k, v, key_pad_mask)
