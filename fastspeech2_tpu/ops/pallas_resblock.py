"""Fused HiFi-GAN MRF ResBlock as a Pallas TPU kernel for narrow channels.

STATUS: measured NET-NEGATIVE on v5e — kept as a correct, tested opt-in
('pallas' backend) and a documented experiment, NOT the default.

The parity vocoder's last two stages run at C=64 and C=32 channels
(reference hifigan/models.py:112-174).  Hypothesis: a conv1d at C
channels contracts only K=C of the MXU's 128 contraction rows, so packing
G = 128 // C tap-shifted input copies along K

    lhs  = [x(<<s_j0) | x(<<s_j1) | ...]          [S, G*C] = [S, 128]
    rhs  = [W_j0 ; W_j1 ; ...]                    [G*C, C]
    y   += lhs @ rhs        (fp32 accumulation)

plus fusing the whole residual block — 3 dilation units of
(lrelu -> dilated conv k -> lrelu -> conv k -> +residual), reference
hifigan/models.py:20-109 — in VMEM would beat XLA's unfused convs.

Measurement (B=32, stage lengths, bf16; docs/tpu_notes.md): ~2x SLOWER
than XLA at every (C, k): XLA's im2col conv lowering already packs the k
taps into a full contraction dim without spending VPU cycles, while this
kernel pays k sublane-rotation copies on half-/quarter-filled lanes to
build the same lhs, and the N=C output underfill (the real ceiling at
~98/49 TF/s for C=64/32) caps both approaches equally.  The halo
exchange uses three shifted BlockSpecs (edge tiles zero-fill), which
also triples input DMA traffic.

Inference-only (the vocoder trains through the XLA path); backward, if
ever taken, recomputes through the XLA reference via custom_vjp.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

LRELU_SLOPE = 0.1


def _lrelu(x):
    # max/min formulation: exactly leaky_relu, with no comparison/select
    # (Mosaic rejects some compares inside the kernel)
    return jnp.maximum(x, 0) + x.dtype.type(LRELU_SLOPE) * jnp.minimum(x, 0)


def xla_resblock(x, w1, b1, w2, b2, dilations):
    """Reference implementation (and the backward path).

    x [B, L, C]; w1/w2 [U, k, C, C]; b1/b2 [U, C]; one (conv1 dilated,
    conv2 plain) pair per dilation unit, residual-added as in
    models/hifigan.py::ResBlock.
    """
    k = w1.shape[1]
    for u, d in enumerate(dilations):
        pad = (k * d - d) // 2
        xt = _lrelu(x)
        xt = jax.lax.conv_general_dilated(
            xt, w1[u].astype(x.dtype), (1,), ((pad, pad),),
            rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32) + b1[u]
        xt = _lrelu(xt).astype(x.dtype)
        pad2 = (k - 1) // 2
        xt = jax.lax.conv_general_dilated(
            xt, w2[u].astype(x.dtype), (1,), ((pad2, pad2),),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32) + b2[u]
        x = (x.astype(jnp.float32) + xt).astype(x.dtype)
    return x


def _halo(k, dilations):
    """Input margin consumed by the full unit chain on each side."""
    p = (k - 1) // 2
    return p * sum(d + 1 for d in dilations)


def _pack_weights(w, g):
    """[U, k, C, C] -> [U, ceil(k/g), g*C, C]: taps stacked along the
    contraction dim per chunk, zero rows for the ragged last chunk."""
    u, k, c, _ = w.shape
    nch = -(-k // g)
    wp = jnp.zeros((u, nch, g * c, c), w.dtype)
    for ci in range(nch):
        for ti in range(min(g, k - ci * g)):
            wp = wp.at[:, ci, ti * c:(ti + 1) * c, :].set(w[:, ci * g + ti])
    return wp


def _conv_taps(t, wp_ref, u, k, d, s_lo, s_hi, c, lhs_ref):
    """Tap-packed conv: t [S, C] -> y fp32 [s_hi - s_lo rows, C].

    Output rows [s_lo, s_hi) of the buffer; tap j reads rows shifted by
    (j - p) * d, all static slices.  ALL k shifted copies are first
    written side-by-side into the wide lhs_ref scratch, then each matmul
    contracts a full G*C = 128 column block: Mosaic can neither
    lane-concatenate slices with different sublane offsets nor (observed
    on v5e) correctly order scratch re-writes between chunked dots, so
    stores and dots are strictly phase-separated.
    """
    p = (k - 1) // 2
    g = min(max(1, 128 // c), k)
    nch = -(-k // g)
    n = s_hi - s_lo
    for sl in range(nch * g):
        # ragged tail slots duplicate the last tap (their packed weight
        # rows are zero; never left uninitialized, NaN * 0 = NaN)
        j = min(sl, k - 1)
        lhs_ref[0:n, sl * c:(sl + 1) * c] = (
            t[s_lo + (j - p) * d: s_hi + (j - p) * d, :])
    y = jnp.zeros((n, c), jnp.float32)
    for ci in range(nch):
        y = y + jnp.dot(lhs_ref[0:n, ci * g * c:(ci + 1) * g * c],
                        wp_ref[u, ci],
                        preferred_element_type=jnp.float32)
    return y


def _resblock_kernel(xprev_ref, xcur_ref, xnext_ref, w1_ref, b1_ref,
                     w2_ref, b2_ref, o_ref, xbuf, lhs_ref, *, k, dilations,
                     lt, halo):
    i = pl.program_id(1)
    nl = pl.num_programs(1)
    c = xcur_ref.shape[-1]
    s = lt + 2 * halo
    p = (k - 1) // 2

    # comparison-free edge indicators (Mosaic: "target does not support
    # this comparison" for select chains inside this kernel)
    left = jnp.minimum(i, 1).astype(jnp.float32)           # 0 iff first tile
    right = jnp.minimum(nl - 1 - i, 1).astype(jnp.float32)  # 0 iff last
    xbuf[0:halo, :] = xprev_ref[0, lt - halo:, :] * left.astype(xbuf.dtype)
    xbuf[halo:halo + lt, :] = xcur_ref[0]
    xbuf[halo + lt:, :] = xnext_ref[0, :halo, :] * right.astype(xbuf.dtype)

    # The margin of not-yet-computable rows grows by each conv's padding;
    # halo = sum of all pads, so the final valid region is exactly the
    # central [halo, halo + lt) written to o_ref.  At sequence edges each
    # conv's SAME padding must be zero on ITS OWN input (the unfused path
    # zero-pads every conv), so out-of-sequence halo rows are re-zeroed
    # before every conv — otherwise bias/lrelu values would leak in.
    # comparison-free edge mask: inl = 0 on the left-halo rows else 1,
    # irh = 1 on the right-halo rows else 0 (clip = min/max, supported)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (s, c), 0)
    inl = jnp.clip(ridx - (halo - 1), 0, 1).astype(jnp.float32)
    irh = jnp.clip(ridx - (s - halo - 1), 0, 1).astype(jnp.float32)
    edge = ((left + (1.0 - left) * inl)
            * (1.0 - (1.0 - right) * irh)).astype(xbuf.dtype)
    m = 0
    for u, d in enumerate(dilations):
        m1 = m + p * d
        t = _lrelu(xbuf[...]) * edge
        y = _conv_taps(t, w1_ref, u, k, d, m1, s - m1, c, lhs_ref)
        y = y + b1_ref[0, u].astype(jnp.float32)
        m2 = m1 + p
        # t2 rows live in buffer coords [m1, s - m1); shift the conv2
        # window into t2's local coordinates instead of re-padding
        t2 = _lrelu(y).astype(xbuf.dtype) * edge[m1:s - m1]
        y2 = _conv_taps(t2, w2_ref, u, k, 1, m2 - m1, s - m2 - m1, c,
                        lhs_ref)
        y2 = y2 + b2_ref[0, u].astype(jnp.float32)
        xbuf[m2:s - m2, :] = (
            xbuf[m2:s - m2, :].astype(jnp.float32) + y2).astype(xbuf.dtype)
        m = m2

    o_ref[0] = xbuf[halo:halo + lt, :]


def _pick_tile(length):
    for lt in (2048, 1024, 512, 256):
        if length % lt == 0:
            return lt
    return length


def _pallas_forward(x, w1, b1, w2, b2, dilations, interpret=False):
    B, L, C = x.shape
    U, k = w1.shape[0], w1.shape[1]
    halo = _halo(k, dilations)
    lt = _pick_tile(L)
    if lt <= halo:
        return xla_resblock(x, w1, b1, w2, b2, dilations)
    nl = L // lt
    dt = x.dtype
    # cap tap-group size at k: beyond that the extra slots are pure
    # zero-weight padding (and interpret-mode cost)
    g = min(max(1, 128 // C), k)
    nch = -(-k // g)
    kernel = functools.partial(_resblock_kernel, k=k,
                               dilations=tuple(dilations), lt=lt, halo=halo)

    def clamp_prev(b, i):
        return (b, jnp.maximum(i - 1, 0), 0)

    def clamp_next(b, i):
        return (b, jnp.minimum(i + 1, nl - 1), 0)

    w_spec = pl.BlockSpec((U, nch, g * C, C), lambda b, i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, U, C), lambda b, i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, nl),
        in_specs=[
            pl.BlockSpec((1, lt, C), clamp_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lt, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lt, C), clamp_next, memory_space=pltpu.VMEM),
            w_spec, b_spec, w_spec, b_spec,
        ],
        out_specs=pl.BlockSpec((1, lt, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, C), dt),
        scratch_shapes=[
            pltpu.VMEM((lt + 2 * halo, C), dt),
            pltpu.VMEM((lt + 2 * halo, nch * g * C), dt),
        ],
        interpret=interpret,
    )(x, x, x, _pack_weights(w1.astype(dt), g), b1[None].astype(dt),
      _pack_weights(w2.astype(dt), g), b2[None].astype(dt))


def _make_partitioned(dilations, interpret):
    """Batch-sharding rule (grid is per batch row already); weights
    replicate.  Mirrors pallas_ffn._make_partitioned."""

    def impl(x, w1, b1, w2, b2):
        return _pallas_forward(x, w1, b1, w2, b2, dilations,
                               interpret=interpret)

    fn = custom_partitioning(impl)

    def shardings(mesh, arg_shapes):
        spec = (arg_shapes[0].sharding.spec
                if isinstance(arg_shapes[0].sharding, NamedSharding) else P())
        b = spec[0] if len(spec) > 0 else None
        x_sh = NamedSharding(mesh, P(b, None, None))
        rep4 = NamedSharding(mesh, P(None, None, None, None))
        rep2 = NamedSharding(mesh, P(None, None))
        return x_sh, (x_sh, rep4, rep2, rep4, rep2)

    def infer(mesh, arg_shapes, result_shape):
        return shardings(mesh, arg_shapes)[0]

    def partition(mesh, arg_shapes, result_shape):
        x_sh, arg_sh = shardings(mesh, arg_shapes)
        return mesh, impl, x_sh, arg_sh

    fn.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b l c, u k c2 c3, u2 c4, u3 k2 c5 c6, u4 c7 -> b l c",
        need_replication_factors=("l", "c", "u", "k", "c2", "c3", "u2",
                                  "c4", "u3", "k2", "c5", "c6", "u4", "c7"),
        decode_shardings=True,
    )
    return fn


_PARTITIONED_CACHE = {}


def _partitioned(dilations, interpret):
    key = (tuple(dilations), interpret)
    if key not in _PARTITIONED_CACHE:
        _PARTITIONED_CACHE[key] = _make_partitioned(tuple(dilations),
                                                    interpret)
    return _PARTITIONED_CACHE[key]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_resblock(x, w1, b1, w2, b2, dilations, interpret=False):
    """Fused MRF ResBlock: x [B, L, C] -> [B, L, C].

    w1/w2 [U, k, C, C] (flax Conv layout [k, Cin, Cout] per unit),
    b1/b2 [U, C]; dilations length-U tuple (reference (1, 3, 5)).
    """
    return _partitioned(dilations, interpret)(x, w1, b1, w2, b2)


def _fwd(x, w1, b1, w2, b2, dilations, interpret):
    out = _partitioned(dilations, interpret)(x, w1, b1, w2, b2)
    return out, (x, w1, b1, w2, b2)


def _bwd(dilations, interpret, residuals, g):
    x, w1, b1, w2, b2 = residuals
    _, vjp = jax.vjp(
        lambda *a: xla_resblock(*a, dilations=dilations), x, w1, b1, w2, b2)
    return vjp(g)


fused_resblock.defvjp(_fwd, _bwd)
