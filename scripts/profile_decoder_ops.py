#!/usr/bin/env python
"""Pin the decoder's backward-pass residual to per-op speeds of light.

docs/tpu_notes.md "MFU ceiling" attributes the last 5-7 MFU points to
"conv backward passes and inter-fusion boundaries" without per-op
measurement.  This script closes that gap: it times, in isolation with
in-graph scans (same measurement discipline as profile_train_step.py —
inputs perturbed per iteration, relay floor subtracted, every output
consumed), each primitive op of one decoder FFT block at the bench
shapes (b16 x L512 x d256, d_inner 1024, k=(9,1), bf16):

  - FFN conv1 k=9 (256->1024):  fwd, dgrad, wgrad  — each vs 197 TF/s
  - FFN conv2 k=1 (1024->256):  fwd, dgrad, wgrad
  - MHA sublayer (4 projections + attention):  fwd, fwd+bwd
  - boundary ops (post-LN + residual + fill_masked, f32): fwd+bwd vs
    the measured HBM bandwidth SOL (memory-bound, ~0 flops)
  - one full FFTBlock fwd+bwd as the anchor (x6 ~= the 6.38 ms decoder
    row in the train-step profile)

Every consumed scalar is sum((out - tgt)^2) against a fixed random
target: convs are linear, so any homogeneous reduction (sum, vdot,
sum-of-squares) of a multiplicatively perturbed input factorizes into
scalar * loop-invariant and XLA's algebraic simplifier hoists the conv
out of the scan (measured: per-op rows collapse to ~0 ms without the
target).  The constant target breaks homogeneity, and as the loss for
the grad-based rows it also yields a non-constant cotangent (an
all-ones cotangent lets XLA collapse wgrad/dgrad into plain reductions).

Usage: python scripts/profile_decoder_ops.py [--scan 128] [--trials 3]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PEAK_FLOPS = 197e12   # measured bf16 matmul ceiling (docs/tpu_notes.md)
HBM_GBPS = 622        # measured HBM read+write (spec 819)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scan", type=int, default=128)
    p.add_argument("--trials", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    SCAN = args.scan

    # ---- relay floor (same probe as profile_train_step.py) -----------
    @jax.jit
    def floor_op(x):
        return jnp.sum(x)

    def timed(fn, arg_packs, trials=args.trials):
        float(fn(*arg_packs[0]))  # compile + warm
        best = float("inf")
        for i in range(trials):
            a = arg_packs[(i + 1) % len(arg_packs)]
            t0 = time.time()
            float(fn(*a))
            best = min(best, time.time() - t0)
        return best

    floor_s = timed(
        floor_op,
        [(jnp.asarray(np.random.randn(64, 64), jnp.float32) + i,)
         for i in range(4)])
    print(f"relay_floor_ms {floor_s * 1e3:.2f}", flush=True)

    results = {}

    def scan_time(label, jitted, packs, flops=0.0, bytes_=0.0):
        """flops/bytes_ are PER-ITERATION analytic counts (hand-derived:
        XLA cost_analysis reports a scan body once but misattributes
        fusion bytes, and for convs it counts the im2col expansion)."""
        t = max((timed(jitted, packs) - floor_s) / SCAN, 1e-9)
        sol = max(flops / PEAK_FLOPS, bytes_ / (HBM_GBPS * 1e9))
        results[label] = dict(
            ms=t * 1e3, gflops=flops / 1e9, mb=bytes_ / 1e6,
            sol_ms=sol * 1e3,
            sol_pct=100 * sol / t if t else 0.0,
            tfps=flops / t / 1e12)
        r = results[label]
        print(f"{label:22s} {r['ms']:7.3f} ms | {r['gflops']:7.1f} GF "
              f"{r['mb']:8.1f} MB | SOL {r['sol_ms']:6.3f} ms "
              f"({r['sol_pct']:5.1f}% of SOL, {r['tfps']:5.1f} TF/s)",
              flush=True)

    # ---- shapes (bench train section) ---------------------------------
    B, L, D, DI, H = 16, 512, 256, 1024, 2
    K1, K2 = 9, 1
    DT = jnp.bfloat16
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(B, L, D), DT)
    h = jnp.asarray(r.randn(B, L, DI), DT)
    w1 = jnp.asarray(r.randn(K1, D, DI) * 0.02, DT)
    w2 = jnp.asarray(r.randn(K2, DI, D) * 0.02, DT)

    def conv(xx, ww):
        return jax.lax.conv_general_dilated(
            xx, ww, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"))

    # per-iteration analytic flops (MACs x2); all three conv passes move
    # the same flops (dgrad = conv with flipped kernel, wgrad = batched
    # correlation over B*L)
    f_c1 = 2.0 * B * L * K1 * D * DI
    f_c2 = 2.0 * B * L * K2 * DI * D

    def mk_scan(body_of_i):
        @jax.jit
        def run(seed):
            def body(c, i):
                return c + 1, body_of_i(i + seed)
            _, outs = jax.lax.scan(body, jnp.uint32(0), jnp.arange(SCAN,
                                   dtype=jnp.uint32))
            return jnp.sum(outs)
        return run

    def pert(t, i):
        # loop-dependent multiplicative perturbation XLA cannot hoist
        return t * (1.0 + 1e-6 * i.astype(t.dtype))

    def consume(out):
        # sum((out - 1)^2): the constant target breaks homogeneity so
        # the conv cannot be hoisted out of the scan (see module doc);
        # scalar broadcast costs no HBM and the epilogue fuses.
        o = out.astype(jnp.float32)
        return jnp.sum(jnp.square(o - 1.0))

    # ---- conv1 k=9 -----------------------------------------------------
    scan_time("conv1_k9_fwd", mk_scan(
        lambda i: consume(conv(pert(x, i), w1))),
        [(jnp.uint32(0),), (jnp.uint32(7),)], flops=f_c1)

    _, vjp_c1_x = jax.vjp(lambda xx: conv(xx, w1), x)
    scan_time("conv1_k9_dgrad", mk_scan(
        lambda i: consume(vjp_c1_x(pert(h, i))[0])),
        [(jnp.uint32(0),), (jnp.uint32(7),)], flops=f_c1)

    _, vjp_c1_w = jax.vjp(lambda ww: conv(x, ww), w1)
    scan_time("conv1_k9_wgrad", mk_scan(
        lambda i: consume(vjp_c1_w(pert(h, i))[0])),
        [(jnp.uint32(0),), (jnp.uint32(7),)], flops=f_c1)

    # ---- conv2 k=1 (pure matmul) ----------------------------------------
    scan_time("conv2_k1_fwd", mk_scan(
        lambda i: consume(conv(pert(h, i), w2))),
        [(jnp.uint32(0),), (jnp.uint32(7),)], flops=f_c2)

    _, vjp_c2_x = jax.vjp(lambda hh: conv(hh, w2), h)
    scan_time("conv2_k1_dgrad", mk_scan(
        lambda i: consume(vjp_c2_x(pert(x, i))[0])),
        [(jnp.uint32(0),), (jnp.uint32(7),)], flops=f_c2)

    _, vjp_c2_w = jax.vjp(lambda ww: conv(h, ww), w2)
    scan_time("conv2_k1_wgrad", mk_scan(
        lambda i: consume(vjp_c2_w(pert(x, i))[0])),
        [(jnp.uint32(0),), (jnp.uint32(7),)], flops=f_c2)

    # ---- whole FFN fwd+bwd (XLA training path, incl. LN/residual) -------
    from flax import linen as nn

    from fastspeech2_tpu.models.transformer import (
        ConvFeedForward,
        FFTBlock,
        MultiHeadSelfAttention,
    )

    rng = jax.random.PRNGKey(0)
    pad_mask = jnp.zeros((B, L), bool)

    ffn = ConvFeedForward(D, DI, (K1, K2), dropout=0.0, dtype=DT,
                          ffn_backend="xla")
    ffn_vars = ffn.init(rng, x, deterministic=False)

    def ffn_loss(params, xx):
        out = ffn.apply({"params": params}, xx, deterministic=False,
                        rngs={"dropout": rng})
        return consume(out)

    ffn_grad = jax.grad(ffn_loss, argnums=(0, 1))

    def ffn_bwd_body(i):
        g, gx = ffn_grad(ffn_vars["params"], pert(x, i))
        return (jax.tree_util.tree_reduce(
            lambda a, t: a + jnp.sum(t.astype(jnp.float32)), g, 0.0)
            + jnp.sum(gx.astype(jnp.float32)))

    # fwd 2 convs + bwd 4 conv passes (dgrad+wgrad each) = 3x fwd flops
    f_ffn = 3.0 * (f_c1 + f_c2)
    scan_time("ffn_fwd_bwd", mk_scan(ffn_bwd_body),
              [(jnp.uint32(0),), (jnp.uint32(7),)], flops=f_ffn)

    # ---- MHA sublayer ----------------------------------------------------
    mha = MultiHeadSelfAttention(H, D, dropout=0.0, dtype=DT,
                                 attention_backend="auto")
    mha_vars = mha.init(rng, x, pad_mask, deterministic=False)

    f_proj = 2.0 * B * L * D * D * 4          # q,k,v,out projections
    f_attn = 2.0 * 2 * B * H * L * L * (D // H)  # scores + AV
    f_mha = f_proj + f_attn

    def mha_fwd_body(i):
        out = mha.apply(mha_vars, pert(x, i), pad_mask,
                        deterministic=False, rngs={"dropout": rng})
        return consume(out)

    scan_time("mha_fwd", mk_scan(mha_fwd_body),
              [(jnp.uint32(0),), (jnp.uint32(7),)], flops=f_mha)

    def mha_loss(params, xx):
        out = mha.apply({"params": params}, xx, pad_mask,
                        deterministic=False, rngs={"dropout": rng})
        return consume(out)

    mha_grad = jax.grad(mha_loss, argnums=(0, 1))

    def mha_bwd_body(i):
        g, gx = mha_grad(mha_vars["params"], pert(x, i))
        return (jax.tree_util.tree_reduce(
            lambda a, t: a + jnp.sum(t.astype(jnp.float32)), g, 0.0)
            + jnp.sum(gx.astype(jnp.float32)))

    scan_time("mha_fwd_bwd", mk_scan(mha_bwd_body),
              [(jnp.uint32(0),), (jnp.uint32(7),)], flops=3.0 * f_mha)

    # ---- boundary ops: post-LN + residual + fill_masked (f32) -----------
    from fastspeech2_tpu.ops.masking import fill_masked

    ln_scale = jnp.ones((D,), jnp.float32)
    ln_bias = jnp.zeros((D,), jnp.float32)

    def boundary(xx, res):
        y = xx.astype(jnp.float32) + res.astype(jnp.float32)
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - jnp.square(mu)
        out = (y - mu) * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias
        return fill_masked(out.astype(DT), pad_mask)

    def boundary_loss(xx):
        return consume(boundary(xx, x))

    b_grad = jax.grad(boundary_loss)

    def boundary_body(i):
        return jnp.sum(b_grad(pert(x, i)).astype(jnp.float32))

    # bytes: fwd reads 2 bf16 tensors writes 1; bwd reads ct + saved
    # activations, writes dx — ~6 tensor passes of B*L*D bf16 plus the
    # f32 intermediates XLA materializes between fusions (~2 passes f32)
    bl_bytes = (6 * 2 + 2 * 4) * B * L * D
    scan_time("lnresmask_fwd_bwd", mk_scan(boundary_body),
              [(jnp.uint32(0),), (jnp.uint32(7),)], bytes_=bl_bytes)

    # ---- full FFT block anchor ------------------------------------------
    blk = FFTBlock(D, H, DI, (K1, K2), dropout=0.1, dtype=DT,
                   attention_backend="auto", ffn_backend="xla")
    blk_vars = blk.init({"params": rng, "dropout": rng}, x, pad_mask,
                        deterministic=False)

    def blk_loss(params, xx):
        out = blk.apply({"params": params}, xx, pad_mask,
                        deterministic=False, rngs={"dropout": rng})
        return consume(out)

    blk_grad = jax.grad(blk_loss, argnums=(0, 1))

    def blk_body(i):
        g, gx = blk_grad(blk_vars["params"], pert(x, i))
        return (jax.tree_util.tree_reduce(
            lambda a, t: a + jnp.sum(t.astype(jnp.float32)), g, 0.0)
            + jnp.sum(gx.astype(jnp.float32)))

    scan_time("fftblock_fwd_bwd", mk_scan(blk_body),
              [(jnp.uint32(0),), (jnp.uint32(7),)],
              flops=f_ffn + 3.0 * f_mha)

    # ---- ledger ----------------------------------------------------------
    convs = ["conv1_k9_fwd", "conv1_k9_dgrad", "conv1_k9_wgrad",
             "conv2_k1_fwd", "conv2_k1_dgrad", "conv2_k1_wgrad"]
    conv_ms = sum(results[k]["ms"] for k in convs)
    conv_sol = sum(results[k]["sol_ms"] for k in convs)
    parts = conv_ms + results["mha_fwd_bwd"]["ms"] \
        + results["lnresmask_fwd_bwd"]["ms"]
    blk_ms = results["fftblock_fwd_bwd"]["ms"]
    print(f"\nconv passes sum        {conv_ms:7.3f} ms "
          f"(SOL {conv_sol:.3f} ms, {100*conv_sol/conv_ms:.1f}%)")
    print(f"parts sum (conv+mha+boundary) {parts:7.3f} ms vs "
          f"measured FFTBlock {blk_ms:7.3f} ms "
          f"(fusion gain {parts - blk_ms:+.3f} ms)")
    print(f"x6 decoder estimate    {6*blk_ms:7.2f} ms "
          f"(train-step profile row: 6.38 ms)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
