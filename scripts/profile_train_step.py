#!/usr/bin/env python
"""Per-component speed-of-light profile of the acoustic train step.

Measures, on the attached chip, with N-iteration in-graph scans (relay
floor subtracted, inputs cycled per iteration so XLA cannot hoist the
body — see docs/tpu_notes.md "Measurement traps"):

  - HBM read+write bandwidth (the memory speed of light)
  - full train step (grad + adam), grad only, forward only, adam only
  - full step with all dropout rates zeroed (dropout cost by difference)
  - PostNet fwd+bwd in isolation

and prints each variant's time next to its XLA cost_analysis flops /
bytes so the table in docs/tpu_notes.md ("MFU ceiling") can attribute
the gap between measured MFU and 100% to memory-bound components.

Usage: python scripts/profile_train_step.py [--scan 32] [--trials 3]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scan", type=int, default=32)
    p.add_argument("--trials", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fastspeech2_tpu.configs.config import FastSpeech2Config, OptimConfig
    from fastspeech2_tpu.models import FastSpeech2
    from fastspeech2_tpu.models.postnet import PostNet
    from fastspeech2_tpu.training import TrainState, make_optimizer, make_train_step
    from fastspeech2_tpu.training.step import dropout_key

    SCAN = args.scan
    PEAK_FLOPS = 197e12  # measured bf16 ceiling, docs/tpu_notes.md

    # ---- relay floor -------------------------------------------------
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

    # ---- HBM bandwidth (read+write a big buffer, in-graph scan) ------
    # The probe's iteration count is independent of --scan: the scan body
    # must total several times the relay floor or floor jitter dominates
    # (a --scan 4 run once measured 1096 GB/s, above the v5e spec).
    BW_MB = 256
    V5E_SPEC_GBPS = 819  # documented v5e HBM bandwidth ceiling
    BW_SCAN = max(
        64, int(np.ceil(5 * floor_s / (2 * BW_MB / 1024 / V5E_SPEC_GBPS))))
    big = jnp.asarray(
        np.random.randn(BW_MB * 1024 * 1024 // 4).astype(np.float32))

    @jax.jit
    def bw_scan(x):
        def body(c, i):
            return c * 1.0000001 + jnp.float32(1e-12) * i, ()
        c, _ = jax.lax.scan(body, x, jnp.arange(BW_SCAN))
        return jnp.sum(c[:8])

    bw_s = max((timed(bw_scan, [(big,), (big * 1.01,)]) - floor_s) / BW_SCAN,
               1e-9)
    hbm_bw = 2 * BW_MB / 1024 / bw_s  # GB/s, read + write
    if hbm_bw > V5E_SPEC_GBPS:
        print(f"hbm_bw_GBps measured {hbm_bw:.0f} exceeds the v5e spec; "
              f"clamping to {V5E_SPEC_GBPS}", flush=True)
        hbm_bw = V5E_SPEC_GBPS
    print(f"hbm_bw_GBps {hbm_bw:.0f}  ({bw_s*1e3:.3f} ms per {BW_MB} MB "
          f"read+write, {BW_SCAN}-iter scan)", flush=True)

    # ---- model + batches (bench.py train-section shapes) -------------
    tb, tp_, tt = 16, 128, 512

    def train_batch(seed):
        r = np.random.RandomState(seed)
        d = r.randint(3, 9, size=(tb, tp_)).astype(np.int32)
        scale = np.minimum(tt / d.sum(1, keepdims=True), 1.0)
        d = np.maximum((d * scale).astype(np.int32), 1)
        return {
            "speakers": np.zeros(tb, np.int32),
            "texts": r.randint(1, 360, size=(tb, tp_)).astype(np.int32),
            "src_lens": np.full(tb, tp_, np.int32),
            "mels": r.randn(tb, tt, 80).astype(np.float32),
            "mel_lens": d.sum(1).astype(np.int32),
            "pitches": r.randn(tb, tp_).astype(np.float32),
            "energies": r.randn(tb, tp_).astype(np.float32),
            "durations": d,
        }

    tbatches = [
        {k: jnp.asarray(v) for k, v in train_batch(s).items()}
        for s in range(4)
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *tbatches)
    rng = jax.random.PRNGKey(0)
    step_rng = dropout_key(0)

    cfg = FastSpeech2Config(
        pitch_min=-2.917, pitch_max=11.391,
        energy_min=-1.431, energy_max=8.184,
    )
    results = {}

    def scan_time(label, jitted, packs):
        t = max((timed(jitted, packs) - floor_s) / SCAN, 1e-9)
        ca = {}
        try:
            c = jitted.lower(*packs[0]).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            ca = {k: float(c.get(k, 0.0))
                  for k in ("flops", "bytes accessed")}
        except Exception:
            pass
        # MEASUREMENT TRAP (verified): XLA cost_analysis reports a
        # lax.scan body ONCE, independent of trip count — flops/bytes
        # below are already per-iteration; only the TIME divides by SCAN
        flops = ca.get("flops", 0.0)
        bytes_ = ca.get("bytes accessed", 0.0)
        sol_flops = flops / PEAK_FLOPS
        sol_bytes = bytes_ / (hbm_bw * 1e9)
        sol = max(sol_flops, sol_bytes)
        results[label] = dict(
            ms=t * 1e3, gflops=flops / 1e9, mb=bytes_ / 1e6,
            sol_ms=sol * 1e3, mfu_pct=100 * flops / t / PEAK_FLOPS,
            sol_pct=100 * sol / t if t else 0.0)
        r = results[label]
        print(f"{label:18s} {r['ms']:8.2f} ms | {r['gflops']:8.1f} GF "
              f"{r['mb']:9.1f} MB | SOL {r['sol_ms']:6.2f} ms "
              f"({r['sol_pct']:5.1f}% of SOL, MFU {r['mfu_pct']:4.1f}%)",
              flush=True)

    def build_step_variant(cfg_v):
        model = FastSpeech2(cfg_v, dtype=jnp.bfloat16)
        optimizer, _ = make_optimizer(OptimConfig(), cfg_v.encoder_hidden)
        tvars = jax.jit(
            model.init, static_argnames=("max_mel_len", "train"))(
            {"params": rng, "dropout": rng},
            tbatches[0]["speakers"], tbatches[0]["texts"],
            tbatches[0]["src_lens"], mels=tbatches[0]["mels"],
            mel_lens=tbatches[0]["mel_lens"], max_mel_len=tt,
            p_targets=tbatches[0]["pitches"],
            e_targets=tbatches[0]["energies"],
            d_targets=tbatches[0]["durations"], train=True)
        state = TrainState.create(tvars, optimizer)
        raw_step = make_train_step(model, cfg_v, optimizer)
        return model, optimizer, state, raw_step

    model, optimizer, state, raw_step = build_step_variant(cfg)

    def probe(st):
        return jnp.sum(st.params["mel_linear"]["Dense_0"]["bias"])

    # ---- full step ----------------------------------------------------
    @jax.jit
    def full_scan(state, batches, rng):
        def body(st, i):
            batch = jax.tree_util.tree_map(lambda a: a[i % 4], batches)
            st, losses = raw_step(st, batch, rng)
            return st, losses.total
        st, totals = jax.lax.scan(body, state, jnp.arange(SCAN))
        return jnp.sum(totals) + probe(st) * 1e-9

    scan_time("full_step", full_scan,
              [(state, stacked, step_rng), (state, stacked, dropout_key(1))])

    # ---- grad only (no optimizer update) -------------------------------
    from fastspeech2_tpu.training.step import _apply_model

    def grads_of(params, batch_stats, batch, rng):
        def loss_fn(p_):
            losses, new_stats, _ = _apply_model(
                model, cfg, p_, batch_stats, batch, rng, train=True)
            return losses.total, (losses, new_stats)
        g, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(params)
        return g, losses, new_stats

    @jax.jit
    def grad_scan(state, batches, rng):
        def body(carry, i):
            params, stats = carry
            batch = jax.tree_util.tree_map(lambda a: a[i % 4], batches)
            g, losses, stats = grads_of(
                params, stats, batch, jax.random.fold_in(rng, i))
            # thread a gradient-dependent perturbation through params so
            # successive iterations are data-dependent (no hoisting)
            params = jax.tree_util.tree_map(
                lambda p_, g_: p_ + 0.0 * g_, params, g)
            return (params, stats), losses.total
        (params, _), totals = jax.lax.scan(
            body, (state.params, state.batch_stats), jnp.arange(SCAN))
        return jnp.sum(totals) + jnp.sum(
            params["mel_linear"]["Dense_0"]["bias"]) * 1e-9

    scan_time("grad_only", grad_scan,
              [(state, stacked, step_rng), (state, stacked, dropout_key(1))])

    # ---- forward only ---------------------------------------------------
    @jax.jit
    def fwd_scan(state, batches, rng):
        def body(c, i):
            batch = jax.tree_util.tree_map(lambda a: a[i % 4], batches)
            losses, _, _ = _apply_model(
                model, cfg, state.params, state.batch_stats, batch,
                jax.random.fold_in(rng, i + c.astype(jnp.uint32)),
                train=True)
            return c + losses.total.astype(jnp.float32) * 0 + 1, losses.total
        _, totals = jax.lax.scan(body, jnp.float32(0), jnp.arange(SCAN))
        return jnp.sum(totals)

    scan_time("fwd_only", fwd_scan,
              [(state, stacked, step_rng), (state, stacked, dropout_key(1))])

    # ---- adam only -------------------------------------------------------
    grads0 = jax.jit(lambda st, b, r: grads_of(
        st.params, st.batch_stats, b, r)[0])(state, tbatches[0], step_rng)

    @jax.jit
    def adam_scan(state, grads):
        def body(carry, i):
            params, opt_state = carry
            # 1e-6 survives fp32 rounding (1 + 1e-9 rounds to exactly 1.0,
            # which would make the grads loop-invariant); small enough not
            # to perturb the cost profile
            g = jax.tree_util.tree_map(
                lambda x: x * (1.0 + 1e-6 * i), grads)
            updates, opt_state = optimizer.update(g, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda p_, u: p_ + u.astype(p_.dtype), params, updates)
            return (params, opt_state), ()
        (params, _), _ = jax.lax.scan(
            body, (state.params, state.opt_state), jnp.arange(SCAN))
        # consume EVERY leaf: Adam's per-leaf chains are independent, so
        # probing a single bias would let XLA dead-code-eliminate the
        # other 35M params' updates (measured: 0.16 ms/step, an
        # impossible >3 TB/s — vs the honest ~1.2 ms)
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), params, 0.0)

    scan_time("adam_only", adam_scan,
              [(state, grads0),
               (state, jax.tree_util.tree_map(lambda g: g * 1.01, grads0))])

    # ---- no-dropout full step --------------------------------------------
    cfg_nd = FastSpeech2Config(
        pitch_min=-2.917, pitch_max=11.391,
        energy_min=-1.431, energy_max=8.184,
        encoder_dropout=0.0, decoder_dropout=0.0, vp_dropout=0.0,
    )
    _, _, state_nd, raw_step_nd = build_step_variant(cfg_nd)

    @jax.jit
    def full_scan_nd(state, batches, rng):
        def body(st, i):
            batch = jax.tree_util.tree_map(lambda a: a[i % 4], batches)
            st, losses = raw_step_nd(st, batch, rng)
            return st, losses.total
        st, totals = jax.lax.scan(body, state, jnp.arange(SCAN))
        return jnp.sum(totals) + probe(st) * 1e-9

    scan_time("full_no_dropout", full_scan_nd,
              [(state_nd, stacked, step_rng),
               (state_nd, stacked, dropout_key(1))])

    # NOTE: PostNet's dropout(0.5) is hardcoded in the module, so
    # full_no_dropout still pays it; the postnet rows below isolate that.

    # ---- postnet fwd+bwd isolated ------------------------------------------
    postnet = PostNet(dtype=jnp.bfloat16)
    px = tbatches[0]["mels"]
    pvars = jax.jit(postnet.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng}, px, train=True)

    # the real train step always passes a frame_mask (fastspeech2.py:
    # beyond_batch_max), which adds per-conv re-zeroing and masked-BN stat
    # reductions; profile with a representative one so the isolated row
    # matches the in-step configuration
    pmask = jnp.stack([
        jnp.broadcast_to(
            jnp.arange(tt)[None, :] >= jnp.max(b["mel_lens"]), (tb, tt))
        for b in tbatches])

    @jax.jit
    def postnet_scan(params, batch_stats, xs, masks, rng):
        def loss_fn(p_, x, m):
            out, mut = postnet.apply(
                {"params": p_, "batch_stats": batch_stats}, x, train=True,
                frame_mask=m, rngs={"dropout": rng},
                mutable=["batch_stats"])
            return jnp.sum(jnp.square(out.astype(jnp.float32)))

        def body(p_, i):
            x = xs[i % 4]
            val, g = jax.value_and_grad(loss_fn)(p_, x, masks[i % 4])
            p_ = jax.tree_util.tree_map(lambda a, b: a + 0.0 * b, p_, g)
            return p_, val
        p_, vals = jax.lax.scan(
            body, params["params"], jnp.arange(SCAN))
        return jnp.sum(vals) + jnp.sum(
            p_["conv_0"]["bias"]) * 1e-9

    pxs = jnp.stack([b["mels"] for b in tbatches])
    scan_time("postnet_fwd_bwd", postnet_scan,
              [(pvars, pvars["batch_stats"], pxs, pmask, step_rng),
               (pvars, pvars["batch_stats"], pxs * 1.01, pmask,
                dropout_key(1))])

    # ---- summary ---------------------------------------------------------
    full = results.get("full_step", {})
    nd = results.get("full_no_dropout", {})
    grad = results.get("grad_only", {})
    if full and nd:
        print(f"\ndropout cost (enc/dec/vp): "
              f"{full['ms'] - nd['ms']:.2f} ms")
    if full and grad:
        print(f"optimizer-in-step cost:    "
              f"{full['ms'] - grad['ms']:.2f} ms")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
