#!/usr/bin/env python
"""Diagnose the r2 acoustic-forward bench regression (VERDICT r2 item 1).

Times the acoustic forward (the bench.py mel_sum graph) at the exact bench
shape [32, 160 phones -> 896 frames] bf16, for each backend combination,
and prints the resolved backend decisions so a silent fallback is visible.

Usage: PYTHONPATH=. python scripts/diag_acoustic_bench.py [--trials N]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=5)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--frames", type=int, default=896)
    p.add_argument("--phones", type=int, default=160)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fastspeech2_tpu.configs.config import FastSpeech2Config
    from fastspeech2_tpu.models import FastSpeech2

    B, T, P = args.batch, args.frames, args.phones
    print(f"device={jax.devices()[0]} backend={jax.default_backend()}")

    # Replicate the guard arithmetic at the two FFN shapes (enc L=160,
    # dec L=896) so a margin problem is visible without running anything.
    for L in (P, T):
        D, H, k1, k2 = 256, 1024, 9, 1
        isz = 2
        est = (isz * (4 * L * D + k1 * D * H + k2 * H * D
                      + (L + k1 - 1) * D + (L + k2 - 1) * H)
               + 4 * (L * H + L * D))
        print(f"ffn guard: L={L} est={est} bytes ({est/2**20:.2f} MiB) "
              f"cutoff={14*2**20} -> "
              f"{'pallas' if est <= 14*1024*1024 else 'XLA FALLBACK'}")
    for L in (P, T):
        Dh = 128
        attn = 4 * L * Dh * 2 + 2 * L * L * 4
        print(f"attn guard: L={L} est={attn} ({attn/2**20:.2f} MiB) "
              f"cutoff={12*2**20} -> "
              f"{'pallas' if attn <= 12*1024*1024 else 'XLA FALLBACK'}")

    rng = jax.random.PRNGKey(0)
    r = np.random.RandomState(0)
    texts = r.randint(64, 148, size=(B, P)).astype(np.int32)
    lens = np.full(B, P, np.int32)
    speakers = jnp.zeros((B,), jnp.int32)

    def timed(fn, packs, trials):
        float(fn(*packs[0]))
        best, times = float("inf"), []
        for i in range(trials):
            a = packs[(i + 1) % len(packs)]
            t0 = time.time()
            float(fn(*a))
            dt = time.time() - t0
            times.append(dt)
            best = min(best, dt)
        return best, times

    @jax.jit
    def floor_op(x):
        return jnp.sum(x)

    floor_packs = [(jnp.asarray(np.random.randn(64, 64), jnp.float32) + i,)
                   for i in range(4)]
    floor_s, floor_times = timed(floor_op, floor_packs, args.trials)
    print(f"relay floor: best={floor_s*1e3:.2f} ms "
          f"all={[round(t*1e3,2) for t in floor_times]}")

    results = {}
    for name, attn_b, ffn_b in [
        ("auto/auto (bench default)", "auto", "auto"),
        ("pallas/pallas (explicit)", "pallas", "pallas"),
        ("xla/xla", "xla", "xla"),
        ("pallas-attn/xla-ffn", "pallas", "xla"),
        ("xla-attn/pallas-ffn", "xla", "pallas"),
    ]:
        cfg = FastSpeech2Config(
            pitch_min=-2.917, pitch_max=11.391,
            energy_min=-1.431, energy_max=8.184,
            attention_backend=attn_b, ffn_backend=ffn_b)
        acoustic = FastSpeech2(cfg, dtype=jnp.bfloat16)
        variables = jax.jit(
            acoustic.init, static_argnames=("max_mel_len", "train"))(
            {"params": rng, "dropout": rng},
            speakers, jnp.asarray(texts), jnp.asarray(lens),
            max_mel_len=T, train=False)

        @jax.jit
        def mel_sum(variables, speakers, texts, src_lens):
            out = acoustic.apply(variables, speakers, texts, src_lens,
                                 max_mel_len=T, train=False)
            return jnp.sum(out.postnet_mel.astype(jnp.float32))

        packs = [(variables, speakers,
                  jnp.asarray((texts + i) % 360 + 1), jnp.asarray(lens))
                 for i in range(4)]
        raw, times = timed(mel_sum, packs, args.trials)
        net = max(raw - floor_s, 1e-6)
        results[name] = net
        print(f"{name:28s} raw={raw*1e3:7.2f} ms  net={net*1e3:7.2f} ms  "
              f"all={[round(t*1e3,2) for t in times]}")

    print("\nsummary (net ms):",
          {k: round(v * 1e3, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
