#!/usr/bin/env python
"""Benchmark harness: end-to-end text->wav RTF and mel throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extras": {...}}

Primary metric: end-to-end real-time factor (text -> mel -> wav) for a
batch of 32 LJSpeech-config utterances at the static generation length on
one chip, through the TPU fast vocoder (HiFi-GAN-iSTFT,
models/hifigan_istft.py).  The parity HiFi-GAN e2e is reported in extras
(e2e_ms_parity_vocoder).  BASELINE.md target: RTF < 0.01 on one v5e chip;
vs_baseline = target_rtf / measured_rtf (>1 = beats the target).
--torch_ckpt benches on converted reference weights (extras.weights).

Timing methodology (this environment tunnels the TPU through a relay):
async dispatch acknowledgements are unreliable, so each timed call returns
a data-dependent scalar that is fetched to host (forces real execution),
and the relay's fixed round-trip latency — measured with a trivial op — is
subtracted to isolate device compute time.  Both raw and corrected numbers
are reported.
"""

import argparse
import json
import os
import time

import numpy as np


def _realistic_texts(batch, max_phones):
    """Phone-ID sequences from the reference val metadata when available,
    else synthetic ARPAbet."""
    path = "/root/reference/preprocessed_data/LJSpeech/val.txt"
    seqs = []
    if os.path.exists(path):
        from fastspeech2_tpu.text import text_to_sequence

        with open(path) as f:
            for line in f:
                phones = line.rstrip("\n").split("|")[2]
                seqs.append(np.asarray(
                    text_to_sequence(phones, ["english_cleaners"]),
                    np.int32))
                if len(seqs) >= batch * 4:
                    break
    if not seqs:
        rng = np.random.RandomState(0)
        seqs = [rng.randint(64, 148, size=rng.randint(60, max_phones))
                .astype(np.int32) for _ in range(batch * 4)]
    return seqs


def _pack(seqs, batch, max_phones, offset=0):
    texts = np.zeros((batch, max_phones), np.int32)
    lens = np.zeros(batch, np.int32)
    for b in range(batch):
        s = seqs[(offset + b) % len(seqs)][:max_phones]
        texts[b, : len(s)] = s
        lens[b] = len(s)
    return texts, lens


def main():
    try:
        _main()
    except Exception as e:  # always emit a result line for the driver
        import traceback

        traceback.print_exc()
        print(json.dumps({
            "metric": "rtf_text_to_wav_b32_1chip",
            "value": None,
            "unit": "rtf",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}",
        }))


def _main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--frames", type=int, default=896,
                        help="static mel frames per utterance")
    parser.add_argument("--phones", type=int, default=160)
    parser.add_argument("--trials", type=int, default=3)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_parity_vocoder", action="store_true",
                        help="skip the second (parity HiFi-GAN) e2e compile")
    parser.add_argument("--skip_fastest_vocoder", action="store_true",
                        help="skip the C8C2I (fastest variant) e2e compile")
    parser.add_argument("--torch_ckpt", default=None,
                        help="reference FastSpeech2 .pth.tar: bench on "
                             "converted quality-bearing weights")
    parser.add_argument("--native_ckpt", default=None,
                        help="orbax checkpoint dir from train.py: bench on "
                             "natively trained weights")
    parser.add_argument("--weights_npz", default=None,
                        help="fp16 npz snapshot (scripts/save_weights_npz"
                             ".py): bench on tracked trained weights")
    parser.add_argument("--native_step", type=int, default=-1,
                        help="step to restore from --native_ckpt "
                             "(-1 = latest)")
    args = parser.parse_args()

    if not (args.torch_ckpt or args.weights_npz or args.native_ckpt):
        # default to the tracked fp16 snapshot of the natively trained
        # acoustic model, so the driver's argless run benches on the same
        # weights the quality numbers come from (random init otherwise)
        default_npz = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "weights", "acoustic_LJSpeech10_100k.npz")
        if os.path.exists(default_npz):
            args.weights_npz = default_npz

    import jax
    import jax.numpy as jnp

    from fastspeech2_tpu.configs.config import FastSpeech2Config, OptimConfig
    from fastspeech2_tpu.models import FastSpeech2
    from fastspeech2_tpu.models.hifigan import HiFiGANGenerator
    from fastspeech2_tpu.models.hifigan_istft import HiFiGANiSTFTGenerator

    B, T, P = args.batch, args.frames, args.phones
    hop, sr = 256, 22050

    cfg = FastSpeech2Config(
        pitch_min=-2.917, pitch_max=11.391,
        energy_min=-1.431, energy_max=8.184,
    )
    acoustic = FastSpeech2(cfg, dtype=jnp.bfloat16)
    vocoder = HiFiGANGenerator(dtype=jnp.bfloat16)
    istft_vocoder = HiFiGANiSTFTGenerator(dtype=jnp.bfloat16)
    # fastest operating point (configs/hifigan/config_istft_c8c2i.json)
    c8c2i_vocoder = HiFiGANiSTFTGenerator(
        upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
        gen_istft_n_fft=64, gen_istft_hop_size=16, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    seqs = _realistic_texts(B, P)
    packs = [_pack(seqs, B, P, offset=i * B) for i in range(4)]
    speakers = jnp.zeros((B,), jnp.int32)

    weights = "random"
    if args.torch_ckpt and os.path.exists(args.torch_ckpt):
        import torch

        from fastspeech2_tpu.convert.from_torch import (
            fastspeech2_variables_from_torch,
        )

        sd = torch.load(args.torch_ckpt, map_location="cpu",
                        weights_only=True)["model"]
        variables = jax.tree_util.tree_map(
            jnp.asarray, fastspeech2_variables_from_torch(sd, cfg))
        weights = "converted"
    elif args.weights_npz and os.path.exists(args.weights_npz):
        from fastspeech2_tpu.utils.params_io import load_variables_npz

        variables = jax.tree_util.tree_map(
            jnp.asarray, load_variables_npz(args.weights_npz))
        weights = f"npz:{os.path.basename(args.weights_npz)}"
    elif args.native_ckpt and os.path.exists(args.native_ckpt):
        from fastspeech2_tpu.configs.config import OptimConfig
        from fastspeech2_tpu.training import TrainState, make_optimizer
        from fastspeech2_tpu.training.checkpoint import (
            latest_step,
            restore_checkpoint,
        )

        step = (args.native_step if args.native_step >= 0
                else latest_step(args.native_ckpt))
        init_vars = jax.jit(
            acoustic.init, static_argnames=("max_mel_len", "train"))(
            {"params": rng, "dropout": rng},
            speakers, jnp.asarray(packs[0][0]), jnp.asarray(packs[0][1]),
            max_mel_len=T, train=False)
        opt, _ = make_optimizer(OptimConfig(), cfg.encoder_hidden)
        state = restore_checkpoint(
            args.native_ckpt, TrainState.create(init_vars, opt), step)
        variables = state.variables()
        weights = f"native@{step}"
    else:
        variables = jax.jit(
            acoustic.init, static_argnames=("max_mel_len", "train"))(
            {"params": rng, "dropout": rng},
            speakers, jnp.asarray(packs[0][0]), jnp.asarray(packs[0][1]),
            max_mel_len=T, train=False)
    voc_params = jax.jit(vocoder.init)(rng, jnp.zeros((1, 8, 80), jnp.bfloat16))
    ivoc_params = jax.jit(istft_vocoder.init)(
        rng, jnp.zeros((1, 8, 80), jnp.bfloat16))
    c8c2i_params = jax.jit(c8c2i_vocoder.init)(
        rng, jnp.zeros((1, 8, 80), jnp.bfloat16))
    from fastspeech2_tpu.models.hifigan_folded import FoldedHiFiGAN

    folded_vocoder = FoldedHiFiGAN(voc_params, dtype=jnp.bfloat16)

    @jax.jit
    def floor_op(x):
        return jnp.sum(x)

    @jax.jit
    def e2e_sum(variables, voc_params, speakers, texts, src_lens):
        # primary path: the documented TPU fast vocoder (iSTFT head)
        out = acoustic.apply(variables, speakers, texts, src_lens,
                             max_mel_len=T, train=False)
        wav = istft_vocoder.apply(voc_params, out.postnet_mel)
        return (jnp.sum(wav.astype(jnp.float32))
                + jnp.sum(out.mel_len).astype(jnp.float32))

    @jax.jit
    def e2e_parity_sum(variables, voc_params, speakers, texts, src_lens):
        out = acoustic.apply(variables, speakers, texts, src_lens,
                             max_mel_len=T, train=False)
        wav = folded_vocoder(out.postnet_mel)
        return (jnp.sum(wav.astype(jnp.float32))
                + jnp.sum(out.mel_len).astype(jnp.float32))

    @jax.jit
    def e2e_c8c2i_sum(variables, voc_params, speakers, texts, src_lens):
        out = acoustic.apply(variables, speakers, texts, src_lens,
                             max_mel_len=T, train=False)
        wav = c8c2i_vocoder.apply(voc_params, out.postnet_mel)
        return (jnp.sum(wav.astype(jnp.float32))
                + jnp.sum(out.mel_len).astype(jnp.float32))

    @jax.jit
    def mel_sum(variables, speakers, texts, src_lens):
        out = acoustic.apply(variables, speakers, texts, src_lens,
                             max_mel_len=T, train=False)
        return jnp.sum(out.postnet_mel.astype(jnp.float32))

    trial_log = {}
    trial_median = {}

    def timed(fn, arg_packs, trials, tag=None):
        float(fn(*arg_packs[0]))  # compile + warm
        best, times = float("inf"), []
        for i in range(trials):
            a = arg_packs[(i + 1) % len(arg_packs)]
            t0 = time.time()
            float(fn(*a))
            times.append(time.time() - t0)
            best = min(best, times[-1])
        if tag:
            trial_log[tag] = [round(t * 1000, 2) for t in times]
            # median alongside min: a single relay stall cannot move it
            # (BENCH_r02 post-mortem, docs/benchmarks.md)
            trial_median[tag] = float(np.median(times))
        return best

    floor_packs = [(jnp.asarray(np.random.randn(64, 64), jnp.float32) + i,)
                   for i in range(4)]
    floor_s = timed(floor_op, floor_packs, args.trials, tag="floor")

    e2e_packs = [(variables, ivoc_params, speakers, jnp.asarray(t),
                  jnp.asarray(l)) for t, l in packs]
    parity_packs = [(variables, voc_params, speakers, jnp.asarray(t),
                     jnp.asarray(l)) for t, l in packs]
    mel_packs = [(variables, speakers, jnp.asarray(t), jnp.asarray(l))
                 for t, l in packs]

    e2e_raw = timed(e2e_sum, e2e_packs, args.trials, tag="e2e")
    # the acoustic-alone number regressed spuriously in BENCH_r02 (27.2 ms
    # vs the true ~13 ms — a transient relay/contention artifact, see
    # docs/benchmarks.md "r2 regression post-mortem"); guard with extra
    # trials, a floor re-measure, and resolved-backend logging
    mel_raw = timed(mel_sum, mel_packs, max(args.trials, 5), tag="acoustic")
    floor_s = min(floor_s, timed(floor_op, floor_packs, args.trials))

    # report which kernel backends 'auto' actually resolved to at the
    # bench shapes so a silent XLA fallback is visible in the record
    from fastspeech2_tpu.ops.pallas_attention import _fits_vmem
    from fastspeech2_tpu.ops.pallas_ffn import ffn_fits_vmem

    on_tpu = jax.default_backend() == "tpu"
    d_head = cfg.encoder_hidden // cfg.encoder_head
    resolved = {
        "attention": ("pallas" if on_tpu and _fits_vmem(T, d_head, jnp.bfloat16)
                      else "xla"),
        "ffn": ("pallas" if on_tpu and ffn_fits_vmem(
            T, cfg.encoder_hidden, cfg.conv_filter_size,
            cfg.conv_kernel_size[0], cfg.conv_kernel_size[1], jnp.bfloat16)
            else "xla"),
    }

    # checkpoint the primary metric NOW: the extras below compile three
    # more large graphs (parity vocoder, C8C2I, train step), and if an
    # external time budget kills this process mid-extras, the last JSON
    # line printed so far is still a valid primary result.
    def emit(result):
        print(json.dumps(result), flush=True)

    e2e_s = max(e2e_raw - floor_s, 1e-6)
    mel_s = max(mel_raw - floor_s, 1e-6)
    audio_seconds = B * T * hop / sr
    rtf = e2e_s / audio_seconds
    mel_fps = B * T / mel_s
    result = {
        "metric": "rtf_text_to_wav_b32_1chip",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(0.01 / rtf, 2),
        "extras": {
            "e2e_ms_per_batch": round(e2e_s * 1000, 2),
            "e2e_ms_raw_incl_relay_latency": round(e2e_raw * 1000, 2),
            "relay_floor_ms": round(floor_s * 1000, 2),
            "acoustic_ms_per_batch": round(mel_s * 1000, 2),
            "acoustic_mel_frames_per_sec_per_chip": round(mel_fps),
            "audio_seconds_per_batch": round(audio_seconds, 2),
            "batch": B,
            "static_frames": T,
            "device": str(jax.devices()[0]),
            "vocoder": "HiFi-GAN-iSTFT (fast variant)",
            "weights": weights,
            "resolved_backends": resolved,
            "trial_ms": trial_log,
            # median-of-trials (floor-subtracted) alongside the min-based
            # headline: robust to a single relay stall (round-4 verdict)
            "e2e_ms_per_batch_median": round(
                max(trial_median["e2e"] - floor_s, 1e-6) * 1000, 2),
            "acoustic_ms_per_batch_median": round(
                max(trial_median["acoustic"] - floor_s, 1e-6) * 1000, 2),
            "partial": "extras still measuring; final line follows",
        },
    }
    emit(result)
    del result["extras"]["partial"]

    parity_s = None
    if not args.skip_parity_vocoder:
        parity_raw = timed(e2e_parity_sum, parity_packs, args.trials)
        parity_s = max(parity_raw - floor_s, 1e-6)
    c8c2i_s = None
    if not args.skip_fastest_vocoder:
        try:
            c8c2i_packs = [(variables, c8c2i_params, speakers,
                            jnp.asarray(t), jnp.asarray(l))
                           for t, l in packs]
            c8c2i_raw = timed(e2e_c8c2i_sum, c8c2i_packs, args.trials)
            c8c2i_s = max(c8c2i_raw - floor_s, 1e-6)
        except Exception:  # never let the extra sink the primary metric
            c8c2i_s = None
    # batch-1 latency (BASELINE.json: "text->wav, LJSpeech batch 1/32")
    b1_packs = [(variables, ivoc_params, speakers[:1],
                 jnp.asarray(t[:1]), jnp.asarray(l[:1])) for t, l in packs]
    b1_s = max(timed(e2e_sum, b1_packs, args.trials) - floor_s, 1e-6)

    if parity_s is not None:
        result["extras"]["e2e_ms_parity_vocoder"] = round(parity_s * 1000, 2)
        result["extras"]["rtf_parity_vocoder"] = round(
            parity_s / audio_seconds, 6)
    if c8c2i_s is not None:
        result["extras"]["e2e_ms_c8c2i_vocoder"] = round(c8c2i_s * 1000, 2)
        result["extras"]["rtf_c8c2i_vocoder"] = round(
            c8c2i_s / audio_seconds, 6)
        # demoted speed point (round 5): best trained C8C2I checkpoint
        # scores 32.2 dB copy-synthesis at 50k steps vs the C8C8I-class
        # <15 dB bar — quality-limited, not a headline path
        # (docs/vocoder_training.md "Variant stability note")
        result["extras"]["rtf_c8c2i_note"] = "demoted: quality-limited"
    result["extras"]["e2e_ms_b1"] = round(b1_s * 1000, 2)
    result["extras"]["rtf_b1"] = round(b1_s / (T * hop / sr), 6)
    if not args.skip_train:
        emit(result)  # checkpoint before the multi-minute train compile

    if not args.skip_train:
        from fastspeech2_tpu.training import (
            TrainState,
            make_optimizer,
            make_train_step,
        )

        # bf16 first moment: the documented MFU lever (docs/tpu_notes.md
        # "MFU ceiling"; descent-parity pinned in tests/test_optim.py) —
        # round 4 enables it in the bench recipe per the r3 verdict
        optimizer, _ = make_optimizer(OptimConfig(mu_dtype="bfloat16"),
                                      cfg.encoder_hidden)
        # moderate shapes keep the fwd+bwd remote compile under ~2 min;
        # throughput extrapolates linearly in frames (static-shape compute)
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
        tvars = jax.jit(acoustic.init, static_argnames=("max_mel_len", "train"))(
            {"params": rng, "dropout": rng},
            tbatches[0]["speakers"], tbatches[0]["texts"],
            tbatches[0]["src_lens"], mels=tbatches[0]["mels"],
            mel_lens=tbatches[0]["mel_lens"], max_mel_len=tt,
            p_targets=tbatches[0]["pitches"],
            e_targets=tbatches[0]["energies"],
            d_targets=tbatches[0]["durations"], train=True)
        from fastspeech2_tpu.training.step import dropout_key

        state = TrainState.create(tvars, optimizer)
        raw_step = make_train_step(acoustic, cfg, optimizer)
        step_rng = dropout_key(0)

        @jax.jit
        def step_sum(state, batch, rng):
            new_state, losses = raw_step(state, batch, rng)
            # the fetched scalar must depend on the UPDATED params so the
            # readback fences the whole step, not just the forward pass
            probe = jnp.sum(
                new_state.params["mel_linear"]["Dense_0"]["bias"])
            return new_state, losses.total + probe * 1e-9

        state, total = step_sum(state, tbatches[0], step_rng)
        float(total)  # compile + warm
        best = float("inf")
        for i in range(args.trials):
            t0 = time.time()
            state, total = step_sum(state, tbatches[(i + 1) % 4], step_rng)
            float(total)
            best = min(best, time.time() - t0)
        dispatch_s = max(best - floor_s, 1e-6)

        # device-time measurement: scan SCAN_STEPS steps in-graph, cycling
        # the 4 distinct batches.  Per-dispatch relay overhead (~10 ms
        # beyond the subtracted floor, an artifact of this environment's
        # tunnel) amortizes away, leaving true per-step device compute —
        # component-level profiling cross-checks this (grad ~10.6 ms +
        # adam ~0.6 ms at these shapes vs ~22 ms at dispatch level).
        # 32 steps/dispatch bounds the residual per-step share of that
        # overhead at ~0.3 ms (8 steps left ~1.2 ms/step in the number).
        SCAN_STEPS = 32
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *tbatches)

        @jax.jit
        def step_scan_sum(state, batches, rng):
            def body(st, i):
                batch = jax.tree_util.tree_map(
                    lambda a: a[i % 4], batches)
                st, losses = raw_step(st, batch, rng)
                return st, losses.total
            st, totals = jax.lax.scan(
                body, state, jnp.arange(SCAN_STEPS))
            probe = jnp.sum(st.params["mel_linear"]["Dense_0"]["bias"])
            return jnp.sum(totals) + probe * 1e-9

        float(step_scan_sum(state, stacked, step_rng))  # compile + warm
        best = float("inf")
        for i in range(args.trials):
            t0 = time.time()
            float(step_scan_sum(state, stacked,
                                dropout_key(i + 1)))
            best = min(best, time.time() - t0)
        step_s = max((best - floor_s) / SCAN_STEPS, 1e-6)

        result["extras"]["train_step_ms_b16"] = round(step_s * 1000, 2)
        result["extras"]["train_step_dispatch_ms"] = round(
            dispatch_s * 1000, 2)
        result["extras"]["train_mel_frames_per_sec_per_chip"] = round(
            tb * tt / step_s)
        try:
            # MFU vs the chip's measured bf16 speed of light
            # (~197 TF/s on this v5e, docs/tpu_notes.md)
            ca = step_sum.lower(state, tbatches[0], step_rng).compile(
            ).cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            if flops > 0:
                result["extras"]["train_mfu_pct"] = round(
                    100.0 * flops / step_s / 197e12, 2)
        except Exception:
            pass

    print(json.dumps(result))


if __name__ == "__main__":
    main()
