"""Prosody-control sweep: verify p/e/d controls objectively and produce
demo artifacts.

The reference advertises pitch/energy/duration control ratios
(reference synthesize.py:91-96, model/modules.py:124,146 — where the
energy control is half-broken upstream; fixed here, models/variance.py).
This tool PROVES the three controls work on trained weights, in both
control modes (synthesis/pipeline.py Synthesizer(control_mode=...)):

- duration_control d: synthesized wav length scales ~d (both modes);
- pitch_control p: "reference" mode scales the z-scored prediction
  (direction check only — the reference's semantics); "absolute" mode
  scales denormalized F0, so mean predicted Hz must scale ~p and the
  DIO-measured F0 of the vocoded wav should follow;
- energy_control e: ditto for the frame energy (mel-frame L2 norm);
  the wav RMS must rise monotonically with e.

    python -m fastspeech2_tpu.evaluation.prosody_sweep \
        -p config/LJSpeech10/preprocess.yaml -m config/LJSpeech10/model.yaml \
        -t config/LJSpeech10/train.yaml --restore_step 30000 \
        --vocoder_ckpt output/vocoder_run/100000 \
        --text "..." --save_dir demo/prosody

Writes <save_dir>/<mode>/{pitch,energy,duration}_<ratio>.wav plus
sweep.json with the measured ratios and pass/fail checks.
"""

import argparse
import json
import os

import numpy as np

RATIOS = (0.8, 1.0, 1.2)


def measure_f0_mean(wav, sr, hop_length):
    from fastspeech2_tpu.audio.dio import dio_f0

    f0 = np.asarray(dio_f0(np.asarray(wav, np.float32), sr, hop_length))
    voiced = f0[f0 > 0]
    return float(voiced.mean()) if voiced.size else 0.0


def _pred_means(pred, n_valid, mean, std):
    """(z-space masked mean, denormalized masked mean) of prediction
    row 0."""
    v = np.asarray(pred, np.float32)[0, :n_valid]
    return float(v.mean()), float((v * std + mean).mean())


def sweep(synthesizer, vocoder, preprocess_config, text, save_dir=None,
          speaker=0, ratios=RATIOS):
    """-> {control: {ratio: {...measurements}}} (+ wavs in save_dir).

    Measurements per point: mel frame count, mean predicted F0/energy
    (denormalized via stats.json), DIO F0 mean and RMS of the vocoded
    wav.
    """
    from fastspeech2_tpu.synthesis.vocoder import vocoder_infer

    pp = preprocess_config["preprocessing"]
    sr = pp["audio"]["sampling_rate"]
    hop = pp["stft"]["hop_length"]
    max_wav = pp["audio"]["max_wav_value"]
    stats_path = os.path.join(
        preprocess_config["path"]["preprocessed_path"], "stats.json")
    with open(stats_path) as f:
        stats = json.load(f)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)

    ids, _phones = synthesizer.text_to_ids(text)
    results = {}
    for control in ("pitch", "energy", "duration"):
        results[control] = {}
        for r in ratios:
            kw = {f"{control[0]}_control": r}
            out = synthesizer.infer_ids([np.asarray(ids, np.int32)],
                                        np.asarray([speaker], np.int32),
                                        **kw)
            n = int(out.mel_len[0])
            n_src = int(out.src_len[0])
            wav = vocoder_infer(
                np.asarray(out.postnet_mel[:1], np.float32), vocoder,
                preprocess_config, lengths=[n])[0]
            wav = wav.astype(np.float32) / max_wav
            p_z, p_hz = _pred_means(out.pitch_prediction, n_src,
                                    *stats["pitch"][2:4])
            e_z, e_abs = _pred_means(out.energy_prediction, n_src,
                                     *stats["energy"][2:4])
            row = {
                "mel_frames": n,
                "pred_f0_z": round(p_z, 4),
                "pred_f0_hz": round(p_hz, 2),
                "pred_energy_z": round(e_z, 4),
                "pred_energy": round(e_abs, 3),
                "f0_mean_hz": round(measure_f0_mean(wav, sr, hop), 2),
                "rms": round(float(np.sqrt(np.mean(wav ** 2))), 5),
            }
            if save_dir:
                from fastspeech2_tpu.audio.wav import save_wav

                path = os.path.join(save_dir, f"{control}_{r:.1f}.wav")
                save_wav(path, wav, sr)
                row["wav"] = os.path.basename(path)
            results[control][f"{r:.1f}"] = row
    return results


def verify(results, ratios=RATIOS, mode="reference"):
    """-> (ok, checks), gating what each mode actually promises.

    Both modes: duration frames scale ~d.  "reference" mode promises
    the z-scored PREDICTION scales by r (model/modules.py:124,146) —
    gated via z-space means (Hz direction is NOT guaranteed: v' - v =
    (r-1)*z*std flips sign with z).  "absolute" mode promises the
    DENORMALIZED value scales by r — gated to 5% on predicted Hz /
    energy, plus wav-level direction (DIO F0, RMS) as independent
    evidence.
    """
    lo, mid, hi = (f"{r:.1f}" for r in ratios)
    checks = {}
    d = results["duration"]
    ratio_lo = d[lo]["mel_frames"] / d[mid]["mel_frames"]
    ratio_hi = d[hi]["mel_frames"] / d[mid]["mel_frames"]
    checks["duration"] = {
        "frames_ratio_low": round(ratio_lo, 3),
        "frames_ratio_high": round(ratio_hi, 3),
        "ok": abs(ratio_lo - ratios[0]) < 0.1 and abs(
            ratio_hi - ratios[2]) < 0.1,
    }
    p = results["pitch"]
    f_lo = p[lo]["f0_mean_hz"] / p[mid]["f0_mean_hz"]
    f_hi = p[hi]["f0_mean_hz"] / p[mid]["f0_mean_hz"]
    pred_lo = p[lo]["pred_f0_hz"] / p[mid]["pred_f0_hz"]
    pred_hi = p[hi]["pred_f0_hz"] / p[mid]["pred_f0_hz"]
    pitch = {
        "pred_f0_ratio_low": round(pred_lo, 3),
        "pred_f0_ratio_high": round(pred_hi, 3),
        "wav_f0_ratio_low": round(f_lo, 3),
        "wav_f0_ratio_high": round(f_hi, 3),
    }
    if mode == "absolute":
        pitch["ok"] = (abs(pred_lo - ratios[0]) < 0.05
                       and abs(pred_hi - ratios[2]) < 0.05
                       and f_lo < 0.95 and f_hi > 1.05)
    else:
        pitch["ok"] = (
            abs(p[lo]["pred_f0_z"] - ratios[0] * p[mid]["pred_f0_z"])
            < 2e-3
            and abs(p[hi]["pred_f0_z"] - ratios[2] * p[mid]["pred_f0_z"])
            < 2e-3)
    checks["pitch"] = pitch
    e = results["energy"]
    en_lo = e[lo]["pred_energy"] / e[mid]["pred_energy"]
    en_hi = e[hi]["pred_energy"] / e[mid]["pred_energy"]
    energy = {
        "pred_energy_ratio_low": round(en_lo, 3),
        "pred_energy_ratio_high": round(en_hi, 3),
        "rms": [e[lo]["rms"], e[mid]["rms"], e[hi]["rms"]],
    }
    monotone = e[lo]["rms"] < e[mid]["rms"] < e[hi]["rms"]
    if mode == "absolute":
        energy["ok"] = (abs(en_lo - ratios[0]) < 0.05
                        and abs(en_hi - ratios[2]) < 0.05 and monotone)
    else:
        energy["ok"] = (
            abs(e[lo]["pred_energy_z"]
                - ratios[0] * e[mid]["pred_energy_z"]) < 2e-3
            and abs(e[hi]["pred_energy_z"]
                    - ratios[2] * e[mid]["pred_energy_z"]) < 2e-3)
    checks["energy"] = energy
    return all(c["ok"] for c in checks.values()), checks


def main(argv=None):
    from fastspeech2_tpu.cli.common import (
        add_config_args,
        load_model_for_inference,
        read_configs,
    )
    from fastspeech2_tpu.synthesis import Synthesizer, get_vocoder

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    add_config_args(ap)
    ap.add_argument("--restore_step", type=int, required=True)
    ap.add_argument("--vocoder_ckpt", default=None)
    ap.add_argument("--text", default="The quick brown fox jumps over "
                                      "the lazy dog.")
    ap.add_argument("--speaker", type=int, default=0)
    ap.add_argument("--save_dir", default=None)
    ap.add_argument("--control_mode", default="both",
                    choices=("reference", "absolute", "both"))
    args = ap.parse_args(argv)

    configs = read_configs(args)
    preprocess_config, model_config, train_config = configs
    model, variables, cfg = load_model_for_inference(
        configs, args.restore_step)
    vocoder = get_vocoder(model_config, preprocess_config,
                          args.vocoder_ckpt)
    modes = (("reference", "absolute") if args.control_mode == "both"
             else (args.control_mode,))
    out = {"text": args.text, "modes": {}}
    all_ok = True
    for mode in modes:
        synthesizer = Synthesizer(model, variables, cfg, preprocess_config,
                                  vocoder=vocoder, control_mode=mode)
        save_dir = (os.path.join(args.save_dir, mode)
                    if args.save_dir else None)
        results = sweep(synthesizer, vocoder, preprocess_config, args.text,
                        save_dir=save_dir, speaker=args.speaker)
        ok, checks = verify(results, mode=mode)
        all_ok = all_ok and ok
        out["modes"][mode] = {"results": results, "checks": checks,
                              "ok": ok}
    out["all_ok"] = all_ok
    print(json.dumps(out, indent=1))
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
        with open(os.path.join(args.save_dir, "sweep.json"), "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
