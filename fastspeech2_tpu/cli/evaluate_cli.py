"""`python evaluate.py` — validation-set evaluation CLI
(reference evaluate.py:89-120)."""

import argparse

import jax

from fastspeech2_tpu.cli.common import (
    add_config_args,
    dtype_from_flag,
    load_model_for_inference,
    read_configs,
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--restore_step", type=int, default=0)
    add_config_args(parser)
    parser.add_argument("--torch_ckpt", type=str, default=None)
    parser.add_argument("--weights_npz", type=str, default=None,
                        help="tracked fp16 npz snapshot "
                             "(scripts/save_weights_npz.py)")
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="float32")
    parser.add_argument("--synth", action="store_true",
                        help="also write a synth-sample figure (+ wavs if "
                             "a vocoder is configured) to result_path, "
                             "like the in-loop evaluation does")
    parser.add_argument("--objective", type=int, default=0, metavar="N",
                        help="also synthesize N val utterances end-to-end "
                             "and report objective metrics (DTW MCD, "
                             "duration ratio) against the ground-truth "
                             "wavs; needs a corpus preprocessed with "
                             "preprocessing.audio.save_trimmed_wav: true")
    parser.add_argument("--split", choices=["val", "train"], default="val",
                        help="metadata split for --objective (train: e.g. "
                             "overfit corpora preprocessed with val_size "
                             "0, where the training set IS the demo set)")
    parser.add_argument("--save_dir", default=None,
                        help="with --objective: also write each "
                             "synthesized wav plus a metrics.json there "
                             "(feeds evaluation/demo_page.py)")
    parser.add_argument("--vocoder_ckpt", default=None,
                        help="vocoder weights for --objective/--synth: a "
                             "torch generator checkpoint or a native "
                             "orbax dir from train_vocoder.py")
    args = parser.parse_args(argv)

    configs = read_configs(args)
    preprocess_config, model_config, train_config = configs
    model, variables, cfg = load_model_for_inference(
        configs, args.restore_step, args.torch_ckpt,
        dtype_from_flag(args.dtype), weights_npz=args.weights_npz)

    from fastspeech2_tpu.configs.config import OptimConfig
    from fastspeech2_tpu.data import FeatureDataset
    from fastspeech2_tpu.training.loop import evaluate
    from fastspeech2_tpu.training.optim import make_optimizer
    from fastspeech2_tpu.training.step import make_eval_step
    from fastspeech2_tpu.training.train_state import TrainState

    optim_cfg = OptimConfig.build(train_config)
    optimizer, _ = make_optimizer(optim_cfg, cfg.encoder_hidden)
    from fastspeech2_tpu.utils.jit_cache import cached_jit

    state = TrainState.create(variables, optimizer, step=args.restore_step)
    eval_step = cached_jit(("eval_step", model),
                           lambda: jax.jit(make_eval_step(model, cfg)))
    val_dataset = FeatureDataset("val.txt", preprocess_config)
    losses = evaluate(eval_step, state, val_dataset, preprocess_config,
                      optim_cfg.batch_size, cfg)
    message = ("Validation Step {}, Total Loss: {:.4f}, Mel Loss: {:.4f}, "
               "Mel PostNet Loss: {:.4f}, Pitch Loss: {:.4f}, Energy Loss: "
               "{:.4f}, Duration Loss: {:.4f}").format(
        args.restore_step, *losses)
    print(message)

    if args.synth:
        import os

        from fastspeech2_tpu.data.dataset import collate_batch
        from fastspeech2_tpu.synthesis import get_vocoder
        from fastspeech2_tpu.training.loop import synth_one_sample

        vocoder = get_vocoder(model_config, preprocess_config,
                              args.vocoder_ckpt)
        batch = collate_batch([val_dataset[0]],
                              max_mel_len=cfg.max_seq_len)
        fig, wav_rec, wav_pred = synth_one_sample(
            model, cfg, state, batch, preprocess_config, vocoder)
        result_path = train_config["path"]["result_path"]
        os.makedirs(result_path, exist_ok=True)
        base = os.path.join(
            result_path, f"val_step_{args.restore_step}")
        fig.savefig(base + ".png")
        if wav_rec is not None:
            from scipy.io import wavfile

            sr = preprocess_config["preprocessing"]["audio"][
                "sampling_rate"]
            wavfile.write(base + "_reconstructed.wav", sr, wav_rec)
            wavfile.write(base + "_synthesized.wav", sr, wav_pred)
        print(f"Synth sample written to {base}.png")

    if args.objective:
        _objective_eval(args, configs, model, variables, cfg)
    return losses


def _objective_eval(args, configs, model, variables, cfg):
    """Text -> wav for N val utterances, scored against ground truth.

    Uses the val metadata's golden phone strings (no G2P noise) and the
    trimmed GT wavs the preprocessor saves under <preprocessed>/wav when
    `save_trimmed_wav` is on.  Durations diverge between prediction and
    ground truth, so the comparison is DTW-aligned MCD plus the
    synthesized/GT duration ratio (frame-aligned F0 metrics are for
    copy-synthesis — see evaluation/vocoder_eval.py)."""
    import json
    import os

    import numpy as np

    from fastspeech2_tpu.cli.common import load_metadata_rows
    from fastspeech2_tpu.evaluation.metrics import f0_metrics, mcd
    from fastspeech2_tpu.synthesis import (
        Synthesizer,
        get_vocoder,
        vocoder_infer,
    )
    from fastspeech2_tpu.text import text_to_sequence

    preprocess_config, model_config, _ = configs
    pp = preprocess_config["preprocessing"]
    pre_path = preprocess_config["path"]["preprocessed_path"]
    wav_dir = os.path.join(pre_path, "wav")
    if not os.path.isdir(wav_dir):
        print("--objective needs trimmed GT wavs: re-preprocess with "
              "preprocessing.audio.save_trimmed_wav: true")
        return
    vocoder = get_vocoder(model_config, preprocess_config,
                          args.vocoder_ckpt)
    synthesizer = Synthesizer(model, variables, cfg, preprocess_config,
                              vocoder=vocoder)
    names, speakers, speaker_ids, texts = load_metadata_rows(
        preprocess_config, os.path.join(pre_path, f"{args.split}.txt"))
    raw_map = {}
    with open(os.path.join(pre_path, f"{args.split}.txt")) as f:
        for line in f:
            parts = line.rstrip("\n").split("|")
            if len(parts) >= 4:
                raw_map[parts[0]] = parts[3]
    sr = pp["audio"]["sampling_rate"]
    max_wav_value = pp["audio"]["max_wav_value"]
    cleaners = pp["text"]["text_cleaners"]
    rows = []
    for name, spk, spk_id, phones in zip(names, speakers, speaker_ids,
                                          texts):
        if len(rows) >= args.objective:
            break
        wav_path = os.path.join(wav_dir, f"{spk}-wav-{name}.npy")
        if not os.path.exists(wav_path):
            continue
        gt = np.load(wav_path).astype(np.float32)
        ids = np.asarray(text_to_sequence(phones, cleaners), np.int32)
        out = synthesizer.infer_ids(
            [ids], np.asarray([spk_id], np.int32))
        syn = vocoder_infer(out.postnet_mel, vocoder, preprocess_config,
                            lengths=np.asarray(out.mel_len))[0]
        syn = syn.astype(np.float32) / max_wav_value
        row = {
            "name": name,
            "mcd_db": round(mcd(gt, syn, sr,
                                hop_length=pp["stft"]["hop_length"]), 3),
            "duration_ratio": round(len(syn) / max(len(gt), 1), 4),
        }
        # durations track GT closely in practice (predictor trained on
        # the same corpus), so frame-aligned F0/voicing metrics stay
        # meaningful for text->wav too
        n = min(len(gt), len(syn))
        row.update({k: round(v, 4) for k, v in f0_metrics(
            gt[:n], syn[:n], sr, pp["stft"]["hop_length"]).items()})
        if args.save_dir:
            from fastspeech2_tpu.audio.wav import save_wav

            os.makedirs(args.save_dir, exist_ok=True)
            save_wav(os.path.join(args.save_dir, f"{name}_tts.wav"),
                     syn, sr)
            row["raw_text"] = raw_map.get(name, "")
        rows.append(row)
    if not rows:
        print("--objective: no val utterances with saved GT wavs found")
        return
    mean_mcd = float(np.mean([r["mcd_db"] for r in rows]))
    mean_dur = float(np.mean([r["duration_ratio"] for r in rows]))
    for r in rows:
        print(json.dumps(r))
    summary = {"objective_mean": {
        "mcd_db": round(mean_mcd, 3),
        "duration_ratio": round(mean_dur, 4), "n": len(rows)}}
    print(json.dumps(summary))
    if args.save_dir:
        with open(os.path.join(args.save_dir, "metrics.json"), "w") as f:
            json.dump({"rows": rows, **summary}, f, indent=1)
    return rows


if __name__ == "__main__":
    main()
