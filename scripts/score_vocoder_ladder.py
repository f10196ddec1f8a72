"""Score a ladder of vocoder checkpoints in ONE process.

Copy-synthesis evaluation (evaluation/vocoder_eval.py) pays a fresh XLA
compile per (clip shape); through the TPU relay that is ~2 min per clip,
so scoring N checkpoints in N processes costs N x 10 compiles.  This
script builds the vocoder once and swaps parameter trees between
checkpoints: the jitted apply is keyed on the generator module, so every
checkpoint after the first reuses all compiled executables.

    python scripts/score_vocoder_ladder.py \
        --vocoder HiFi-GAN-iSTFT-C8C2I \
        --ckpts weights/vocoder_c8c2i_10k.npz output/c8c2i_cont/20000 \
        --wav_glob 'raw_data/LJSpeech10/LJSpeech/*.wav'
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_gen_params(path):
    import jax
    import jax.numpy as jnp

    if path.endswith(".npz"):
        from fastspeech2_tpu.utils.params_io import load_variables_npz

        tree = load_variables_npz(path)
    else:
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            raw = ckptr.restore(os.path.abspath(path))
        tree = {"params": raw["gen_params"]}
    # normalize dtype so every checkpoint hits the same executables
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), tree)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--vocoder", default="HiFi-GAN-iSTFT")
    ap.add_argument("--ckpts", nargs="+", required=True,
                    help="npz snapshots and/or orbax step dirs, scored "
                         "in order")
    ap.add_argument("--wav_glob",
                    default="raw_data/LJSpeech10/LJSpeech/*.wav")
    ap.add_argument("--sr", type=int, default=22050)
    ap.add_argument("--save_dir", default=None,
                    help="write <ckpt-tag>/<name>_copysyn.wav under here")
    args = ap.parse_args(argv)

    from fastspeech2_tpu.evaluation.vocoder_eval import evaluate_vocoder
    from fastspeech2_tpu.synthesis.vocoder import get_vocoder

    wavs = sorted(glob.glob(args.wav_glob))
    if not wavs:
        raise SystemExit(f"no wavs match {args.wav_glob}")
    model_config = {"vocoder": {"model": args.vocoder,
                                "speaker": "LJSpeech"}}
    pre_config = {"preprocessing": {
        "audio": {"sampling_rate": args.sr, "max_wav_value": 32768.0},
        "stft": {"filter_length": 1024, "hop_length": 256,
                 "win_length": 1024},
        "mel": {"n_mel_channels": 80, "mel_fmin": 0, "mel_fmax": 8000}}}
    vocoder = get_vocoder(model_config, pre_config,
                          ckpt_path=args.ckpts[0])
    for ckpt in args.ckpts:
        vocoder.params = load_gen_params(ckpt)
        tag = os.path.basename(ckpt.rstrip("/")) or ckpt
        save_dir = (os.path.join(args.save_dir, tag)
                    if args.save_dir else None)
        per_file, mean = evaluate_vocoder(vocoder, wavs, args.sr,
                                          save_dir=save_dir)
        print(json.dumps({"ckpt": ckpt, "mean": mean,
                          "n_files": len(per_file)}), flush=True)


if __name__ == "__main__":
    main()
