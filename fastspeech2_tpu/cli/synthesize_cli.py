"""`python synthesize.py` — single/batch synthesis CLI
(reference synthesize.py:111-214 flags + --torch_ckpt for .pth.tar)."""

import argparse

import numpy as np

from fastspeech2_tpu.cli.common import (
    add_config_args,
    dtype_from_flag,
    load_model_for_inference,
    read_configs,
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--restore_step", type=int, default=0)
    parser.add_argument("--mode", choices=["batch", "single"], required=True)
    parser.add_argument("--source", type=str, default=None,
                        help="batch mode: metadata file of sentences")
    parser.add_argument("--text", type=str, default=None,
                        help="single mode: raw text to synthesize")
    parser.add_argument("--speaker_id", type=int, default=0)
    add_config_args(parser)
    parser.add_argument("--pitch_control", type=float, default=1.0)
    parser.add_argument("--energy_control", type=float, default=1.0)
    parser.add_argument("--duration_control", type=float, default=1.0)
    parser.add_argument("--control_mode", default="reference",
                        choices=("reference", "absolute"),
                        help="reference: scale the z-scored prediction "
                             "(upstream model/modules.py:124,146 "
                             "semantics); absolute: scale the real "
                             "F0/energy value, so 1.2 means +20%% Hz")
    parser.add_argument("--torch_ckpt", type=str, default=None,
                        help="reference-format .pth.tar checkpoint")
    parser.add_argument("--weights_npz", type=str, default=None,
                        help="tracked fp16 npz snapshot "
                             "(scripts/save_weights_npz.py)")
    parser.add_argument("--vocoder_ckpt", type=str, default=None,
                        help="torch HiFi-GAN generator checkpoint")
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="float32")
    parser.add_argument("--long", action="store_true",
                        help="single mode: no 100-char truncation; split "
                             "into sentences and join the audio")
    args = parser.parse_args(argv)

    if args.mode == "batch":
        assert args.source is not None and args.text is None
    if args.mode == "single":
        assert args.source is None and args.text is not None

    configs = read_configs(args)
    preprocess_config, model_config, train_config = configs
    model, variables, cfg = load_model_for_inference(
        configs, args.restore_step, args.torch_ckpt,
        dtype_from_flag(args.dtype), weights_npz=args.weights_npz)

    from fastspeech2_tpu.synthesis import Synthesizer, get_vocoder

    vocoder = get_vocoder(model_config, preprocess_config,
                          args.vocoder_ckpt)
    synthesizer = Synthesizer(model, variables, cfg, preprocess_config,
                              vocoder=vocoder,
                              control_mode=args.control_mode)
    result_path = train_config["path"]["result_path"]

    if args.mode == "single" and args.long:
        import os


        wav, chunks = synthesizer.synthesize_long(
            args.text, args.speaker_id, args.pitch_control,
            args.energy_control, args.duration_control)
        os.makedirs(result_path, exist_ok=True)
        out_path = os.path.join(result_path, f"{args.text[:40]}.wav")
        sr = preprocess_config["preprocessing"]["audio"]["sampling_rate"]
        from scipy.io import wavfile

        wavfile.write(out_path, sr, wav)
        print(f"Synthesized {len(chunks)} chunks -> {out_path}")
        return
    if args.mode == "single":
        ids = [args.text[:100]]
        ids_seq, phones = synthesizer.text_to_ids(args.text)
        print("Raw Text Sequence: {}".format(args.text))
        print("Phoneme Sequence: {}".format(phones))
        out = synthesizer.infer_ids(
            [ids_seq], np.array([args.speaker_id]),
            args.pitch_control, args.energy_control, args.duration_control)
        from fastspeech2_tpu.synthesis import vocoder_infer

        wavs = vocoder_infer(out.postnet_mel, vocoder, preprocess_config,
                             lengths=np.asarray(out.mel_len))
        synthesizer.save_results(ids, out, wavs, result_path)
    else:
        from fastspeech2_tpu.cli.common import load_metadata_rows

        names, _, speaker_ids, texts = load_metadata_rows(
            preprocess_config, args.source)
        cleaners = preprocess_config["preprocessing"]["text"][
            "text_cleaners"]
        from fastspeech2_tpu.text import text_to_sequence

        for start in range(0, len(names), 8):  # batch_size=8 as upstream
            chunk = slice(start, start + 8)
            id_seqs = [np.asarray(text_to_sequence(t, cleaners), np.int32)
                       for t in texts[chunk]]
            spk = np.asarray(speaker_ids[chunk], np.int32)
            out = synthesizer.infer_ids(
                id_seqs, spk, args.pitch_control, args.energy_control,
                args.duration_control)
            from fastspeech2_tpu.synthesis import vocoder_infer

            wavs = vocoder_infer(
                out.postnet_mel, vocoder, preprocess_config,
                lengths=np.asarray(out.mel_len))
            synthesizer.save_results(names[chunk], out, wavs, result_path)
    print(f"Results written to {result_path}")


if __name__ == "__main__":
    main()
