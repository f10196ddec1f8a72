"""Copy-synthesis vocoder evaluation: GT wav -> mel -> vocoder -> wav,
scored against the original with the objective metrics (MCD, F0 RMSE,
voicing F1).

This is the standard way to isolate VOCODER quality from acoustic-model
quality (the reference has no equivalent tooling).  Works with any
checkpoint `synthesis/vocoder.py::get_vocoder` accepts: a torch
`{"generator": ...}` .pth.tar or a native orbax step directory written by
`train_vocoder.py`.

    python -m fastspeech2_tpu.evaluation.vocoder_eval \
        --vocoder HiFi-GAN-iSTFT --ckpt output/vocoder_run/8000 \
        /path/to/gt1.wav /path/to/gt2.wav
"""

import argparse
import json

import numpy as np


def evaluate_vocoder(vocoder, wav_paths, sampling_rate=22050,
                     hop_length=256, max_wav_value=32768.0,
                     save_dir=None):
    """-> (per-file metric dicts, mean-metrics dict).

    save_dir, if given, receives <name>_copysyn.wav next to the metrics
    so results can be listened to (and fed to demo_page.py)."""
    import os

    from fastspeech2_tpu.audio.stft import MelSpectrogram
    from fastspeech2_tpu.audio.wav import load_wav, save_wav
    from fastspeech2_tpu.evaluation.metrics import f0_metrics, mcd
    from fastspeech2_tpu.synthesis.vocoder import vocoder_infer

    mel_fn = MelSpectrogram(sampling_rate=sampling_rate,
                            hop_length=hop_length)
    pre = {"preprocessing": {
        "audio": {"max_wav_value": max_wav_value},
        "stft": {"hop_length": hop_length}}}
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    per_file = []
    for path in wav_paths:
        gt, _ = load_wav(path, sampling_rate)
        gt = gt.astype(np.float32)
        mel, _ = mel_fn(gt[None, :])
        mel = np.asarray(mel).transpose(0, 2, 1)        # [1, frames, 80]
        n_frames = mel.shape[1]
        syn = vocoder_infer(mel, vocoder, pre,
                            lengths=[n_frames])[0] / max_wav_value
        if save_dir:
            base = os.path.splitext(os.path.basename(path))[0]
            save_wav(os.path.join(save_dir, f"{base}_copysyn.wav"),
                     syn, sampling_rate)
        n = min(len(gt), len(syn))
        row = {"file": path,
               "mcd_db": round(mcd(gt[:n], syn[:n], sampling_rate,
                                   hop_length=hop_length), 3)}
        row.update({k: round(v, 4) for k, v in
                    f0_metrics(gt[:n], syn[:n], sampling_rate,
                               hop_length).items()})
        per_file.append(row)
    keys = [k for k in per_file[0] if k != "file"]
    mean = {k: round(float(np.mean([r[k] for r in per_file])), 4)
            for k in keys}
    return per_file, mean


def _main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("wavs", nargs="+")
    ap.add_argument("--vocoder", default="HiFi-GAN-iSTFT",
                    help="vocoder.model name (HiFi-GAN, HiFi-GAN-iSTFT, "
                         "HiFi-GAN-iSTFT-C8C2I, MelGAN)")
    ap.add_argument("--ckpt", default=None,
                    help="torch .pth.tar or orbax step dir from "
                         "train_vocoder.py (default: bundled speaker ckpt "
                         "if present, else random init)")
    ap.add_argument("--speaker", default="LJSpeech")
    ap.add_argument("--sr", type=int, default=22050)
    ap.add_argument("--save_dir", default=None,
                    help="also write <name>_copysyn.wav files here")
    args = ap.parse_args()

    from fastspeech2_tpu.synthesis.vocoder import get_vocoder

    model_config = {"vocoder": {"model": args.vocoder,
                                "speaker": args.speaker}}
    pre_config = {"preprocessing": {
        "audio": {"sampling_rate": args.sr, "max_wav_value": 32768.0},
        "stft": {"filter_length": 1024, "hop_length": 256,
                 "win_length": 1024},
        "mel": {"n_mel_channels": 80, "mel_fmin": 0, "mel_fmax": 8000}}}
    vocoder = get_vocoder(model_config, pre_config, ckpt_path=args.ckpt)
    per_file, mean = evaluate_vocoder(vocoder, args.wavs, args.sr,
                                      save_dir=args.save_dir)
    for row in per_file:
        print(json.dumps(row))
    print(json.dumps({"mean": mean, "n_files": len(per_file)}))


if __name__ == "__main__":
    _main()
