"""CLI for HiFi-GAN vocoder training (capability superset — the reference
ships only a pretrained generator, hifigan/models.py + utils/model.py:57-69).

Usage:
    python train_vocoder.py --wav_dir raw_data/LJSpeech \
        --out_dir output/vocoder [--config hifigan_config.json] \
        [--total_steps N] [--batch_size B]

--config accepts the upstream hifigan/config.json schema (upsample rates /
kernels / channels, learning_rate, lr_decay, segment_size, sampling_rate);
flags override it.
"""

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav_dir", default=None,
                   help="directory tree containing training .wav files "
                        "(from-scratch mode)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--finetune_from", default=None,
                   help="preprocessed corpus path: fine-tune on aligned "
                        "(GT wav, mel) pairs (needs save_trimmed_wav at "
                        "preprocess time; 'pred' mels from export_mels.py)")
    p.add_argument("--mel_source",
                   choices=["pred", "gt", "mixed", "gt_wav"],
                   default="pred",
                   help="mel inputs for --finetune_from: acoustic-model "
                        "predictions (pred), ground truth (gt), or a "
                        "50/50 per-sample mix (mixed — holds "
                        "copy-synthesis quality during GT-aligned "
                        "fine-tuning). gt_wav trains on the trimmed wav "
                        "bank with the input mel computed in-graph — "
                        "required for --aug_speed, equivalent to gt "
                        "otherwise")
    p.add_argument("--split", default=None, metavar="FILE",
                   help="with --finetune_from: restrict training to the "
                        "utterances named in this metadata file inside the "
                        "corpus (e.g. train.txt) — leave-one-out protocol")
    p.add_argument("--config", default=None,
                   help="hifigan config.json (upstream schema)")
    p.add_argument("--total_steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--segment_size", type=int, default=None)
    p.add_argument("--log_step", type=int, default=100)
    p.add_argument("--save_step", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_parallel", type=int, default=None,
                   help="shard the segment batch over N devices")
    p.add_argument("--adv_warmup", type=int, default=0,
                   help="freeze discriminators and train the generator on "
                        "mel-L1 only for the first N steps (stabilizes "
                        "variants that blow up from a cold start, e.g. "
                        "C8C2I — docs/vocoder_training.md)")
    p.add_argument("--learning_rate", type=float, default=None,
                   help="override the config learning rate (both "
                        "generator and discriminators)")
    p.add_argument("--mel_weight", type=float, default=None,
                   help="generator mel-L1 loss weight (default 45, "
                        "upstream HiFi-GAN); raise to trade adversarial "
                        "texture for spectral fidelity")
    p.add_argument("--init_gen_npz", default=None, metavar="NPZ",
                   help="warm-start the generator from a tracked fp16 npz "
                        "snapshot (utils/params_io.py) — continues a run "
                        "whose orbax checkpoints were not kept; ignored "
                        "when out_dir already holds a checkpoint (resume "
                        "wins). The discriminators and optimizer states "
                        "start fresh, so pair with --adv_warmup (e.g. "
                        "1000) to let the discriminators catch up before "
                        "the adversarial losses engage")
    p.add_argument("--scan_step", type=int, default=1,
                   help="run K GAN steps per dispatch over a "
                        "device-resident corpus bank (clamped to "
                        "gcd(log_step, save_step); corpus must fit HBM)")
    p.add_argument("--aug_gain_db", type=float, default=0.0,
                   help="random per-segment gain in U[-d, +d] dB "
                        "(in-graph; exact in every mode — log-e mels "
                        "shift additively). OOD-robustness augmentation "
                        "for small corpora")
    p.add_argument("--aug_speed", default=None, metavar="LO,HI",
                   help="random per-segment playback rate in U[lo, hi] "
                        "(joint pitch+tempo, e.g. 0.9,1.1). Needs "
                        "in-graph mels: --wav_dir mode or "
                        "--mel_source gt_wav")
    args = p.parse_args(argv)
    if args.wav_dir is None and args.finetune_from is None:
        p.error("one of --wav_dir or --finetune_from is required")

    cfg = {}
    if args.config:
        with open(args.config) as f:
            cfg = json.load(f)

    gen_cfg = {}
    for src, dst in [("arch", "arch"),                      # "melgan"
                     ("upsample_rates", "upsample_rates"),
                     ("upsample_kernel_sizes", "upsample_kernel_sizes"),
                     ("upsample_initial_channel", "upsample_initial_channel"),
                     ("resblock_kernel_sizes", "resblock_kernel_sizes"),
                     ("resblock_dilation_sizes", "resblock_dilation_sizes"),
                     ("ngf", "ngf"),                        # melgan width
                     ("n_residual_layers", "n_residual_layers"),
                     ("gen_istft_n_fft", "gen_istft_n_fft"),
                     ("gen_istft_hop_size", "gen_istft_hop_size")]:
        if src in cfg:
            v = cfg[src]
            if isinstance(v, list):
                v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
            gen_cfg[dst] = v

    disc_cfg = None
    if "discriminator" in cfg:
        disc_cfg = {
            k: (tuple(tuple(x) if isinstance(x, list) else x for x in v)
                if isinstance(v, list) else v)
            for k, v in cfg["discriminator"].items()
        }

    from fastspeech2_tpu.training.vocoder import train_vocoder

    init_gen = None
    if args.init_gen_npz:
        from fastspeech2_tpu.utils.params_io import load_variables_npz

        loaded = load_variables_npz(args.init_gen_npz)
        if not isinstance(loaded, dict) or "params" not in loaded:
            raise SystemExit(
                f"--init_gen_npz {args.init_gen_npz}: snapshot has no "
                f"'params' collection (top-level keys: "
                f"{sorted(loaded) if isinstance(loaded, dict) else type(loaded).__name__}). "
                "Expected the {'params': ...} layout written by "
                "scripts/save_weights_npz.py.")
        init_gen = loaded["params"]

    return train_vocoder(
        args.wav_dir, args.out_dir,
        total_steps=args.total_steps or cfg.get("training_steps", 1000),
        batch_size=args.batch_size or cfg.get("batch_size", 16),
        segment_size=args.segment_size or cfg.get("segment_size", 8192),
        sampling_rate=cfg.get("sampling_rate", 22050),
        learning_rate=(args.learning_rate
                       if args.learning_rate is not None
                       else cfg.get("learning_rate", 2e-4)),
        lr_decay=cfg.get("lr_decay", 0.999),
        n_mel_channels=cfg.get("num_mels", 80),
        mel_fmax=cfg.get("fmax", 8000.0) or 8000.0,
        generator_config=gen_cfg or None,
        discriminator_config=disc_cfg,
        finetune_from=args.finetune_from,
        mel_source=args.mel_source, split=args.split,
        init_generator_params=init_gen,
        data_parallel=args.data_parallel, scan_step=args.scan_step,
        mel_weight=(args.mel_weight if args.mel_weight is not None
                    else cfg.get("mel_weight", 45.0)),
        adv_warmup=args.adv_warmup,
        aug_gain_db=args.aug_gain_db,
        aug_speed=(tuple(float(x) for x in args.aug_speed.split(","))
                   if args.aug_speed else None),
        log_step=args.log_step, save_step=args.save_step, seed=args.seed,
    )


if __name__ == "__main__":
    main()
