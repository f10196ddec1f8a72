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
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="float32")
    parser.add_argument("--synth", action="store_true",
                        help="also write a synth-sample figure (+ wavs if "
                             "a vocoder is configured) to result_path, "
                             "like the in-loop evaluation does")
    args = parser.parse_args(argv)

    configs = read_configs(args)
    preprocess_config, model_config, train_config = configs
    model, variables, cfg = load_model_for_inference(
        configs, args.restore_step, args.torch_ckpt,
        dtype_from_flag(args.dtype))

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

        vocoder = get_vocoder(model_config, preprocess_config, None)
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
    return losses


if __name__ == "__main__":
    main()
