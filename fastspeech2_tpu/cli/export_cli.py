"""`python -m fastspeech2_tpu.cli.export_cli` — export a checkpoint trained
here to the reference's .pth.tar format for use with upstream PyTorch."""

import argparse

from fastspeech2_tpu.cli.common import (
    add_config_args,
    load_model_for_inference,
    read_configs,
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--restore_step", type=int, default=None)
    add_config_args(parser, required=False)
    parser.add_argument("-o", "--output", type=str, required=True,
                        help="output .pth.tar path")
    parser.add_argument("--vocoder_ckpt", type=str, default=None,
                        help="export a VOCODER instead: orbax step dir "
                             "from train_vocoder.py -> lean "
                             '{"generator": ...} .pth.tar (~53 MB vs the '
                             "~900 MB GAN train state), loadable by both "
                             "this framework and the reference")
    parser.add_argument("--vocoder_config", type=str, default=None,
                        help="hifigan config.json the vocoder was trained "
                             "with (for upsample_rates / kernel counts)")
    args = parser.parse_args(argv)

    if args.vocoder_ckpt:
        _export_vocoder(args)
        return
    if args.restore_step is None:
        parser.error("--restore_step is required for acoustic export")

    configs = read_configs(args)
    _, variables, cfg = load_model_for_inference(configs, args.restore_step)

    import jax

    from fastspeech2_tpu.convert.to_torch import save_torch_checkpoint

    save_torch_checkpoint(args.output, jax.device_get(variables), cfg)
    print(f"Exported step {args.restore_step} to {args.output}")


def _export_vocoder(args):
    import json
    import os

    import orbax.checkpoint as ocp

    from fastspeech2_tpu.convert.to_torch import (
        save_torch_vocoder_checkpoint,
    )

    rates, n_kernels = (8, 8, 2, 2), 3
    if args.vocoder_config:
        with open(args.vocoder_config) as f:
            cfg = json.load(f)
        rates = tuple(cfg.get("upsample_rates", rates))
        n_kernels = len(cfg.get("resblock_kernel_sizes", (3, 7, 11)))
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(args.vocoder_ckpt))
    save_torch_vocoder_checkpoint(
        args.output, {"params": tree["gen_params"]}, rates, n_kernels)
    size = os.path.getsize(args.output) / 1e6
    print(f"Exported generator from {args.vocoder_ckpt} to "
          f"{args.output} ({size:.0f} MB)")


if __name__ == "__main__":
    main()
