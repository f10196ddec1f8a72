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
    args = parser.parse_args(argv)

    if args.vocoder_ckpt:
        _export_vocoder(args)
        return
    if args.restore_step is None:
        parser.error("--restore_step is required for acoustic export")
    if not (args.preprocess_config and args.model_config
            and args.train_config):
        parser.error("acoustic export requires -p/-m/-t config files")

    configs = read_configs(args)
    _, variables, cfg = load_model_for_inference(configs, args.restore_step)

    import jax

    from fastspeech2_tpu.convert.to_torch import save_torch_checkpoint

    save_torch_checkpoint(args.output, jax.device_get(variables), cfg)
    print(f"Exported step {args.restore_step} to {args.output}")


def _export_vocoder(args):
    import os

    import orbax.checkpoint as ocp

    from fastspeech2_tpu.convert.to_torch import (
        save_torch_vocoder_checkpoint,
    )

    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(args.vocoder_ckpt))
    params = tree["gen_params"]
    # derive the topology from the checkpoint itself (an iSTFT-variant
    # generator has fewer upsample stages and an (n_fft+2)-channel head)
    n_ups = sum(1 for k in params if k.startswith("up_"))
    n_blocks = sum(1 for k in params if k.startswith("resblock_"))
    assert n_ups and n_blocks % n_ups == 0, (n_ups, n_blocks)
    post_ch = params["conv_post"]["kernel"].shape[-1]
    save_torch_vocoder_checkpoint(
        args.output, {"params": params}, upsample_rates=(1,) * n_ups,
        n_resblock_kernels=n_blocks // n_ups)
    size = os.path.getsize(args.output) / 1e6
    note = ("" if n_ups == 4 and post_ch == 1 else
            " (iSTFT-variant topology: loadable by this framework's "
            "get_vocoder with the matching config; NOT by the reference, "
            "whose Generator is the fixed 4-stage parity layout)")
    print(f"Exported generator from {args.vocoder_ckpt} to "
          f"{args.output} ({size:.0f} MB){note}")


if __name__ == "__main__":
    main()
