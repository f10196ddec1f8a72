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
    parser.add_argument("--restore_step", type=int, required=True)
    add_config_args(parser)
    parser.add_argument("-o", "--output", type=str, required=True,
                        help="output .pth.tar path")
    args = parser.parse_args(argv)

    configs = read_configs(args)
    _, variables, cfg = load_model_for_inference(configs, args.restore_step)

    import jax

    from fastspeech2_tpu.convert.to_torch import save_torch_checkpoint

    save_torch_checkpoint(args.output, jax.device_get(variables), cfg)
    print(f"Exported step {args.restore_step} to {args.output}")


if __name__ == "__main__":
    main()
