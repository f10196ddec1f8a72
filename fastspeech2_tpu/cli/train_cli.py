"""`python train.py` — training CLI (reference train.py:172-198 flags)."""

import argparse

from fastspeech2_tpu.cli.common import (
    add_config_args,
    dtype_from_flag,
    read_configs,
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--restore_step", type=int, default=0,
                        help="checkpoint step to resume from; -1 resumes "
                             "from the latest checkpoint if any")
    add_config_args(parser)
    parser.add_argument("--max_steps", type=int, default=None,
                        help="stop early after this many steps")
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="bfloat16",
                        help="compute dtype (params stay float32)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of steps 11-20")
    args = parser.parse_args(argv)

    configs = read_configs(args)
    restore_step = args.restore_step
    if restore_step == -1:
        from fastspeech2_tpu.training.checkpoint import latest_step

        restore_step = latest_step(configs[2]["path"]["ckpt_path"]) or 0
        print(f"Resuming from step {restore_step}")
    from fastspeech2_tpu.training.loop import train

    train(*configs, restore_step=restore_step,
          dtype=dtype_from_flag(args.dtype), max_steps=args.max_steps,
          profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()
