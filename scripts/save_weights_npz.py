#!/usr/bin/env python
"""Snapshot trained checkpoints as compact fp16 npz files under weights/.

Gitignored output/ does not survive between build rounds; everything the
demo/bench quality story depends on must be tracked.  Usage:

  PYTHONPATH=. python scripts/save_weights_npz.py \
      --acoustic output/ckpt/LJSpeech10 --acoustic_step 100000 \
      --vocoder output/vocoder_r3 \
      --out_dir weights
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--acoustic", help="orbax ckpt dir from train.py")
    p.add_argument("--acoustic_step", type=int, default=-1)
    p.add_argument("--acoustic_name", default="acoustic.npz")
    p.add_argument("--model_yaml", default="config/LJSpeech10/model.yaml")
    p.add_argument("--preprocess_yaml",
                   default="config/LJSpeech10/preprocess.yaml")
    p.add_argument("--vocoder", help="orbax ckpt dir from train_vocoder.py")
    p.add_argument("--vocoder_name", default="vocoder_gen.npz")
    p.add_argument("--out_dir", default="weights")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import yaml

    from fastspeech2_tpu.utils.params_io import save_variables_npz

    jax.config.update("jax_platforms", "cpu")

    if args.acoustic:
        from fastspeech2_tpu.configs.config import (
            FastSpeech2Config,
            OptimConfig,
        )
        from fastspeech2_tpu.models import FastSpeech2
        from fastspeech2_tpu.training import TrainState, make_optimizer
        from fastspeech2_tpu.training.checkpoint import (
            latest_step,
            restore_checkpoint,
        )

        with open(args.preprocess_yaml) as f:
            pre = yaml.safe_load(f)
        with open(args.model_yaml) as f:
            model_cfg = yaml.safe_load(f)
        cfg = FastSpeech2Config.build(pre, model_cfg)
        model = FastSpeech2(cfg)
        rng = jax.random.PRNGKey(0)
        init_vars = jax.jit(
            model.init, static_argnames=("max_mel_len", "train"))(
            {"params": rng, "dropout": rng},
            jnp.zeros((1,), jnp.int32), jnp.ones((1, 8), jnp.int32),
            jnp.asarray([8]), max_mel_len=16, train=False)
        opt, _ = make_optimizer(OptimConfig(), cfg.encoder_hidden)
        step = (args.acoustic_step if args.acoustic_step >= 0
                else latest_step(args.acoustic))
        state = restore_checkpoint(
            args.acoustic, TrainState.create(init_vars, opt), step)
        out = os.path.join(args.out_dir, args.acoustic_name)
        save_variables_npz(out, state.variables())
        print(f"acoustic step {step} -> {out} "
              f"({os.path.getsize(out) / 2**20:.1f} MiB)")

    if args.vocoder:
        import orbax.checkpoint as ocp

        from fastspeech2_tpu.training.checkpoint import latest_step

        step = latest_step(args.vocoder)
        with ocp.PyTreeCheckpointer() as ckptr:
            tree = ckptr.restore(
                os.path.abspath(os.path.join(args.vocoder, str(step))))
        out = os.path.join(args.out_dir, args.vocoder_name)
        save_variables_npz(out, {"params": tree["gen_params"]})
        print(f"vocoder generator step {step} -> {out} "
              f"({os.path.getsize(out) / 2**20:.1f} MiB)")


if __name__ == "__main__":
    main()
