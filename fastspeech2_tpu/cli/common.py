"""Shared CLI plumbing: config loading and model restoration."""

import os

import jax
import jax.numpy as jnp

from fastspeech2_tpu.configs.config import load_yaml_configs


def add_config_args(parser, required=True):
    parser.add_argument("-p", "--preprocess_config", type=str,
                        required=required, help="path to preprocess.yaml")
    parser.add_argument("-m", "--model_config", type=str, required=required,
                        help="path to model.yaml")
    parser.add_argument("-t", "--train_config", type=str, required=required,
                        help="path to train.yaml")


def read_configs(args):
    return load_yaml_configs(
        args.preprocess_config, args.model_config, args.train_config)


def dtype_from_flag(name):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def load_model_for_inference(configs, restore_step=0, torch_ckpt=None,
                             dtype=jnp.float32, weights_npz=None):
    """Build FastSpeech2 + variables from an orbax checkpoint (ours), a
    torch .pth.tar (reference format, converted on the fly), or a tracked
    fp16 npz snapshot (scripts/save_weights_npz.py)."""
    from fastspeech2_tpu.configs.config import FastSpeech2Config
    from fastspeech2_tpu.models import FastSpeech2

    preprocess_config, model_config, train_config = configs
    cfg = FastSpeech2Config.build(preprocess_config, model_config)
    model = FastSpeech2(cfg, dtype=dtype)

    if weights_npz:
        from fastspeech2_tpu.utils.params_io import load_variables_npz

        variables = jax.tree_util.tree_map(
            jnp.asarray, load_variables_npz(weights_npz))
        return model, variables, cfg

    if torch_ckpt:
        import torch

        from fastspeech2_tpu.convert.from_torch import (
            fastspeech2_variables_from_torch,
        )

        ckpt = torch.load(torch_ckpt, map_location="cpu", weights_only=True)
        sd = ckpt.get("model", ckpt)
        variables = jax.tree_util.tree_map(
            jnp.asarray, fastspeech2_variables_from_torch(sd, cfg))
        return model, variables, cfg

    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("max_mel_len", "train"))(
        {"params": rng, "dropout": rng},
        jnp.zeros((1,), jnp.int32), jnp.ones((1, 8), jnp.int32),
        jnp.asarray([8]), max_mel_len=16, train=False)
    if restore_step:
        from fastspeech2_tpu.training.checkpoint import restore_checkpoint
        from fastspeech2_tpu.training.optim import make_optimizer
        from fastspeech2_tpu.configs.config import OptimConfig
        from fastspeech2_tpu.training.train_state import TrainState

        optimizer, _ = make_optimizer(
            OptimConfig.build(train_config), cfg.encoder_hidden)
        state = TrainState.create(variables, optimizer, step=restore_step)
        state = restore_checkpoint(
            train_config["path"]["ckpt_path"], state, restore_step)
        variables = state.variables()
    return model, variables, cfg


def load_metadata_rows(preprocess_config, source_path):
    """Read a pipe-delimited metadata file (train.txt/val.txt schema) plus
    the corpus speaker map: -> (names, speaker_ids, phone_strings).

    Shared by synthesize --mode batch and evaluate --objective so the
    metadata/speaker-map handling cannot drift between CLIs."""
    import json
    import os

    from fastspeech2_tpu.data.dataset import FeatureDataset

    names, speakers, texts, _ = FeatureDataset._read_metadata(source_path)
    speakers_path = os.path.join(
        preprocess_config["path"]["preprocessed_path"], "speakers.json")
    speaker_map = (json.load(open(speakers_path))
                   if os.path.exists(speakers_path) else {})
    speaker_ids = [speaker_map.get(s, 0) for s in speakers]
    return names, speakers, speaker_ids, texts
