"""Full training orchestration (reference train.py:21-169 equivalent).

Builds the model/optimizer/mesh, shards params and batches, runs the jitted
train step over bucketed batches, and performs the periodic duties: scalar
logging every log_step, one synthesized sample every synth_step, a val-set
pass every val_step, an orbax checkpoint every save_step.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fastspeech2_tpu.configs.config import (
    FastSpeech2Config,
    OptimConfig,
    StepConfig,
)
from fastspeech2_tpu.data import BucketedLoader, FeatureDataset
from fastspeech2_tpu.models import FastSpeech2
from fastspeech2_tpu.parallel import make_mesh, shard_variables
from fastspeech2_tpu.training.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from fastspeech2_tpu.training.optim import make_optimizer
from fastspeech2_tpu.training.step import make_eval_step, make_train_step
from fastspeech2_tpu.training.train_state import TrainState
from fastspeech2_tpu.utils.logging import TrainLogger


def _model_batch(batch):
    """Strip host-only fields from a loader batch."""
    return {k: v for k, v in batch.items()
            if k not in ("ids", "raw_texts", "valid_count")}


def init_training(preprocess_config, model_config, train_config,
                  restore_step=0, mesh=None, dtype=jnp.float32, seed=1234):
    """Build (model, cfg, state, optimizer, mesh, shardings)."""
    cfg = FastSpeech2Config.build(preprocess_config, model_config)
    optim_cfg = OptimConfig.build(train_config)
    model = FastSpeech2(cfg, dtype=dtype)
    optimizer, schedule = make_optimizer(optim_cfg, cfg.encoder_hidden)

    rng = jax.random.PRNGKey(seed)
    B, Pn, T = 2, 16, 64
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((B,), jnp.int32),
        jnp.ones((B, Pn), jnp.int32),
        jnp.full((B,), Pn, jnp.int32),
        mels=jnp.zeros((B, T, cfg.n_mel_channels)),
        mel_lens=jnp.full((B,), T, jnp.int32),
        max_mel_len=T,
        p_targets=jnp.zeros((B, Pn)),
        e_targets=jnp.zeros((B, Pn)),
        d_targets=jnp.full((B, Pn), 4, jnp.int32),
        train=True,
    )

    if mesh is None:
        # the data axis must divide the global batch; idle any remainder
        import math

        n_dev = len(jax.devices())
        data = math.gcd(OptimConfig.build_batch_size(train_config), n_dev)
        mesh = make_mesh(data=max(data, 1), model=1)
    variables, shardings = shard_variables(variables, mesh)
    state = TrainState.create(variables, optimizer, step=restore_step)

    if restore_step:
        ckpt_dir = os.path.join(train_config["path"]["ckpt_path"])
        state = restore_checkpoint(ckpt_dir, state, restore_step)

    return model, cfg, optim_cfg, state, optimizer, mesh


def train(preprocess_config, model_config, train_config, restore_step=0,
          dtype=jnp.float32, max_steps=None, log=print):
    """The reference main() loop (train.py:21-169)."""
    steps = StepConfig.build(train_config)
    optim_cfg = OptimConfig.build(train_config)
    total_step = min(steps.total_step, max_steps or steps.total_step)

    model, cfg, optim_cfg, state, optimizer, mesh = init_training(
        preprocess_config, model_config, train_config, restore_step,
        dtype=dtype)
    n_params = state.num_params()
    log(f"Number of FastSpeech2 Parameters: {n_params}")

    dataset = FeatureDataset("train.txt", preprocess_config)
    loader = BucketedLoader(
        dataset, batch_size=optim_cfg.batch_size, group_size=4,
        shuffle=True, drop_last=True, max_mel_len=cfg.max_seq_len)
    val_dataset = FeatureDataset("val.txt", preprocess_config)

    train_step = jax.jit(
        make_train_step(model, cfg, optimizer,
                        grad_acc_step=optim_cfg.grad_acc_step),
        donate_argnums=0)
    eval_step = jax.jit(make_eval_step(model, cfg))

    logger = TrainLogger(os.path.join(
        train_config["path"]["log_path"], "train"))
    val_logger = TrainLogger(os.path.join(
        train_config["path"]["log_path"], "val"))
    ckpt_dir = train_config["path"]["ckpt_path"]

    batch_sharding = NamedSharding(mesh, P("data"))
    rng = jax.random.PRNGKey(restore_step + 1)
    step = restore_step
    epoch = 0
    t0 = time.time()
    while step < total_step:
        for batch in loader.epoch(epoch):
            if step >= total_step:
                break
            device_batch = {
                k: jax.device_put(v, batch_sharding)
                for k, v in _model_batch(batch).items()
            }
            state, losses = train_step(state, device_batch, rng)
            step += 1

            if step % steps.log_step == 0:
                vals = [float(v) for v in losses]
                msg1 = f"Step {step}/{total_step}"
                msg2 = ("Total Loss: {:.4f}, Mel Loss: {:.4f}, Mel PostNet "
                        "Loss: {:.4f}, Pitch Loss: {:.4f}, Energy Loss: "
                        "{:.4f}, Duration Loss: {:.4f}").format(*vals)
                log(msg1 + ", " + msg2 + f" ({time.time() - t0:.1f}s)")
                logger.message(msg1 + ", " + msg2)
                logger.scalars(step, vals)

            if step % steps.val_step == 0:
                val_losses = evaluate(
                    eval_step, state, val_dataset, preprocess_config,
                    optim_cfg.batch_size, cfg)
                msg = ("Validation Step {}, Total Loss: {:.4f}, Mel Loss: "
                       "{:.4f}, Mel PostNet Loss: {:.4f}, Pitch Loss: "
                       "{:.4f}, Energy Loss: {:.4f}, Duration Loss: {:.4f}"
                       ).format(step, *val_losses)
                log(msg)
                val_logger.message(msg)
                val_logger.scalars(step, val_losses)

            if step % steps.save_step == 0:
                save_checkpoint(ckpt_dir, state, step)
                log(f"Saved checkpoint at step {step}")
        epoch += 1

    save_checkpoint(ckpt_dir, state, step)
    logger.close()
    val_logger.close()
    return state


def evaluate(eval_step, state, val_dataset, preprocess_config, batch_size,
             cfg):
    """Sample-weighted mean val losses (evaluate.py:37-51)."""
    loader = BucketedLoader(
        val_dataset, batch_size=batch_size, group_size=1, shuffle=False,
        drop_last=False, max_mel_len=cfg.max_seq_len)
    sums = np.zeros(6)
    count = 0
    for batch in loader.epoch(0):
        n = batch.get("valid_count", batch["texts"].shape[0])
        losses = eval_step(state, _model_batch(batch))
        sums += np.array([float(v) for v in losses]) * n
        count += n
    return (sums / max(count, 1)).tolist()
