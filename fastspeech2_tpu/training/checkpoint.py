"""Orbax checkpointing of the TrainState pytree.

TPU-native replacement for the reference's torch.save of
{"model": ..., "optimizer": ...} every save_step (train.py:151-161):
params, optimizer state, PostNet batch stats, and the step counter are saved
and restored atomically, so --restore_step resumes both model and Noam
schedule exactly as upstream (utils/model.py:15-30).
"""

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir, state, step=None):
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    # pipeline every leaf's D2H copy before the first blocking fetch:
    # device_get alone waits per leaf, and each wait costs a full
    # scheduler round trip when other loop threads are live (measured
    # ~30 ms/leaf x ~250 leaves inside the training loop)
    jax.tree_util.tree_map(
        lambda x: x.copy_to_host_async()
        if hasattr(x, "copy_to_host_async") else None, state)
    if step is None:
        step = int(jax.device_get(state.step))
    path = os.path.join(ckpt_dir, str(step))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def restore_checkpoint(ckpt_dir, abstract_state, step):
    """Restore into the structure of `abstract_state` (a concrete or
    ShapeDtypeStruct TrainState)."""
    path = os.path.join(os.path.abspath(ckpt_dir), str(step))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract_state)


def latest_step(ckpt_dir):
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None
