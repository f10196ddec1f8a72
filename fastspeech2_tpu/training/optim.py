"""Noam-scheduled Adam (reference model/optimizer.py:5-51).

lr(step) = d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)
           * anneal_rate^(# anneal_steps passed)

The reference increments its counter *before* computing the scale, so the
first update uses step=1; optax's count starts at 0, hence the +1 below.
Built as an optax chain: global-norm clip (train.py:93, thresh from
train.yaml) -> Adam moments (betas 0.9/0.98, eps 1e-9) -> schedule -> -1.
"""

import jax.numpy as jnp
import optax

from fastspeech2_tpu.configs.config import OptimConfig


def noam_schedule(d_model, warm_up_step, anneal_steps=(), anneal_rate=1.0):
    init_lr = d_model ** -0.5
    anneal_steps = jnp.asarray(list(anneal_steps), dtype=jnp.float32)

    def schedule(count):
        step = jnp.asarray(count, jnp.float32) + 1.0
        scale = jnp.minimum(step ** -0.5, step * warm_up_step ** -1.5)
        if anneal_steps.size:
            n_passed = jnp.sum(step > anneal_steps)
            scale = scale * anneal_rate ** n_passed
        return init_lr * scale

    return schedule


def make_optimizer(optim_config: OptimConfig, d_model: int):
    """The reference training optimizer as an optax GradientTransformation."""
    schedule = noam_schedule(
        d_model,
        optim_config.warm_up_step,
        optim_config.anneal_steps,
        optim_config.anneal_rate,
    )
    chain = [
        optax.clip_by_global_norm(optim_config.grad_clip_thresh),
        optax.scale_by_adam(
            b1=optim_config.betas[0],
            b2=optim_config.betas[1],
            eps=optim_config.eps,
            # bf16 first moment (optimizer.mu_dtype in train.yaml) halves
            # m's share of the memory-bound update; nu stays fp32 (its
            # rsqrt is precision-sensitive).  Default fp32 = parity.
            mu_dtype=jnp.dtype(optim_config.mu_dtype),
        ),
    ]
    if optim_config.weight_decay:
        chain.append(optax.add_decayed_weights(optim_config.weight_decay))
    chain.extend([
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    ])
    return optax.chain(*chain), schedule
