"""Pure train/eval step functions (the hot loop).

One jitted, donated, mesh-sharded function per step — the TPU equivalent of
the reference's forward/backward/clip/Noam sequence (train.py:79-97) with
gradient accumulation folded in as a lax.scan over micro-batches.
"""

import jax
import jax.numpy as jnp
import optax

from fastspeech2_tpu.models.loss import LossOutput, fastspeech2_loss


def _apply_model(model, cfg, params, batch_stats, batch, rng, train,
                 row_keep=None):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    if batch["mels"].dtype != jnp.float32:
        # mels may arrive bf16 over the wire (loop.py mel_bf16); loss
        # targets are always fp32 on device
        batch = dict(batch)
        batch["mels"] = batch["mels"].astype(jnp.float32)
    kwargs = dict(
        mels=batch["mels"],
        mel_lens=batch["mel_lens"],
        max_mel_len=batch["mels"].shape[1],
        p_targets=batch["pitches"],
        e_targets=batch["energies"],
        d_targets=batch["durations"],
        train=train,
    )
    if train:
        out, mutated = model.apply(
            variables,
            batch["speakers"], batch["texts"], batch["src_lens"],
            rngs={"dropout": rng},
            mutable=["batch_stats"],
            **kwargs,
        )
        new_stats = mutated["batch_stats"]
    else:
        out = model.apply(
            variables,
            batch["speakers"], batch["texts"], batch["src_lens"],
            **kwargs,
        )
        new_stats = batch_stats
    losses = fastspeech2_loss(
        cfg, out, batch["mels"], batch["pitches"], batch["energies"],
        batch["durations"], row_keep=row_keep,
    )
    return losses, new_stats, out


def dropout_key(seed):
    """Training dropout PRNG key using the TPU-native RBG generator.

    The default threefry keygen is ALU-heavy on TPU: measured ~5 ms of a
    ~22 ms full train step at the bench shapes (23%). Dropout needs
    statistical, not counter-exact, randomness, so the hardware RNG is
    the right tool; on CPU rbg also works (tests are unaffected — none
    pins a specific dropout pattern)."""
    return jax.random.key(seed, impl="rbg")


def make_train_step(model, cfg, optimizer, grad_acc_step=1):
    """Build train_step(state, batch, rng) -> (state, LossOutput).

    For grad_acc_step > 1 every batch array must carry a leading micro axis
    [A, B/A, ...]; gradients are averaged over micro-steps, matching the
    reference's loss/acc backward (train.py:89-97).
    """

    def grads_of(params, batch_stats, batch, rng):
        def loss_fn(p):
            losses, new_stats, _ = _apply_model(
                model, cfg, p, batch_stats, batch, rng, train=True)
            return losses.total, (losses, new_stats)

        grads, (losses, new_stats) = jax.grad(
            loss_fn, has_aux=True)(params)
        return grads, losses, new_stats

    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        if grad_acc_step == 1:
            grads, losses, new_stats = grads_of(
                state.params, state.batch_stats, batch, rng)
        else:
            def body(carry, micro):
                acc, stats, i = carry
                g, losses, stats = grads_of(
                    state.params, stats, micro,
                    jax.random.fold_in(rng, i))
                acc = jax.tree_util.tree_map(jnp.add, acc, g)
                return (acc, stats, i + 1), losses

            zero = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p), state.params)
            (grads, new_stats, _), losses_seq = jax.lax.scan(
                body, (zero, state.batch_stats, 0), batch)
            grads = jax.tree_util.tree_map(
                lambda g: g / grad_acc_step, grads)
            losses = jax.tree_util.tree_map(jnp.mean, losses_seq)

        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, losses

    return train_step


def make_scanned_train_step(model, cfg, optimizer, scan_step,
                            grad_acc_step=1):
    """K train steps in ONE compiled dispatch over a device-resident
    batch stack.

    The per-step path pays a host->device batch upload plus a dispatch
    round-trip every step; through a relay-attached TPU that overhead
    dwarfs the ~13 ms of compute (measured 0.69 s/step on the LJSpeech10
    overfit run).  Here the whole epoch's batches for one bucket shape
    live on device as a stacked pytree [n_batches, ...] and a lax.scan
    runs `scan_step` optimizer steps per dispatch, indexing the stack
    with a [K] int32 schedule — zero per-step transfers, one dispatch
    per K steps.  Numerics are identical to the per-step path (the inner
    body IS make_train_step's; rng folds on state.step in-graph).
    """
    inner = make_train_step(model, cfg, optimizer,
                            grad_acc_step=grad_acc_step)

    def scanned(state, stacked, indices, rng):
        def body(state, i):
            batch = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, i, axis=0, keepdims=False), stacked)
            # inner folds rng on state.step, so every scanned step gets
            # the same dropout stream the per-step path would
            state, losses = inner(state, batch, rng)
            return state, losses

        state, losses_seq = jax.lax.scan(body, state, indices)
        return state, losses_seq

    return scanned


def make_eval_step(model, cfg):
    """Teacher-forced eval losses (reference evaluate.py:37-51 semantics:
    dropout off, BatchNorm running stats)."""

    def eval_step(state, batch, valid_count=None):
        row_keep = None
        if valid_count is not None:
            # loader pads partial batches by repeating the last sample
            # (dataset.py); exclude the duplicate rows from the means so
            # evaluate() matches the reference's per-sample averaging
            b = batch["texts"].shape[0]
            row_keep = jnp.arange(b) < valid_count
        losses, _, _ = _apply_model(
            model, cfg, state.params, state.batch_stats, batch,
            rng=None, train=False, row_keep=row_keep)
        return losses

    return eval_step
