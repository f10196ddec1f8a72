"""Training-step tests: loss decreases, grad accumulation equivalence,
checkpoint round-trip, sharded multi-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastspeech2_tpu.configs.config import OptimConfig
from fastspeech2_tpu.models import FastSpeech2
from fastspeech2_tpu.parallel import make_mesh, param_partition_spec, shard_variables
from fastspeech2_tpu.training import (
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)

from helpers import init_variables, synthetic_batch, tiny_config


def _init(cfg, batch, seed=0):
    model = FastSpeech2(cfg)
    return model, init_variables(model, batch, seed)


def test_loss_decreases_overfit():
    cfg = tiny_config()
    batch = synthetic_batch(cfg)
    model, variables = _init(cfg, batch)
    # short warmup so lr ramps fast on a tiny problem
    optim, _ = make_optimizer(OptimConfig(warm_up_step=20, anneal_steps=()),
                              cfg.encoder_hidden)
    state = TrainState.create(variables, optim)
    step_fn = jax.jit(make_train_step(model, cfg, optim))
    rng = jax.random.PRNGKey(1)
    # fetch only the first and last loss: a float() per step serializes
    # the whole loop on a host sync (30 steps reach ratio ~0.23, so the
    # 0.5 threshold keeps a wide margin)
    first = None
    for i in range(30):
        state, losses = step_fn(state, batch, rng)
        if i == 0:
            first = float(losses.total)
    last = float(losses.total)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.5, (first, last)
    assert int(state.step) == 30


def test_grad_accumulation_matches_full_batch():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, B=4)
    model, variables = _init(cfg, batch)
    optim, _ = make_optimizer(OptimConfig(warm_up_step=100, anneal_steps=()),
                              cfg.encoder_hidden)
    rng = jax.random.PRNGKey(2)

    # dropout makes micro-runs non-deterministic; compare with a config
    # where dropout rates are zero
    cfg0 = tiny_config(encoder_dropout=0.0, decoder_dropout=0.0,
                       vp_dropout=0.0)
    model0 = FastSpeech2(cfg0)

    state_full = TrainState.create(variables, optim)
    full_step = jax.jit(make_train_step(model0, cfg0, optim))
    state_full, losses_full = full_step(state_full, batch, rng)

    micro = {k: np.stack([v[:2], v[2:]]) for k, v in batch.items()}
    state_acc = TrainState.create(variables, optim)
    acc_step = jax.jit(make_train_step(model0, cfg0, optim, grad_acc_step=2))
    state_acc, losses_acc = acc_step(state_acc, micro, rng)

    # same data, deterministic model: accumulated grads ~= full-batch grads
    # (not identical: masked means weight samples differently per micro)
    full_p = jax.tree_util.tree_leaves(state_full.params)
    acc_p = jax.tree_util.tree_leaves(state_acc.params)
    for a, b in zip(full_p, acc_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2)
    assert np.isfinite(float(losses_acc.total))


def test_remat_gradients_match_plain():
    """jax.checkpoint over FFT blocks must not change gradients, only the
    backward memory profile."""
    cfg0 = tiny_config(encoder_dropout=0.0, decoder_dropout=0.0,
                       vp_dropout=0.0)
    batch = synthetic_batch(cfg0)
    model0, variables = _init(cfg0, batch)
    optim, _ = make_optimizer(OptimConfig(warm_up_step=100, anneal_steps=()),
                              cfg0.encoder_hidden)
    rng = jax.random.PRNGKey(3)

    import dataclasses
    cfg_r = dataclasses.replace(cfg0, remat=True)
    model_r = FastSpeech2(cfg_r)

    state0 = TrainState.create(variables, optim)
    state_r = TrainState.create(variables, optim)
    step0 = jax.jit(make_train_step(model0, cfg0, optim))
    step_r = jax.jit(make_train_step(model_r, cfg_r, optim))
    state0, losses0 = step0(state0, batch, rng)
    state_r, losses_r = step_r(state_r, batch, rng)

    # forward value must be unaffected by remat
    np.testing.assert_allclose(float(losses0.total), float(losses_r.total),
                               rtol=1e-6)
    # grads match up to recompute rounding; Adam's eps division amplifies
    # bitwise noise on near-zero grads, so compare post-step params loosely
    for a, b in zip(jax.tree_util.tree_leaves(state0.params),
                    jax.tree_util.tree_leaves(state_r.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_bf16_mel_transfer_matches_fp32():
    """Shipping mels bf16 over the wire (loop.py transfer.mel_bf16) must
    give a loss close to the fp32 transfer (targets upcast on device)."""
    import ml_dtypes

    cfg = tiny_config(encoder_dropout=0.0, decoder_dropout=0.0,
                      vp_dropout=0.0)
    batch = synthetic_batch(cfg)
    model, variables = _init(cfg, batch)
    optim, _ = make_optimizer(OptimConfig(warm_up_step=100, anneal_steps=()),
                              cfg.encoder_hidden)
    rng = jax.random.PRNGKey(4)
    step_fn = jax.jit(make_train_step(model, cfg, optim))

    state32 = TrainState.create(variables, optim)
    _, losses32 = step_fn(state32, batch, rng)

    batch16 = dict(batch)
    batch16["mels"] = batch["mels"].astype(ml_dtypes.bfloat16)
    state16 = TrainState.create(variables, optim)
    _, losses16 = step_fn(state16, batch16, rng)

    assert np.isfinite(float(losses16.total))
    np.testing.assert_allclose(float(losses16.total),
                               float(losses32.total), rtol=2e-2)


def test_eval_step_finite_and_deterministic():
    cfg = tiny_config()
    batch = synthetic_batch(cfg)
    model, variables = _init(cfg, batch)
    optim, _ = make_optimizer(OptimConfig(), cfg.encoder_hidden)
    state = TrainState.create(variables, optim)
    eval_step = jax.jit(make_eval_step(model, cfg))
    l1 = eval_step(state, batch)
    l2 = eval_step(state, batch)
    assert float(l1.total) == float(l2.total)
    assert np.isfinite(float(l1.total))


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    batch = synthetic_batch(cfg)
    model, variables = _init(cfg, batch)
    optim, _ = make_optimizer(OptimConfig(), cfg.encoder_hidden)
    state = TrainState.create(variables, optim, step=7)
    path = save_checkpoint(str(tmp_path / "ckpt"), state)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), state, 7)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_train_step_dp_tp():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    cfg = tiny_config()
    batch = synthetic_batch(cfg, B=8)
    model, variables = _init(cfg, batch)
    optim, _ = make_optimizer(OptimConfig(warm_up_step=20, anneal_steps=()),
                              cfg.encoder_hidden)

    mesh = make_mesh(data=4, model=2)
    sharded_vars, shardings = shard_variables(variables, mesh)
    state = TrainState.create(sharded_vars, optim)

    from jax.sharding import NamedSharding, PartitionSpec as P
    batch_sharding = NamedSharding(mesh, P("data"))
    device_batch = {
        k: jax.device_put(v, batch_sharding) for k, v in batch.items()
    }

    # pin out_shardings to the input layout (as the training loop does):
    # one executable serves both steps instead of recompiling when the
    # first output's canonicalized shardings feed back in
    replicated = NamedSharding(mesh, P())
    state_sh = jax.tree_util.tree_map(
        lambda x: x.sharding if isinstance(x.sharding, NamedSharding)
        else replicated, state)
    state = jax.device_put(state, state_sh)
    step_fn = jax.jit(make_train_step(model, cfg, optim), donate_argnums=0,
                      out_shardings=(state_sh, replicated))
    rng = jax.random.PRNGKey(0)
    state, losses = step_fn(state, device_batch, rng)
    state, losses = step_fn(state, device_batch, rng)
    assert np.isfinite(float(losses.total))
    # check a TP-sharded param is actually distributed over the model axis
    k = state.params["encoder"]["layer_0"]["slf_attn"]["w_qs"]["Dense_0"]["kernel"]
    assert not k.sharding.is_fully_replicated


def test_partition_specs_cover_fft_blocks():
    cfg = tiny_config()
    batch = synthetic_batch(cfg)
    _, variables = _init(cfg, batch)
    specs = param_partition_spec(variables["params"])
    from jax.sharding import PartitionSpec as P
    qs = specs["encoder"]["layer_0"]["slf_attn"]["w_qs"]["Dense_0"]["kernel"]
    assert qs == P(None, "model")
    w1 = specs["encoder"]["layer_0"]["pos_ffn"]["w_1"]["Conv_0"]["kernel"]
    assert w1 == P(None, None, "model")
    emb = specs["encoder"]["src_word_emb"]["embedding"]
    assert emb == P()


def test_eval_step_excludes_padded_duplicate_rows():
    # Regression (round-1 verdict): partial val batches are padded by
    # repeating the last sample; those rows must not skew the masked means.
    cfg = tiny_config()
    batch = synthetic_batch(cfg, B=3)
    model, variables = _init(cfg, batch)
    optim, _ = make_optimizer(OptimConfig(), cfg.encoder_hidden)
    state = TrainState.create(variables, optim)
    eval_step = jax.jit(make_eval_step(model, cfg))

    # oracle: the 3 true rows on their own
    truth = eval_step(state, {k: v[:3] for k, v in batch.items()})
    # padded batch: last row duplicated twice, valid_count=3
    padded = {
        k: np.concatenate([v, v[2:3], v[2:3]], axis=0)
        for k, v in batch.items()
    }
    biased = eval_step(state, padded)
    masked = eval_step(state, padded, jnp.int32(3))
    for t, m in zip(truth, masked):
        np.testing.assert_allclose(np.asarray(t), np.asarray(m), rtol=1e-5)
    # and the bias was real: unmasked padded batch differs from the oracle
    assert any(
        abs(float(b) - float(t)) > 1e-7 for b, t in zip(biased, truth))


def test_scanned_step_matches_per_step():
    # the device-resident scan path (training/step.py
    # make_scanned_train_step) must reproduce the per-step path exactly:
    # same inner body, rng folded on state.step in-graph
    from fastspeech2_tpu.training.step import make_scanned_train_step

    cfg = tiny_config()
    b0 = synthetic_batch(cfg, B=2, seed=0)
    b1 = synthetic_batch(cfg, B=2, seed=1)
    model, variables = _init(cfg, b0)
    optim, _ = make_optimizer(OptimConfig(warm_up_step=20, anneal_steps=()),
                              cfg.encoder_hidden)
    rng = jax.random.PRNGKey(7)

    ref_state = TrainState.create(variables, optim)
    step_fn = jax.jit(make_train_step(model, cfg, optim))
    ref_losses = []
    for b in (b0, b1, b0):
        ref_state, losses = step_fn(ref_state, b, rng)
        ref_losses.append(float(losses.total))

    stacked = {k: np.stack([b0[k], b1[k]]) for k in b0}
    state = TrainState.create(variables, optim)
    scanned = jax.jit(make_scanned_train_step(model, cfg, optim, 3))
    state, seq = scanned(state, stacked,
                         jnp.asarray([0, 1, 0], jnp.int32), rng)
    assert int(state.step) == 3
    # same batches, same dropout streams -> same losses (float32-close;
    # scan and straight-line fuse differently)
    np.testing.assert_allclose(
        np.asarray(seq.total, np.float64), ref_losses, rtol=1e-6)

    # param equivalence under SGD: with Adam, float-level grad diffs on
    # near-zero-grad params flip mhat/vhat ~ +-1 and amplify to ~2*lr,
    # which is expected, not a scan bug
    import optax

    sgd = optax.sgd(1e-2)
    ref_state = TrainState.create(variables, sgd)
    step_sgd = jax.jit(make_train_step(model, cfg, sgd))
    for b in (b0, b1, b0):
        ref_state, _ = step_sgd(ref_state, b, rng)
    state = TrainState.create(variables, sgd)
    scanned = jax.jit(make_scanned_train_step(model, cfg, sgd, 3))
    state, _ = scanned(state, stacked,
                       jnp.asarray([0, 1, 0], jnp.int32), rng)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
