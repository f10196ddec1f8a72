"""Deeper multi-chip correctness on the simulated 8-device CPU mesh.

Round-1 verdict item 4: beyond the basic dp×tp train step
(test_train.py::test_sharded_train_step_dp_tp), pin down

- resume-equivalence under sharding: train k steps → checkpoint →
  restore into a sharded abstract state → continued losses bit-match an
  uninterrupted run (supersedes the reference's torch.save/load resume,
  /root/reference/utils/model.py:15-30, which has no sharding to get
  wrong);
- gradient accumulation composed with dp×tp: the micro-batched scan
  (training/step.py) must produce the same numbers sharded as unsharded;
- the inference dispatch (the jitted forward serving/synthesize use)
  under a data-parallel mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fastspeech2_tpu.configs.config import OptimConfig
from fastspeech2_tpu.models import FastSpeech2
from fastspeech2_tpu.parallel import make_mesh, shard_variables
from fastspeech2_tpu.training import (
    TrainState,
    make_optimizer,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)

from helpers import init_variables, synthetic_batch, tiny_config

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices")


def _sharded_state(cfg, batch, mesh, warm_up=20):
    model = FastSpeech2(cfg)
    variables = init_variables(model, batch, seed=0)
    optim, _ = make_optimizer(
        OptimConfig(warm_up_step=warm_up, anneal_steps=()),
        cfg.encoder_hidden)
    sharded_vars, _ = shard_variables(variables, mesh)
    state = TrainState.create(sharded_vars, optim)
    replicated = NamedSharding(mesh, P())
    state_sh = jax.tree_util.tree_map(
        lambda x: x.sharding if isinstance(x.sharding, NamedSharding)
        else replicated, state)
    state = jax.device_put(state, state_sh)
    return model, optim, state, state_sh, replicated


def _device_batch(batch, mesh, spec=("data",)):
    sh = NamedSharding(mesh, P(*spec))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def test_sharded_resume_equivalence(tmp_path):
    """k steps → save → restore (sharded) → losses bit-match continuation."""
    cfg = tiny_config()
    batch = synthetic_batch(cfg, B=8)
    mesh = make_mesh(data=4, model=2)
    model, optim, state, state_sh, replicated = _sharded_state(
        cfg, batch, mesh)
    device_batch = _device_batch(batch, mesh)
    step_fn = jax.jit(make_train_step(model, cfg, optim),
                      out_shardings=(state_sh, replicated))
    rng = jax.random.PRNGKey(3)

    for _ in range(2):
        state, _ = step_fn(state, device_batch, rng)
    save_checkpoint(str(tmp_path / "ckpt"), state, step=2)

    # uninterrupted continuation: 2 more steps
    cont_losses = []
    cont = state
    for _ in range(2):
        cont, losses = step_fn(cont, device_batch, rng)
        cont_losses.append(float(losses.total))

    # restore into the SHARDED layout via ShapeDtypeStructs + shardings
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=x.sharding), state)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), abstract, 2)
    assert int(restored.step) == 2
    k = restored.params["encoder"]["layer_0"]["slf_attn"]["w_qs"][
        "Dense_0"]["kernel"]
    assert not k.sharding.is_fully_replicated  # tp layout survived restore

    res_losses = []
    for _ in range(2):
        restored, losses = step_fn(restored, device_batch, rng)
        res_losses.append(float(losses.total))

    # same executable, bit-identical state → bit-identical losses
    assert res_losses == cont_losses, (res_losses, cont_losses)


def test_grad_acc_composes_with_dp_tp():
    """grad_acc=2 micro-batch scan sharded over dp×tp matches unsharded."""
    cfg = tiny_config()
    acc, B = 2, 8
    flat = synthetic_batch(cfg, B=B)
    micro = {k: v.reshape((acc, B // acc) + v.shape[1:])
             for k, v in flat.items()}

    model = FastSpeech2(cfg)
    variables = init_variables(model, flat, seed=0)
    optim, _ = make_optimizer(OptimConfig(warm_up_step=20, anneal_steps=()),
                              cfg.encoder_hidden)
    rng = jax.random.PRNGKey(5)
    step = make_train_step(model, cfg, optim, grad_acc_step=acc)

    # unsharded oracle
    ref_state = TrainState.create(variables, optim)
    ref_state, ref_losses = jax.jit(step)(ref_state, micro, rng)

    # dp×tp sharded: micro axis replicated, batch axis data-sharded
    mesh = make_mesh(data=4, model=2)
    sharded_vars, _ = shard_variables(variables, mesh)
    state = TrainState.create(sharded_vars, optim)
    replicated = NamedSharding(mesh, P())
    state_sh = jax.tree_util.tree_map(
        lambda x: x.sharding if isinstance(x.sharding, NamedSharding)
        else replicated, state)
    state = jax.device_put(state, state_sh)
    device_batch = _device_batch(micro, mesh, spec=(None, "data"))
    step_fn = jax.jit(step, out_shardings=(state_sh, replicated))
    state, losses = step_fn(state, device_batch, rng)
    state, losses2 = step_fn(state, device_batch, rng)

    assert int(state.step) == 2
    np.testing.assert_allclose(
        float(losses.total), float(ref_losses.total), rtol=2e-5)
    assert np.isfinite(float(losses2.total))
    k = state.params["encoder"]["layer_0"]["slf_attn"]["w_qs"]["Dense_0"][
        "kernel"]
    assert not k.sharding.is_fully_replicated


def test_inference_forward_under_dp_mesh():
    """The serving/synthesize jitted forward runs data-parallel and its
    outputs match the single-device forward."""
    cfg = tiny_config()
    batch = synthetic_batch(cfg, B=8)
    model = FastSpeech2(cfg)
    variables = init_variables(model, batch, seed=0)
    T = int(batch["mels"].shape[1])

    def forward(variables, speakers, texts, src_lens):
        out = model.apply(variables, speakers, texts, src_lens,
                          max_mel_len=T, train=False)
        return out.postnet_mel, out.mel_len

    speakers = jnp.asarray(batch["speakers"])
    texts = jnp.asarray(batch["texts"])
    src_lens = jnp.asarray(batch["src_lens"])
    ref_mel, ref_len = jax.jit(forward)(variables, speakers, texts, src_lens)

    mesh = make_mesh(data=8, model=1)
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    d_vars = jax.device_put(variables, repl)
    mel, mel_len = jax.jit(forward)(
        d_vars, jax.device_put(speakers, data_sh),
        jax.device_put(texts, data_sh), jax.device_put(src_lens, data_sh))
    # outputs stay batch-sharded: no hidden all-gather of activations
    assert not mel.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(mel), np.asarray(ref_mel),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(mel_len), np.asarray(ref_len))


def test_synthesizer_mesh_dp_equivalence():
    """Synthesizer(mesh=...) — the serving-facing dp path: batches shard
    over the data axis, params replicate, wavs match the unsharded
    Synthesizer byte-for-byte (supersedes reference synthesize.py:19
    single-GPU inference)."""
    from fastspeech2_tpu.synthesis import HiFiGANVocoder, Synthesizer

    cfg = tiny_config()
    model = FastSpeech2(cfg)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        model.init, static_argnames=("max_mel_len", "train"))(
        {"params": rng, "dropout": rng},
        jnp.zeros((1,), jnp.int32), jnp.ones((1, 8), jnp.int32),
        jnp.asarray([8]), max_mel_len=16, train=False)
    vocoder = HiFiGANVocoder(config={
        "upsample_rates": [4, 4], "upsample_kernel_sizes": [8, 8],
        "upsample_initial_channel": 32, "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
        "num_mels": cfg.n_mel_channels})
    preprocess_config = {
        "path": {"preprocessed_path": "/nonexistent",
                 "lexicon_path": "/nonexistent"},
        "preprocessing": {
            "text": {"text_cleaners": ["english_cleaners"],
                     "language": "en"},
            "audio": {"sampling_rate": 22050, "max_wav_value": 32768.0},
            "stft": {"hop_length": 16},
            "pitch": {"feature": "phoneme_level"},
            "energy": {"feature": "phoneme_level"},
            "mel": {"n_mel_channels": cfg.n_mel_channels},
        },
    }
    texts = ["hello world", "how are you", "fine thanks"]
    base = Synthesizer(model, variables, cfg, preprocess_config,
                       vocoder=vocoder, max_mel_len=64)
    ref_wavs, ref_out = base.synthesize(texts)

    mesh = make_mesh(data=8, model=1)
    dp = Synthesizer(model, variables, cfg, preprocess_config,
                     vocoder=vocoder, max_mel_len=64, mesh=mesh)
    wavs, out = dp.synthesize(texts)
    # batch bucket rounded up to the mesh axis (3 -> 8), real rows match
    assert len(wavs) == len(texts)
    for w_ref, w in zip(ref_wavs, wavs):
        np.testing.assert_array_equal(w_ref, w)
    np.testing.assert_array_equal(np.asarray(out.mel_len)[:3],
                                  np.asarray(ref_out.mel_len)[:3])
