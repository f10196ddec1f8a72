"""Pallas fused attention: parity with the XLA path (interpret mode on the
CPU test platform) and gradient flow through the custom VJP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastspeech2_tpu.ops.attention import multi_head_attention
from fastspeech2_tpu.ops.pallas_attention import fused_multi_head_attention


def _inputs(B=2, H=2, L=64, D=32, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, H, L, D).astype(np.float32)
    k = rng.randn(B, H, L, D).astype(np.float32)
    v = rng.randn(B, H, L, D).astype(np.float32)
    lens = np.array([L, L // 2] * (B // 2))[:B]
    mask = np.arange(L)[None, :] >= lens[:, None]
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask))


def test_fused_attention_matches_xla():
    q, k, v, mask = _inputs()
    ref = multi_head_attention(q, k, v, mask)
    got = fused_multi_head_attention(q, k, v, mask, True)
    # compare only valid queries (padded rows are zeroed downstream)
    valid = ~np.asarray(mask)
    for b in range(q.shape[0]):
        np.testing.assert_allclose(
            np.asarray(got)[b][:, valid[b]],
            np.asarray(ref)[b][:, valid[b]], atol=1e-5)


def test_fused_attention_bf16():
    q, k, v, mask = _inputs()
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = multi_head_attention(q, k, v, mask)
    got = fused_multi_head_attention(q, k, v, mask, True)
    valid = ~np.asarray(mask)
    for b in range(q.shape[0]):
        np.testing.assert_allclose(
            np.asarray(got, np.float32)[b][:, valid[b]],
            np.asarray(ref, np.float32)[b][:, valid[b]], atol=3e-2)


def test_fused_attention_grad_matches_xla():
    q, k, v, mask = _inputs(L=32, D=16)

    def loss_fused(q, k, v):
        out = fused_multi_head_attention(q, k, v, mask, True)
        return jnp.sum(jnp.where(~mask[:, None, :, None], out, 0.0) ** 2)

    def loss_xla(q, k, v):
        out = multi_head_attention(q, k, v, mask)
        return jnp.sum(jnp.where(~mask[:, None, :, None], out, 0.0) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_attention_partitions_over_mesh():
    """Under a (data, model) mesh with batch and head sharded, the
    custom_partitioning rule must keep the kernel per-shard (no all-gather
    of q/k/v) and produce the same values as the unsharded op."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 simulated devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    q, k, v, mask = _inputs(B=4, H=2, L=32, D=16)
    devices = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devices, ("data", "model"))
    qkv_sh = NamedSharding(mesh, P("data", "model", None, None))
    mask_sh = NamedSharding(mesh, P("data", None))
    qs = jax.device_put(q, qkv_sh)
    ks = jax.device_put(k, qkv_sh)
    vs = jax.device_put(v, qkv_sh)
    ms = jax.device_put(mask, mask_sh)

    f = jax.jit(lambda q, k, v, m: fused_multi_head_attention(q, k, v, m,
                                                              True))
    out_sharded = f(qs, ks, vs, ms)
    # output keeps the batch/head sharding (not gathered to replicated)
    assert not out_sharded.sharding.is_fully_replicated
    ref = fused_multi_head_attention(q, k, v, mask, True)
    np.testing.assert_allclose(np.asarray(out_sharded), np.asarray(ref),
                               atol=1e-6)
    # no all-gather of the operands in the compiled module
    hlo = f.lower(qs, ks, vs, ms).compile().as_text()
    assert "all-gather" not in hlo, "operands were gathered"

    # gradients partition too
    def loss(q, k, v):
        out = fused_multi_head_attention(q, k, v, ms, True)
        return jnp.sum(jnp.where(~ms[:, None, :, None], out, 0.0) ** 2)

    g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs)

    def loss_ref(q, k, v):
        out = fused_multi_head_attention(q, k, v, mask, True)
        return jnp.sum(jnp.where(~mask[:, None, :, None], out, 0.0) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_sh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_model_with_pallas_interpret_backend():
    from fastspeech2_tpu.models import FastSpeech2

    from helpers import tiny_config

    cfg = tiny_config(attention_backend="pallas_interpret")
    model = FastSpeech2(cfg)
    rng = jax.random.PRNGKey(0)
    texts = jnp.ones((2, 8), jnp.int32)
    src_lens = jnp.asarray([8, 6])
    variables = jax.jit(
        model.init, static_argnames=("max_mel_len", "train"))(
        {"params": rng, "dropout": rng},
        jnp.zeros((2,), jnp.int32), texts, src_lens,
        max_mel_len=16, train=False)
    out = model.apply(variables, jnp.zeros((2,), jnp.int32), texts,
                      src_lens, max_mel_len=16, train=False)

    cfg_x = tiny_config(attention_backend="xla")
    out_x = FastSpeech2(cfg_x).apply(
        variables, jnp.zeros((2,), jnp.int32), texts, src_lens,
        max_mel_len=16, train=False)
    np.testing.assert_allclose(np.asarray(out.postnet_mel),
                               np.asarray(out_x.postnet_mel), atol=1e-5)
