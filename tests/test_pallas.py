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


def test_model_with_pallas_interpret_backend():
    from fastspeech2_tpu.models import FastSpeech2

    from helpers import tiny_config

    cfg = tiny_config(attention_backend="pallas_interpret")
    model = FastSpeech2(cfg)
    rng = jax.random.PRNGKey(0)
    texts = jnp.ones((2, 8), jnp.int32)
    src_lens = jnp.asarray([8, 6])
    variables = model.init(
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
