"""Fused conv-FFN Pallas kernel: parity with the XLA path (interpret mode)
and gradient flow via custom VJP."""

import numpy as np

import jax
import jax.numpy as jnp

from fastspeech2_tpu.ops.pallas_ffn import fused_conv_ffn, xla_conv_ffn


def _inputs(B=2, L=24, D=16, H=32, k1=9, k2=1, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(B, L, D), jnp.float32)
    w1 = jnp.asarray(r.randn(k1, D, H) * 0.1, jnp.float32)
    b1 = jnp.asarray(r.randn(H) * 0.1, jnp.float32)
    w2 = jnp.asarray(r.randn(k2, H, D) * 0.1, jnp.float32)
    b2 = jnp.asarray(r.randn(D) * 0.1, jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * r.randn(D), jnp.float32)
    beta = jnp.asarray(0.1 * r.randn(D), jnp.float32)
    return x, w1, b1, w2, b2, g, beta


def test_fused_ffn_matches_xla():
    args = _inputs()
    ref = xla_conv_ffn(*args)
    got = fused_conv_ffn(*args, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_ffn_k3_second_conv():
    args = _inputs(k2=3)
    ref = xla_conv_ffn(*args)
    got = fused_conv_ffn(*args, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_ffn_partitions_over_batch():
    """Batch-sharded x must run the kernel per-shard (no all-gather of the
    activations) and match the unsharded values."""
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 simulated devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.RandomState(0)
    B, L, D, H = 4, 16, 8, 16
    x = jnp.asarray(rng.randn(B, L, D), jnp.float32)
    w1 = jnp.asarray(rng.randn(9, D, H) * 0.1, jnp.float32)
    b1 = jnp.zeros(H, jnp.float32)
    w2 = jnp.asarray(rng.randn(1, H, D) * 0.1, jnp.float32)
    b2 = jnp.zeros(D, jnp.float32)
    g = jnp.ones(D, jnp.float32)
    beta = jnp.zeros(D, jnp.float32)

    ref = fused_conv_ffn(x, w1, b1, w2, b2, g, beta, True)

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    f = jax.jit(lambda *a: fused_conv_ffn(*a, True))
    out = f(xs, w1, b1, w2, b2, g, beta)
    assert not out.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    hlo = f.lower(xs, w1, b1, w2, b2, g, beta).compile().as_text()
    assert "all-gather" not in hlo


def test_fused_ffn_grad_matches_xla():
    args = _inputs(L=16, D=8, H=16)

    g_fused = jax.grad(
        lambda *a: jnp.sum(fused_conv_ffn(*a, True) ** 2),
        argnums=tuple(range(7)))(*args)
    g_xla = jax.grad(
        lambda *a: jnp.sum(xla_conv_ffn(*a) ** 2),
        argnums=tuple(range(7)))(*args)
    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_model_with_pallas_ffn_interpret():
    from fastspeech2_tpu.models import FastSpeech2

    from helpers import tiny_config

    variables_cfg = tiny_config(ffn_backend="xla",
                                attention_backend="xla")
    model_x = FastSpeech2(variables_cfg)
    rng = jax.random.PRNGKey(0)
    texts = jnp.ones((2, 8), jnp.int32)
    src_lens = jnp.asarray([8, 6])
    variables = jax.jit(
        model_x.init, static_argnames=("max_mel_len", "train"))(
        {"params": rng, "dropout": rng},
        jnp.zeros((2,), jnp.int32), texts, src_lens,
        max_mel_len=16, train=False)
    out_x = model_x.apply(variables, jnp.zeros((2,), jnp.int32), texts,
                          src_lens, max_mel_len=16, train=False)

    model_p = FastSpeech2(tiny_config(ffn_backend="pallas_interpret",
                                      attention_backend="xla"))
    out_p = model_p.apply(variables, jnp.zeros((2,), jnp.int32), texts,
                          src_lens, max_mel_len=16, train=False)
    np.testing.assert_allclose(np.asarray(out_p.postnet_mel),
                               np.asarray(out_x.postnet_mel), atol=1e-5)


def test_xla_ffn_tp_parity_hidden_sharded():
    """Round-1 verdict #6: under tensor parallelism the FFN takes the XLA
    path (measured at ~230/167 TF/s fwd/bwd on-chip — docs/tpu_notes.md —
    so a fused TP kernel has nothing to win).  Pin that hidden-dim
    sharding produces identical values to the unsharded reference and
    that the partial products are combined with a collective rather than
    an activations all-gather."""
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 simulated devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.RandomState(0)
    B, L, D, H = 2, 16, 8, 32
    x = jnp.asarray(rng.randn(B, L, D), jnp.float32)
    w1 = jnp.asarray(rng.randn(9, D, H) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(1, H, D) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(D) * 0.1, jnp.float32)
    g = jnp.ones(D, jnp.float32)
    beta = jnp.zeros(D, jnp.float32)

    ref = xla_conv_ffn(x, w1, b1, w2, b2, g, beta)

    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    w1s = jax.device_put(w1, NamedSharding(mesh, P(None, None, "model")))
    b1s = jax.device_put(b1, NamedSharding(mesh, P("model")))
    w2s = jax.device_put(w2, NamedSharding(mesh, P(None, "model", None)))
    f = jax.jit(xla_conv_ffn)
    out = f(x, w1s, b1s, w2s, b2, g, beta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    hlo = f.lower(x, w1s, b1s, w2s, b2, g, beta).compile().as_text()
    assert ("all-reduce" in hlo) or ("reduce-scatter" in hlo), (
        "expected a partial-sum collective in the TP-sharded FFN")
