"""Masked BatchNorm in the PostNet: training batch statistics must match
torch BatchNorm1d run at exactly max(mel_len) frames (the reference's stat
population, transformer/Layers.py:67-137), even when the static bucket pads
beyond it."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fastspeech2_tpu.models.postnet import _MaskedBatchNorm


def test_masked_bn_matches_torch_at_batch_max():
    rng = np.random.RandomState(0)
    B, T_true, T_bucket, C = 3, 17, 32, 8
    x = rng.randn(B, T_bucket, C).astype(np.float32)
    x[:, T_true:] = 0.123  # junk in the bucket padding; must not leak
    keep = np.zeros((B, T_bucket), bool)
    keep[:, :T_true] = True

    bn = _MaskedBatchNorm(features=C)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        use_running_average=False, keep=jnp.asarray(keep))
    out, mutated = bn.apply(
        variables, jnp.asarray(x), use_running_average=False,
        keep=jnp.asarray(keep), mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm1d(C, eps=1e-5, momentum=0.1)
    tbn.train()
    with torch.no_grad():
        t_out = tbn(torch.from_numpy(x[:, :T_true].transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(out)[:, :T_true],
        t_out.numpy().transpose(0, 2, 1), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), atol=1e-6)
    # torch running_var uses the unbiased batch variance
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]),
        tbn.running_var.numpy(), atol=1e-5)


def test_masked_bn_eval_uses_running_stats():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 4).astype(np.float32)
    bn = _MaskedBatchNorm(features=4)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = bn.apply(variables, jnp.asarray(x), use_running_average=True)
    # running stats are identity-init (mean 0, var 1) -> plain normalize
    np.testing.assert_allclose(
        np.asarray(out), x / np.sqrt(1.0 + 1e-5), atol=1e-6)
