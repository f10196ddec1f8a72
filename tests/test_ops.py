"""Unit tests for core ops: masks, length regulator, PE, bucketize."""

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.ops import (
    length_regulate,
    masked_mean,
    pad_mask_from_lengths,
    sinusoid_position_encoding,
)


def test_pad_mask():
    m = pad_mask_from_lengths(jnp.array([3, 1]), 4)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[False, False, False, True], [False, True, True, True]],
    )


def _numpy_length_regulate(x, durations, max_len):
    """Oracle mirroring the reference Python-loop expansion
    (model/modules.py:182-190): repeat each phone vector d_i times."""
    B, P, D = x.shape
    out = np.zeros((B, max_len, D), dtype=x.dtype)
    lens = []
    for b in range(B):
        rows = []
        for p in range(P):
            rows.extend([x[b, p]] * int(durations[b, p]))
        lens.append(min(len(rows), max_len))
        for t in range(min(len(rows), max_len)):
            out[b, t] = rows[t]
    return out, np.array(lens)


def test_length_regulator_matches_loop_oracle():
    rng = np.random.RandomState(0)
    B, P, D, T = 3, 7, 5, 30
    x = rng.randn(B, P, D).astype(np.float32)
    durations = rng.randint(0, 5, size=(B, P))
    ref, ref_len = _numpy_length_regulate(x, durations, T)
    got, got_len = length_regulate(jnp.asarray(x), jnp.asarray(durations), T)
    got = np.asarray(got)
    got_len = np.asarray(got_len)
    np.testing.assert_array_equal(got_len, ref_len)
    for b in range(B):
        np.testing.assert_allclose(got[b, : got_len[b]], ref[b, : ref_len[b]])


def test_length_regulator_zero_durations():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
    d = jnp.array([[2, 0, 1, 0]])
    out, mel_len = length_regulate(x, d, 5)
    assert int(mel_len[0]) == 3
    np.testing.assert_allclose(np.asarray(out)[0, :3],
                               np.asarray(x)[0, [0, 0, 2]])


def test_length_regulator_truncates_to_max():
    x = jnp.ones((1, 3, 2))
    d = jnp.array([[10, 10, 10]])
    out, mel_len = length_regulate(x, d, 8)
    assert out.shape == (1, 8, 2)
    assert int(mel_len[0]) == 8


def test_length_regulator_gradients_accumulate():
    x = jnp.ones((1, 3, 2))
    d = jnp.array([[2, 1, 0]])

    def f(x):
        out, _ = length_regulate(x, d, 4)
        return out.sum()

    g = jax.grad(f)(x)
    # phone 0 used twice, phone 1 once, phone 2 zero times... but frame 3
    # (past total duration) clamps to the LAST phone index present; with
    # idx clamp to P-1 the pad frame gathers phone 2.
    np.testing.assert_allclose(np.asarray(g)[0, :, 0], [2.0, 1.0, 1.0])


def test_sinusoid_matches_reference_formula():
    n, d = 13, 8
    table = np.asarray(sinusoid_position_encoding(n, d))
    # independent oracle: reference transformer/Models.py:10-30 formula
    expect = np.zeros((n, d))
    for pos in range(n):
        for j in range(d):
            angle = pos / np.power(10000, 2 * (j // 2) / d)
            expect[pos, j] = np.sin(angle) if j % 2 == 0 else np.cos(angle)
    np.testing.assert_allclose(table, expect, atol=1e-6)


def test_masked_mean_equals_select_mean():
    rng = np.random.RandomState(1)
    v = rng.randn(4, 6).astype(np.float32)
    keep = rng.rand(4, 6) > 0.5
    expect = v[keep].mean()
    got = float(masked_mean(jnp.asarray(v), jnp.asarray(keep)))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_searchsorted_matches_torch_bucketize():
    import torch

    bins = np.linspace(-2.0, 9.0, 255).astype(np.float32)
    vals = np.random.RandomState(2).uniform(-4, 12, size=(64,)).astype(np.float32)
    torch_ids = torch.bucketize(torch.from_numpy(vals), torch.from_numpy(bins))
    jax_ids = jnp.searchsorted(jnp.asarray(bins), jnp.asarray(vals), side="left")
    np.testing.assert_array_equal(np.asarray(jax_ids), torch_ids.numpy())
