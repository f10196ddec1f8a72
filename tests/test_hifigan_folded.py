"""Folded (space-to-depth) HiFi-GAN parity with the canonical generator."""

import numpy as np

import jax
import jax.numpy as jnp

from fastspeech2_tpu.models.hifigan import HiFiGANGenerator
from fastspeech2_tpu.models.hifigan_folded import (
    FoldedHiFiGAN,
    fold_conv1d_weights,
)


def test_fold_conv_weights_identity():
    rng = np.random.RandomState(0)
    W = rng.randn(7, 8, 8).astype(np.float32)
    x = rng.randn(2, 32, 8).astype(np.float32)
    d, F = 3, 4
    pad = d * 3
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(W), (1,), [(pad, pad)],
        rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"))
    Wp, lo, hi = fold_conv1d_weights(W, d, F)
    xf = x.reshape(2, 8, F * 8)
    got = jax.lax.conv_general_dilated(
        jnp.asarray(xf), jnp.asarray(Wp), (1,), [(lo, hi)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    np.testing.assert_allclose(
        np.asarray(got).reshape(2, 32, 8), np.asarray(ref), atol=1e-5)


def test_folded_generator_matches_plain():
    cfg = dict(upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
               upsample_initial_channel=64, resblock_kernel_sizes=(3, 7),
               resblock_dilation_sizes=((1, 3), (1, 3)))
    gen = HiFiGANGenerator(n_mel_channels=16, dtype=jnp.float32, **cfg)
    mel = jnp.asarray(
        np.random.RandomState(0).randn(2, 24, 16), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel)
    ref = np.asarray(gen.apply(params, mel))
    folded = FoldedHiFiGAN(params, config=cfg, min_lanes=64,
                           fold_below=1000, dtype=jnp.float32)
    got = np.asarray(folded(mel))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_folded_generator_no_folding_needed():
    """min_lanes below every channel count -> no stage folds; still exact."""
    cfg = dict(upsample_rates=(2,), upsample_kernel_sizes=(4,),
               upsample_initial_channel=32, resblock_kernel_sizes=(3,),
               resblock_dilation_sizes=((1, 3),))
    gen = HiFiGANGenerator(n_mel_channels=8, dtype=jnp.float32, **cfg)
    mel = jnp.asarray(np.random.RandomState(1).randn(1, 16, 8), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel)
    folded = FoldedHiFiGAN(params, config=cfg, min_lanes=1, fold_below=0,
                           dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(folded(mel)), np.asarray(gen.apply(params, mel)),
        atol=1e-5)
