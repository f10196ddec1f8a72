"""HiFi-GAN generator parity with the vendored reference implementation."""

import json
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def pair(reference_root):
    sys.path.insert(0, reference_root)
    import hifigan

    with open(f"{reference_root}/hifigan/config.json") as f:
        h = hifigan.AttrDict(json.load(f))
    torch.manual_seed(0)
    gen = hifigan.Generator(h)
    gen.eval()
    gen.remove_weight_norm()

    from fastspeech2_tpu.convert.from_torch import hifigan_params_from_torch
    from fastspeech2_tpu.models.hifigan import HiFiGANGenerator

    params = jax.tree_util.tree_map(
        jnp.asarray, hifigan_params_from_torch(gen.state_dict()))
    yield gen, HiFiGANGenerator(), params
    sys.path.remove(reference_root)


def test_waveform_parity(pair):
    gen, fgen, params = pair
    mel = np.random.RandomState(0).randn(2, 17, 80).astype(np.float32)
    with torch.no_grad():
        t_wav = gen(torch.from_numpy(mel).transpose(1, 2))[:, 0, :].numpy()
    f_wav = np.asarray(fgen.apply(params, jnp.asarray(mel)))
    assert f_wav.shape == t_wav.shape
    # 256x total upsampling: hop_length parity (utils/model.py:88-91)
    assert f_wav.shape[1] == mel.shape[1] * 256
    np.testing.assert_allclose(f_wav, t_wav, atol=2e-5)


def test_weight_norm_folding(reference_root, pair):
    """Converting a still-weight-normed checkpoint must equal the folded one."""
    sys.path.insert(0, reference_root)
    import hifigan

    with open(f"{reference_root}/hifigan/config.json") as f:
        h = hifigan.AttrDict(json.load(f))
    torch.manual_seed(0)
    gen_wn = hifigan.Generator(h)  # same seed, weight norm NOT removed
    gen_wn.eval()

    from fastspeech2_tpu.convert.from_torch import hifigan_params_from_torch

    _, _, folded = pair
    from_wn = jax.tree_util.tree_map(
        jnp.asarray, hifigan_params_from_torch(gen_wn.state_dict()))
    for a, b in zip(jax.tree_util.tree_leaves(folded),
                    jax.tree_util.tree_leaves(from_wn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
