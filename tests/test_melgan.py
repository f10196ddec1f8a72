"""MelGAN generator parity against a torch oracle built to the descript
melgan-neurips architecture (the reference's torch.hub vocoder,
utils/model.py:46-56)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _torch_melgan(n_mels, ngf, rates, n_res):
    """Oracle generator: descript MelGAN layout as one nn.Sequential."""
    import torch.nn as tnn
    from torch.nn.utils import weight_norm

    class ResnetBlock(tnn.Module):
        def __init__(self, dim, dilation):
            super().__init__()
            self.block = tnn.Sequential(
                tnn.LeakyReLU(0.2),
                tnn.ReflectionPad1d(dilation),
                weight_norm(tnn.Conv1d(dim, dim, 3, dilation=dilation)),
                tnn.LeakyReLU(0.2),
                weight_norm(tnn.Conv1d(dim, dim, 1)),
            )
            self.shortcut = weight_norm(tnn.Conv1d(dim, dim, 1))

        def forward(self, x):
            return self.shortcut(x) + self.block(x)

    mult = int(2 ** len(rates))
    model = [
        tnn.ReflectionPad1d(3),
        weight_norm(tnn.Conv1d(n_mels, mult * ngf, 7, padding=0)),
    ]
    for r in rates:
        model += [
            tnn.LeakyReLU(0.2),
            weight_norm(tnn.ConvTranspose1d(
                mult * ngf, mult * ngf // 2, 2 * r, stride=r,
                padding=r // 2 + r % 2, output_padding=r % 2)),
        ]
        for j in range(n_res):
            model += [ResnetBlock(mult * ngf // 2, dilation=3 ** j)]
        mult //= 2
    model += [
        tnn.LeakyReLU(0.2),
        tnn.ReflectionPad1d(3),
        weight_norm(tnn.Conv1d(ngf, 1, 7, padding=0)),
        tnn.Tanh(),
    ]

    class Gen(tnn.Module):
        def __init__(self):
            super().__init__()
            self.model = tnn.Sequential(*model)

        def forward(self, x):
            return self.model(x)

    return Gen()


def test_melgan_parity():
    from fastspeech2_tpu.convert.from_torch import melgan_params_from_torch
    from fastspeech2_tpu.models.melgan import MelGANGenerator

    n_mels, ngf, rates, n_res = 16, 8, (4, 2), 3
    torch.manual_seed(0)
    tgen = _torch_melgan(n_mels, ngf, rates, n_res).eval()

    fgen = MelGANGenerator(upsample_rates=rates, ngf=ngf,
                           n_residual_layers=n_res, n_mel_channels=n_mels)
    params = jax.tree_util.tree_map(
        jnp.asarray,
        melgan_params_from_torch(tgen.state_dict(), n_stages=len(rates),
                                 n_residual_layers=n_res))

    mel = np.random.RandomState(0).randn(2, 11, n_mels).astype(np.float32)
    with torch.no_grad():
        t_wav = tgen(torch.from_numpy(mel).transpose(1, 2))[:, 0, :].numpy()
    f_wav = np.asarray(fgen.apply(params, jnp.asarray(mel)))
    assert f_wav.shape == t_wav.shape == (2, 11 * 4 * 2)
    np.testing.assert_allclose(f_wav, t_wav, atol=2e-5)
