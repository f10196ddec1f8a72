"""Checkpoint interop: export to the reference .pth.tar format and verify
the upstream PyTorch model loads it and produces our outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_roundtrip_identity(reference_root):
    """from_torch(to_torch(params)) == params."""
    from fastspeech2_tpu.configs.config import FastSpeech2Config
    from fastspeech2_tpu.convert.from_torch import (
        fastspeech2_variables_from_torch,
    )
    from fastspeech2_tpu.convert.to_torch import (
        fastspeech2_state_dict_to_torch,
    )
    from fastspeech2_tpu.models import FastSpeech2

    cfg = FastSpeech2Config(
        encoder_layer=1, decoder_layer=1, encoder_hidden=16,
        decoder_hidden=16, conv_filter_size=32, vp_filter_size=16,
        n_bins=8, postnet_embedding_dim=8, postnet_n_convolutions=3,
        n_mel_channels=4, pitch_min=-1, pitch_max=1, energy_min=-1,
        energy_max=1, attention_backend="xla", ffn_backend="xla")
    model = FastSpeech2(cfg)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        model.init, static_argnames=("max_mel_len", "train"))(
        {"params": rng, "dropout": rng},
        jnp.zeros((1,), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.asarray([4]), max_mel_len=8, train=False)
    variables = jax.device_get(variables)

    sd = fastspeech2_state_dict_to_torch(variables, cfg)
    back = fastspeech2_variables_from_torch(sd, cfg)

    flat_a, _ = jax.tree_util.tree_flatten_with_path(variables["params"])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back["params"])[0])
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(dict(flat_b)[path]), atol=1e-6,
            err_msg=str(path))


def test_exported_checkpoint_runs_in_reference(reference_root, tmp_path):
    """The upstream torch model must accept our exported state dict with
    strict=True and reproduce our outputs."""
    import sys
    import types

    for name, attrs in [("unidecode", {"unidecode": lambda s: s}),
                        ("inflect", {"engine": lambda: None})]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
    sys.path.insert(0, reference_root)
    try:
        import model as ref_model
        import yaml

        with open(f"{reference_root}/config/LJSpeech/preprocess.yaml") as f:
            preprocess = yaml.safe_load(f)
        with open(f"{reference_root}/config/LJSpeech/model.yaml") as f:
            model_cfg = yaml.safe_load(f)
        preprocess["path"]["preprocessed_path"] = (
            f"{reference_root}/preprocessed_data/LJSpeech")

        from fastspeech2_tpu.configs.config import FastSpeech2Config
        from fastspeech2_tpu.convert.to_torch import (
            fastspeech2_state_dict_to_torch,
        )
        from fastspeech2_tpu.models import FastSpeech2

        cfg = FastSpeech2Config.build(preprocess, model_cfg)
        fmodel = FastSpeech2(cfg)
        rng = jax.random.PRNGKey(42)
        variables = jax.jit(
            fmodel.init, static_argnames=("max_mel_len", "train"))(
            {"params": rng, "dropout": rng},
            jnp.zeros((1,), jnp.int32), jnp.ones((1, 8), jnp.int32),
            jnp.asarray([8]), max_mel_len=16, train=False)
        variables = jax.device_get(variables)

        sd = fastspeech2_state_dict_to_torch(variables, cfg)
        tmodel = ref_model.FastSpeech2(preprocess, model_cfg)
        tmodel.load_state_dict(sd, strict=True)
        tmodel.eval()

        rngnp = np.random.RandomState(0)
        B, P = 2, 10
        texts = rngnp.randint(1, 360, size=(B, P)).astype(np.int64)
        src_lens = np.array([P, P - 3])
        for b, l in enumerate(src_lens):
            texts[b, l:] = 0
        durations = rngnp.randint(1, 4, size=(B, P)).astype(np.int64)
        for b, l in enumerate(src_lens):
            durations[b, l:] = 0
        mel_lens = durations.sum(1)
        T = int(mel_lens.max())
        pitch = rngnp.uniform(-2, 8, size=(B, P)).astype(np.float32)
        energy = rngnp.uniform(-1, 7, size=(B, P)).astype(np.float32)
        speakers = np.zeros(B, np.int64)

        with torch.no_grad():
            t_out = tmodel(
                torch.from_numpy(speakers), torch.from_numpy(texts),
                torch.from_numpy(src_lens), P, mels=None,
                mel_lens=torch.from_numpy(mel_lens), max_mel_len=T,
                p_targets=torch.from_numpy(pitch),
                e_targets=torch.from_numpy(energy),
                d_targets=torch.from_numpy(durations))
        f_out = fmodel.apply(
            variables, jnp.asarray(speakers), jnp.asarray(texts),
            jnp.asarray(src_lens), mel_lens=jnp.asarray(mel_lens),
            max_mel_len=T, p_targets=jnp.asarray(pitch),
            e_targets=jnp.asarray(energy),
            d_targets=jnp.asarray(durations), train=False)
        np.testing.assert_allclose(
            np.asarray(f_out.postnet_mel), t_out[1].numpy(), atol=2e-4,
            rtol=1e-4)
    finally:
        sys.path.remove(reference_root)


def test_hifigan_generator_torch_roundtrip():
    """flax gen params -> reference state_dict -> flax: identical, and
    the exported layout matches what hifigan_params_from_torch (and the
    reference's post-remove_weight_norm load) expects."""
    import jax.numpy as jnp

    from fastspeech2_tpu.convert.from_torch import hifigan_params_from_torch
    from fastspeech2_tpu.convert.to_torch import hifigan_state_dict_to_torch
    from fastspeech2_tpu.models.hifigan import HiFiGANGenerator

    gen = HiFiGANGenerator(upsample_rates=(8, 4),
                           upsample_kernel_sizes=(16, 8),
                           upsample_initial_channel=32,
                           resblock_kernel_sizes=(3, 7),
                           resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)))
    params = jax.jit(gen.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, 80)))
    sd = hifigan_state_dict_to_torch(params, (8, 4), 2)
    assert "resblocks.3.convs2.2.weight" in sd        # last block, plain keys
    back = hifigan_params_from_torch(sd, (8, 4), 2)
    flat_a = dict(jax.tree_util.tree_flatten_with_path(
        params["params"])[0])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(
        back["params"])[0])
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_a[k]),
                                   np.asarray(flat_b[k]), atol=1e-6)
