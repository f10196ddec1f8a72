"""Numerical parity: our Flax model vs the actual reference PyTorch model.

Imports the reference modules from /root/reference (stubbing its unavailable
text-frontend deps), copies randomly initialized torch weights into our Flax
tree via the converter, and checks forward outputs agree to float32
tolerance in eval mode — the strongest possible check that architecture,
initial layout, and converter all match.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref(reference_root):
    # Stub deps the reference text package imports at module scope.
    if "unidecode" not in sys.modules:
        stub = types.ModuleType("unidecode")
        stub.unidecode = lambda s: s
        sys.modules["unidecode"] = stub
    if "inflect" not in sys.modules:
        stub = types.ModuleType("inflect")
        stub.engine = lambda: None
        sys.modules["inflect"] = stub
    sys.path.insert(0, reference_root)
    import model as ref_model  # noqa: F401
    import transformer as ref_transformer  # noqa: F401

    yield types.SimpleNamespace(model=ref_model, transformer=ref_transformer,
                                root=reference_root)
    sys.path.remove(reference_root)


def _ljspeech_configs(root):
    import yaml

    with open(f"{root}/config/LJSpeech/preprocess.yaml") as f:
        preprocess = yaml.safe_load(f)
    with open(f"{root}/config/LJSpeech/model.yaml") as f:
        model = yaml.safe_load(f)
    # point stats at the shipped preprocessed_data
    preprocess["path"]["preprocessed_path"] = (
        f"{root}/preprocessed_data/LJSpeech"
    )
    return preprocess, model


@pytest.fixture(scope="module")
def parity_pair(ref):
    """(torch_model, flax_model, flax_variables, config) with shared weights."""
    from fastspeech2_tpu.configs.config import FastSpeech2Config
    from fastspeech2_tpu.convert.from_torch import (
        fastspeech2_variables_from_torch,
    )
    from fastspeech2_tpu.models import FastSpeech2

    preprocess, model_cfg = _ljspeech_configs(ref.root)
    torch.manual_seed(0)
    tmodel = ref.model.FastSpeech2(preprocess, model_cfg).eval()

    cfg = FastSpeech2Config.build(preprocess, model_cfg)
    fmodel = FastSpeech2(cfg)
    variables = fastspeech2_variables_from_torch(tmodel.state_dict(), cfg)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    return tmodel, fmodel, variables, cfg


def _batch(seed=0, B=2, P=12):
    rng = np.random.RandomState(seed)
    texts = rng.randint(1, 360, size=(B, P)).astype(np.int64)
    src_lens = np.array([P, P - 4])
    for b, l in enumerate(src_lens):
        texts[b, l:] = 0
    durations = rng.randint(1, 5, size=(B, P)).astype(np.int64)
    durations[0, src_lens[0]:] = 0
    durations[1, src_lens[1]:] = 0
    mel_lens = durations.sum(1)
    T = int(mel_lens.max())
    pitch = rng.uniform(-2.0, 8.0, size=(B, P)).astype(np.float32)
    energy = rng.uniform(-1.0, 7.0, size=(B, P)).astype(np.float32)
    speakers = np.zeros((B,), dtype=np.int64)
    return speakers, texts, src_lens, durations, mel_lens, T, pitch, energy


def test_forward_parity_teacher_forced(parity_pair):
    tmodel, fmodel, variables, cfg = parity_pair
    speakers, texts, src_lens, durations, mel_lens, T, pitch, energy = _batch()

    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(speakers),
            torch.from_numpy(texts),
            torch.from_numpy(src_lens),
            int(src_lens.max()),
            mels=None,
            mel_lens=torch.from_numpy(mel_lens),
            max_mel_len=T,
            p_targets=torch.from_numpy(pitch),
            e_targets=torch.from_numpy(energy),
            d_targets=torch.from_numpy(durations),
        )

    f_out = fmodel.apply(
        variables,
        jnp.asarray(speakers),
        jnp.asarray(texts),
        jnp.asarray(src_lens),
        mel_lens=jnp.asarray(mel_lens),
        max_mel_len=T,
        p_targets=jnp.asarray(pitch),
        e_targets=jnp.asarray(energy),
        d_targets=jnp.asarray(durations),
        train=False,
    )

    np.testing.assert_allclose(
        np.asarray(f_out.mel), t_out[0].numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(f_out.postnet_mel), t_out[1].numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(f_out.pitch_prediction), t_out[2].numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(f_out.energy_prediction), t_out[3].numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(f_out.log_duration_prediction), t_out[4].numpy(), atol=1e-4)


def test_forward_parity_inference(parity_pair):
    tmodel, fmodel, variables, cfg = parity_pair
    speakers, texts, src_lens, _, _, _, _, _ = _batch(seed=3)
    T = 200

    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(speakers),
            torch.from_numpy(texts),
            torch.from_numpy(src_lens),
            int(src_lens.max()),
        )

    f_out = fmodel.apply(
        variables,
        jnp.asarray(speakers),
        jnp.asarray(texts),
        jnp.asarray(src_lens),
        max_mel_len=T,
        train=False,
    )

    t_durations = t_out[5].numpy()
    f_durations = np.asarray(f_out.duration_rounded)
    np.testing.assert_array_equal(f_durations[:, : t_durations.shape[1]],
                                  t_durations)
    t_mel_len = t_out[9].numpy()
    f_mel_len = np.asarray(f_out.mel_len)
    np.testing.assert_array_equal(f_mel_len, t_mel_len)
    # compare mels over valid frames
    t_mel = t_out[1].numpy()
    f_mel = np.asarray(f_out.postnet_mel)
    for b in range(t_mel.shape[0]):
        L = int(t_mel_len[b])
        np.testing.assert_allclose(f_mel[b, :L], t_mel[b, :L],
                                   atol=2e-4, rtol=1e-4)


def test_control_ratios_change_output(parity_pair):
    """d/p/e control ratios must all have an effect (the reference's
    e_control is dead — SURVEY.md bug #1 — ours is fixed)."""
    _, fmodel, variables, cfg = parity_pair
    speakers, texts, src_lens, _, _, _, _, _ = _batch(seed=5)
    T = 300

    def run(**kw):
        return fmodel.apply(
            variables, jnp.asarray(speakers), jnp.asarray(texts),
            jnp.asarray(src_lens), max_mel_len=T, train=False, **kw)

    base = run()
    slow = run(d_control=1.5)
    assert int(slow.mel_len.sum()) > int(base.mel_len.sum())
    hi_pitch = run(p_control=1.2)
    assert not np.allclose(np.asarray(hi_pitch.postnet_mel),
                           np.asarray(base.postnet_mel))
    hi_energy = run(e_control=1.2)
    assert not np.allclose(np.asarray(hi_energy.postnet_mel),
                           np.asarray(base.postnet_mel))


def test_loss_parity(parity_pair):
    """Our static-shape masked losses equal the reference's masked_select
    losses on identical outputs (model/loss.py:5-92)."""
    tmodel, fmodel, variables, cfg = parity_pair
    speakers, texts, src_lens, durations, mel_lens, T, pitch, energy = (
        _batch(seed=7))
    rng = np.random.RandomState(7)
    mels = rng.randn(len(speakers), T, 80).astype(np.float32)
    for b, L in enumerate(mel_lens):
        mels[b, L:] = 0.0

    f_out = fmodel.apply(
        variables, jnp.asarray(speakers), jnp.asarray(texts),
        jnp.asarray(src_lens), mel_lens=jnp.asarray(mel_lens),
        max_mel_len=T, p_targets=jnp.asarray(pitch),
        e_targets=jnp.asarray(energy), d_targets=jnp.asarray(durations),
        train=False)

    from fastspeech2_tpu.models import fastspeech2_loss

    f_losses = fastspeech2_loss(cfg, f_out, jnp.asarray(mels),
                                jnp.asarray(pitch), jnp.asarray(energy),
                                jnp.asarray(durations))

    import model as ref_model

    preprocess, model_cfg = _ljspeech_configs("/root/reference")
    t_loss_fn = ref_model.FastSpeech2Loss(preprocess, model_cfg)
    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(speakers), torch.from_numpy(texts),
            torch.from_numpy(src_lens), int(src_lens.max()), mels=None,
            mel_lens=torch.from_numpy(mel_lens), max_mel_len=T,
            p_targets=torch.from_numpy(pitch),
            e_targets=torch.from_numpy(energy),
            d_targets=torch.from_numpy(durations))
        t_inputs = (None, None, None, None, None, None,
                    torch.from_numpy(mels), None, None,
                    torch.from_numpy(pitch), torch.from_numpy(energy),
                    torch.from_numpy(durations))
        t_losses = t_loss_fn(t_inputs, t_out)

    for f_v, t_v in zip(f_losses, t_losses):
        np.testing.assert_allclose(float(f_v), float(t_v), rtol=1e-4,
                                   atol=1e-5)


def test_multi_speaker_parity(ref, tmp_path):
    """Speaker-embedding path parity (model/fastspeech2.py:30-41,68-71)."""
    import json
    import shutil

    from fastspeech2_tpu.configs.config import FastSpeech2Config
    from fastspeech2_tpu.convert.from_torch import (
        fastspeech2_variables_from_torch,
    )
    from fastspeech2_tpu.models import FastSpeech2

    preprocess, model_cfg = _ljspeech_configs(ref.root)
    # fabricate a 4-speaker preprocessed dir reusing LJSpeech stats
    pre = str(tmp_path / "pre")
    shutil.copytree(f"{ref.root}/preprocessed_data/LJSpeech", pre,
                    ignore=shutil.ignore_patterns("*.txt"))
    with open(f"{pre}/speakers.json", "w") as f:
        json.dump({f"s{i}": i for i in range(4)}, f)
    preprocess["path"]["preprocessed_path"] = pre
    model_cfg = dict(model_cfg, multi_speaker=True)

    torch.manual_seed(1)
    tmodel = ref.model.FastSpeech2(preprocess, model_cfg).eval()
    cfg = FastSpeech2Config.build(preprocess, model_cfg)
    assert cfg.multi_speaker and cfg.n_speaker == 4
    fmodel = FastSpeech2(cfg)
    variables = jax.tree_util.tree_map(
        jnp.asarray,
        fastspeech2_variables_from_torch(tmodel.state_dict(), cfg))

    speakers, texts, src_lens, durations, mel_lens, T, pitch, energy = (
        _batch(seed=9))
    speakers = np.array([1, 3])
    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(speakers), torch.from_numpy(texts),
            torch.from_numpy(src_lens), int(src_lens.max()), mels=None,
            mel_lens=torch.from_numpy(mel_lens), max_mel_len=T,
            p_targets=torch.from_numpy(pitch),
            e_targets=torch.from_numpy(energy),
            d_targets=torch.from_numpy(durations))
    f_out = fmodel.apply(
        variables, jnp.asarray(speakers), jnp.asarray(texts),
        jnp.asarray(src_lens), mel_lens=jnp.asarray(mel_lens),
        max_mel_len=T, p_targets=jnp.asarray(pitch),
        e_targets=jnp.asarray(energy), d_targets=jnp.asarray(durations),
        train=False)
    np.testing.assert_allclose(
        np.asarray(f_out.postnet_mel), t_out[1].numpy(), atol=2e-4,
        rtol=1e-4)


def test_frame_level_variance_parity(ref):
    """Frame-level pitch/energy (reference model/modules.py:138-151 branch):
    teacher-forced parity against the torch model with [B, T] targets, and
    a working inference path."""
    from fastspeech2_tpu.configs.config import FastSpeech2Config
    from fastspeech2_tpu.convert.from_torch import (
        fastspeech2_variables_from_torch,
    )
    from fastspeech2_tpu.models import FastSpeech2

    preprocess, model_cfg = _ljspeech_configs(ref.root)
    preprocess["preprocessing"]["pitch"]["feature"] = "frame_level"
    preprocess["preprocessing"]["energy"]["feature"] = "frame_level"
    torch.manual_seed(1)
    tmodel = ref.model.FastSpeech2(preprocess, model_cfg).eval()
    cfg = FastSpeech2Config.build(preprocess, model_cfg)
    assert cfg.pitch_feature_level == "frame_level"
    fmodel = FastSpeech2(cfg)
    variables = jax.tree_util.tree_map(
        jnp.asarray, fastspeech2_variables_from_torch(
            tmodel.state_dict(), cfg))

    speakers, texts, src_lens, durations, mel_lens, T, _, _ = _batch(seed=3)
    rng = np.random.RandomState(7)
    pitch = rng.uniform(-2.0, 8.0, size=(2, T)).astype(np.float32)
    energy = rng.uniform(-1.0, 7.0, size=(2, T)).astype(np.float32)

    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(speakers), torch.from_numpy(texts),
            torch.from_numpy(src_lens), int(src_lens.max()),
            mels=None, mel_lens=torch.from_numpy(mel_lens), max_mel_len=T,
            p_targets=torch.from_numpy(pitch),
            e_targets=torch.from_numpy(energy),
            d_targets=torch.from_numpy(durations),
        )
    f_out = jax.jit(
        fmodel.apply, static_argnames=("max_mel_len", "train"))(
        variables, jnp.asarray(speakers), jnp.asarray(texts),
        jnp.asarray(src_lens), mel_lens=jnp.asarray(mel_lens),
        max_mel_len=T, p_targets=jnp.asarray(pitch),
        e_targets=jnp.asarray(energy), d_targets=jnp.asarray(durations),
        train=False)
    np.testing.assert_allclose(
        np.asarray(f_out.postnet_mel), t_out[1].numpy(), atol=2e-4,
        rtol=1e-4)
    assert f_out.pitch_prediction.shape == (2, T)   # frame-level output
    np.testing.assert_allclose(
        np.asarray(f_out.pitch_prediction), t_out[2].numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(f_out.energy_prediction), t_out[3].numpy(), atol=1e-4)

    # inference path (no targets): predictions at frame level, finite wav
    f_inf = jax.jit(
        fmodel.apply, static_argnames=("max_mel_len", "train"))(
        variables, jnp.asarray(speakers), jnp.asarray(texts),
        jnp.asarray(src_lens), max_mel_len=cfg.max_seq_len, train=False)
    assert f_inf.pitch_prediction.shape == (2, cfg.max_seq_len)
    assert np.all(np.isfinite(np.asarray(f_inf.postnet_mel)))
