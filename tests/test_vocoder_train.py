"""HiFi-GAN vocoder training tests: discriminator shapes/fold semantics,
loss functions, a few optimization steps (mel loss must drop), and the CLI
entry point.  Tiny generator/discriminator configs keep CPU compile time
sane."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.audio.stft import MelSpectrogram
from fastspeech2_tpu.models.hifigan import HiFiGANGenerator
from fastspeech2_tpu.models.hifigan_disc import (
    HiFiGANDiscriminators,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    PeriodDiscriminator,
)
from fastspeech2_tpu.training.vocoder import (
    VocoderTrainState,
    discriminator_loss,
    feature_loss,
    generator_adv_loss,
    make_vocoder_optimizer,
    make_vocoder_train_step,
)

SEG = 2048  # 8 mel frames at hop 256


def _tiny_disc():
    return HiFiGANDiscriminators(
        periods=(2, 3), n_scales=2, period_channels=(4, 8),
        scale_layers=((8, 15, 1, 1), (16, 41, 4, 4), (16, 5, 1, 1)))


def _tiny_gen():
    return HiFiGANGenerator(
        upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), n_mel_channels=8)


def _mel_fn():
    return MelSpectrogram(n_mel_channels=8)


def test_period_discriminator_fold():
    """Waveform not divisible by the period must be reflect-padded, and the
    conv stack must produce one score map plus one fmap per layer."""
    d = PeriodDiscriminator(period=3, channels=(4, 8))
    y = jnp.asarray(np.random.RandomState(0).randn(2, 1000), jnp.float32)
    variables = d.init(jax.random.PRNGKey(0), y)
    fmap, score = d.apply(variables, y)
    assert len(fmap) == 3            # 2 conv layers + conv_post
    assert score.shape[0] == 2 and score.ndim == 2


def test_multi_discriminators_outputs():
    y = jnp.asarray(np.random.RandomState(0).randn(2, SEG), jnp.float32)
    mpd = MultiPeriodDiscriminator(periods=(2, 3),
                                   channels=(4, 8))
    v = mpd.init(jax.random.PRNGKey(0), y)
    fmaps, scores = mpd.apply(v, y)
    assert len(fmaps) == 2 and len(scores) == 2

    # tiny layer spec: full-size MSD channels (128-1024) run eagerly here
    # and dominate the test's wall time without changing what it checks
    msd = MultiScaleDiscriminator(
        n_scales=2,
        layers=((8, 15, 1, 1), (16, 41, 4, 4), (16, 5, 1, 1)))
    v = msd.init(jax.random.PRNGKey(0), y)
    fmaps, scores = msd.apply(v, y)
    assert len(fmaps) == 2 and len(scores) == 2
    # second scale is average-pooled 2x
    assert scores[1].shape[1] <= scores[0].shape[1]


def test_gan_losses_at_optimum():
    """At D(real)=1, D(fake)=0 the discriminator loss is 0; the generator
    adversarial loss is 0 at D(fake)=1."""
    one = [jnp.ones((2, 5))]
    zero = [jnp.zeros((2, 5))]
    assert float(discriminator_loss(one, zero)) == 0.0
    assert float(generator_adv_loss(one)) == 0.0
    assert float(generator_adv_loss(zero)) == 1.0
    f = [[jnp.ones((2, 3))]]
    assert float(feature_loss(f, f)) == 0.0
    f2 = [[jnp.zeros((2, 3))]]
    assert float(feature_loss(f, f2)) == 2.0


def test_vocoder_train_step_losses_improve():
    rng = jax.random.PRNGKey(0)
    gen, disc, mel_fn = _tiny_gen(), _tiny_disc(), _mel_fn()

    t = np.arange(SEG) / 22050.0
    # batch 4 matches the data-parallel test's shapes so its unsharded
    # reference step reuses this test's trace and executable
    base = np.stack([
        0.5 * np.sin(2 * np.pi * f * t)
        for f in (220.0, 330.0, 440.0, 550.0)
    ]).astype(np.float32)
    wav = jnp.asarray(base)

    mel0 = mel_fn(wav)[0][:, :, : SEG // 256].transpose(0, 2, 1)
    gen_params = jax.jit(gen.init)(rng, mel0)["params"]
    disc_params = jax.jit(disc.init)(rng, wav)["params"]
    gen_opt, _ = make_vocoder_optimizer(2e-4)
    disc_opt, _ = make_vocoder_optimizer(2e-4)
    state = VocoderTrainState.create(gen_params, disc_params,
                                     gen_opt, disc_opt)
    # same key train_vocoder uses: the DP test below (equal tiny modules)
    # then reuses this trace instead of re-tracing the GAN step
    from fastspeech2_tpu.utils.jit_cache import cached_jit

    step_fn = cached_jit(
        ("voc_train_step", gen, disc, mel_fn, 2e-4, 0.999, 1000, False),
        lambda: jax.jit(make_vocoder_train_step(gen, disc, mel_fn,
                                                gen_opt, disc_opt),
                        donate_argnums=0))
    # fetch host values only at the ends: per-step float() serializes the
    # loop, and a mid-run NaN would persist in params and show up in the
    # final losses anyway
    first_mel = None
    for i in range(16):
        state, losses = step_fn(state, wav)
        if i == 0:
            first_mel = float(losses["gen_mel"])
    assert all(np.isfinite(float(v)) for v in losses.values())
    last_mel = float(losses["gen_mel"])
    assert int(state.step) == 16
    assert last_mel < first_mel, (first_mel, last_mel)


def test_vocoder_step_data_parallel():
    """Segment batch sharded over a 4-device data mesh: step runs, params
    stay replicated, losses match the unsharded step."""
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 simulated devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fastspeech2_tpu.parallel import make_mesh
    from fastspeech2_tpu.training.vocoder import VocoderTrainState

    rng = jax.random.PRNGKey(0)
    gen, disc, mel_fn = _tiny_gen(), _tiny_disc(), _mel_fn()
    r = np.random.RandomState(0)
    wav = r.randn(4, SEG).astype(np.float32) * 0.3

    mel0 = mel_fn(jnp.asarray(wav))[0][:, :, : SEG // 256].transpose(0, 2, 1)
    gen_params = jax.jit(gen.init)(rng, mel0)["params"]
    disc_params = jax.jit(disc.init)(rng, jnp.asarray(wav))["params"]
    gen_opt, _ = make_vocoder_optimizer(2e-4)
    disc_opt, _ = make_vocoder_optimizer(2e-4)
    from fastspeech2_tpu.utils.jit_cache import cached_jit

    step_fn = cached_jit(
        ("voc_train_step", gen, disc, mel_fn, 2e-4, 0.999, 1000, False),
        lambda: jax.jit(make_vocoder_train_step(gen, disc, mel_fn,
                                                gen_opt, disc_opt),
                        donate_argnums=0))

    # the shared step donates its input state; on the CPU platform
    # device_put can alias host buffers, so the DP state must be built
    # from independent copies or the ref call's donation deletes both
    host = jax.device_get((gen_params, disc_params))
    ref_state = VocoderTrainState.create(gen_params, disc_params,
                                         gen_opt, disc_opt)
    _, ref_losses = step_fn(ref_state, jnp.asarray(wav))

    mesh = make_mesh(data=4, model=1)
    fresh = jax.tree_util.tree_map(jnp.array, host)
    state = VocoderTrainState.create(fresh[0], fresh[1],
                                     gen_opt, disc_opt)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    wav_sh = jax.device_put(wav, NamedSharding(mesh, P("data")))
    new_state, losses = step_fn(state, wav_sh)

    for k in losses:
        np.testing.assert_allclose(float(losses[k]), float(ref_losses[k]),
                                   rtol=1e-4)
    leaf = jax.tree_util.tree_leaves(new_state.gen_params)[0]
    assert leaf.sharding.is_fully_replicated


def test_finetune_pipeline(tmp_path):
    """Full fine-tuning recipe end-to-end: preprocess with trimmed-wav
    export -> export_mels (teacher-forced predicted mels) -> fine-tune the
    vocoder on aligned (GT wav, predicted mel) pairs."""
    import json
    import yaml

    from test_preprocessing import _config, _make_raw_corpus

    # 2 utterances (1 train + 1 val with val_size=1): DSP dominates this
    # test and every stage below handles partial batches
    raw, out = _make_raw_corpus(str(tmp_path), n_utts=2)
    pre_cfg = _config(raw, out)
    pre_cfg["preprocessing"]["audio"]["save_trimmed_wav"] = True
    from fastspeech2_tpu.preprocessing import Preprocessor

    Preprocessor(pre_cfg).build_from_path()

    # aligned trimmed wavs exist and pair with mels frame-for-frame
    wav_files = sorted(os.listdir(os.path.join(out, "wav")))
    assert wav_files
    for wf in wav_files:
        wav = np.load(os.path.join(out, "wav", wf))
        mel = np.load(os.path.join(out, "mel", wf.replace("-wav-", "-mel-")))
        assert len(wav) == mel.shape[0] * 256

    model_cfg = {
        "transformer": {
            "encoder_layer": 1, "encoder_head": 2, "encoder_hidden": 16,
            "decoder_layer": 1, "decoder_head": 2, "decoder_hidden": 16,
            "conv_filter_size": 32, "conv_kernel_size": [9, 1],
            "encoder_dropout": 0.2, "decoder_dropout": 0.2,
        },
        "variance_predictor": {"filter_size": 16, "kernel_size": 3,
                               "dropout": 0.5},
        "variance_embedding": {"pitch_quantization": "linear",
                               "energy_quantization": "linear",
                               "n_bins": 16},
        "postnet": {"embedding_dim": 16, "kernel_size": 5,
                    "n_convolutions": 3},
        "multi_speaker": False, "max_seq_len": 256,
        "vocoder": {"model": "none", "speaker": "LJSpeech"},
    }
    train_cfg = {
        "bucket": {"text": 8, "mel": 32},
        "path": {"ckpt_path": str(tmp_path / "ckpt"),
                 "log_path": str(tmp_path / "log"),
                 "result_path": str(tmp_path / "result")},
        "optimizer": {"batch_size": 2, "betas": [0.9, 0.98], "eps": 1e-9,
                      "grad_clip_thresh": 1.0, "warm_up_step": 10,
                      "anneal_steps": [], "anneal_rate": 1.0},
        "step": {"total_step": 2, "log_step": 1, "synth_step": 100,
                 "val_step": 100, "save_step": 2},
    }
    paths = {}
    for name, c in [("preprocess", pre_cfg), ("model", model_cfg),
                    ("train", train_cfg)]:
        pth = tmp_path / f"{name}.yaml"
        pth.write_text(yaml.safe_dump(c))
        paths[name] = str(pth)

    # teacher-forced predicted mels (random-init acoustic model is fine for
    # exercising the pipeline)
    from fastspeech2_tpu.cli.export_mels_cli import main as export_main

    n = export_main(["-p", paths["preprocess"], "-m", paths["model"],
                     "-t", paths["train"], "--batch_size", "2"])
    n += export_main(["-p", paths["preprocess"], "-m", paths["model"],
                      "-t", paths["train"], "--batch_size", "2",
                      "--split", "val.txt"])
    assert n == len(wav_files)
    pred = sorted(os.listdir(os.path.join(out, "mel_pred")))
    assert len(pred) == len(wav_files)
    m0 = np.load(os.path.join(out, "mel_pred", pred[0]))
    g0 = np.load(os.path.join(out, "mel", pred[0]))
    assert m0.shape == g0.shape  # teacher-forced: GT-length alignment

    # fine-tune the vocoder on the (wav, predicted-mel) pairs via the CLI
    from fastspeech2_tpu.cli.train_vocoder_cli import main as voc_main

    cfg = {
        "upsample_rates": [8, 8, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "upsample_initial_channel": 16,
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
        "segment_size": 2048, "num_mels": 80,
        "learning_rate": 2e-4, "batch_size": 2,
        "discriminator": {
            "periods": [2, 3], "n_scales": 2,
            "period_channels": [4, 8],
            "scale_layers": [[8, 15, 1, 1], [16, 41, 4, 4], [16, 5, 1, 1]],
        },
    }
    cfg_path = tmp_path / "voc.json"
    cfg_path.write_text(json.dumps(cfg))
    state = voc_main([
        "--finetune_from", out, "--out_dir", str(tmp_path / "voc_ckpt"),
        "--config", str(cfg_path),
        "--total_steps", "2", "--log_step", "1", "--save_step", "2",
    ])
    assert int(state.step) == 2
    assert os.path.isdir(tmp_path / "voc_ckpt" / "2")


def test_train_vocoder_cli(tmp_path):
    """End-to-end through the CLI: wav corpus -> steps -> checkpoint."""
    import json

    from fastspeech2_tpu.audio.wav import save_wav
    from fastspeech2_tpu.cli.train_vocoder_cli import main

    wav_dir = tmp_path / "wavs" / "spk0"
    os.makedirs(wav_dir)
    t = np.arange(22050) / 22050.0
    for i, f in enumerate([220.0, 330.0]):
        save_wav(str(wav_dir / f"u{i}.wav"),
                 (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32), 22050)

    cfg = {
        "upsample_rates": [8, 8, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "upsample_initial_channel": 16,
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
        "segment_size": 2048,
        "num_mels": 8,
        "learning_rate": 2e-4,
        "batch_size": 2,
        "discriminator": {
            "periods": [2, 3], "n_scales": 2,
            "period_channels": [4, 8],
            "scale_layers": [[8, 15, 1, 1], [16, 41, 4, 4], [16, 5, 1, 1]],
        },
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    state = main([
        "--wav_dir", str(tmp_path / "wavs"),
        "--out_dir", str(tmp_path / "ckpt"),
        "--config", str(cfg_path),
        "--total_steps", "3", "--log_step", "1", "--save_step", "3",
    ])
    assert int(state.step) == 3
    assert os.path.isdir(tmp_path / "ckpt" / "3")

    # re-launching with the same out_dir resumes from the newest checkpoint
    # (runs steps 4..5 only) instead of restarting from scratch
    state = main([
        "--wav_dir", str(tmp_path / "wavs"),
        "--out_dir", str(tmp_path / "ckpt"),
        "--config", str(cfg_path),
        "--total_steps", "5", "--log_step", "1", "--save_step", "5",
    ])
    assert int(state.step) == 5
    assert os.path.isdir(tmp_path / "ckpt" / "5")


def test_train_vocoder_cli_init_gen_npz(tmp_path):
    """--init_gen_npz warm-starts the generator from a tracked fp16 npz
    snapshot (params_io), continuing runs whose orbax checkpoints were
    wiped (docs/vocoder_training.md C8C2I continuation)."""
    import json

    from fastspeech2_tpu.audio.wav import save_wav
    from fastspeech2_tpu.cli.train_vocoder_cli import main
    from fastspeech2_tpu.utils.params_io import save_variables_npz

    wav_dir = tmp_path / "wavs" / "spk0"
    os.makedirs(wav_dir)
    t = np.arange(22050) / 22050.0
    save_wav(str(wav_dir / "u0.wav"),
             (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32), 22050)

    cfg = {
        "upsample_rates": [8, 8, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "upsample_initial_channel": 16,
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
        "segment_size": 2048,
        "num_mels": 8,
        "learning_rate": 2e-4,
        "batch_size": 2,
        "discriminator": {
            "periods": [2, 3], "n_scales": 2,
            "period_channels": [4, 8],
            "scale_layers": [[8, 15, 1, 1], [16, 41, 4, 4], [16, 5, 1, 1]],
        },
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    gen = HiFiGANGenerator(
        upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), n_mel_channels=8)
    params = gen.init(jax.random.PRNGKey(7), jnp.zeros((1, 8, 8)))["params"]
    npz_path = tmp_path / "gen_snapshot.npz"
    save_variables_npz(str(npz_path), {"params": params})

    captured = {}
    import fastspeech2_tpu.training.vocoder as V

    orig = V.train_vocoder

    def wrapped(*a, **kw):
        captured["init"] = kw.get("init_generator_params")
        return orig(*a, **kw)

    V.train_vocoder = wrapped
    try:
        main([
            "--wav_dir", str(tmp_path / "wavs"),
            "--out_dir", str(tmp_path / "ckpt"),
            "--config", str(cfg_path),
            "--init_gen_npz", str(npz_path),
            "--total_steps", "1", "--log_step", "1", "--save_step", "1",
        ])
    finally:
        V.train_vocoder = orig

    init = captured["init"]
    assert init is not None
    ref_leaves = jax.tree_util.tree_leaves_with_path(params)
    got_leaves = jax.tree_util.tree_leaves_with_path(init)
    assert [p for p, _ in ref_leaves] == [p for p, _ in got_leaves]
    for (_, a), (_, b) in zip(ref_leaves, got_leaves):
        # fp16 snapshot roundtrip: equal to half precision
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_train_vocoder_scan_mode(tmp_path):
    """--scan_step runs the device-resident bank path: K GAN steps per
    dispatch with in-graph segment gathers, same duty boundaries."""
    import json

    from fastspeech2_tpu.audio.wav import save_wav
    from fastspeech2_tpu.cli.train_vocoder_cli import main

    wav_dir = tmp_path / "wavs" / "spk0"
    os.makedirs(wav_dir)
    t = np.arange(22050) / 22050.0
    for i, f in enumerate([220.0, 330.0]):
        save_wav(str(wav_dir / f"u{i}.wav"),
                 (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32), 22050)

    cfg = {
        "upsample_rates": [8, 8, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "upsample_initial_channel": 16,
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
        "segment_size": 2048,
        "num_mels": 8,
        "learning_rate": 2e-4,
        "batch_size": 2,
        "discriminator": {
            "periods": [2, 3], "n_scales": 2,
            "period_channels": [4, 8],
            "scale_layers": [[8, 15, 1, 1], [16, 41, 4, 4], [16, 5, 1, 1]],
        },
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    logs = []
    import fastspeech2_tpu.training.vocoder as V

    orig = V.train_vocoder

    def wrapped(*a, **kw):
        kw["log"] = logs.append
        return orig(*a, **kw)

    V.train_vocoder = wrapped
    try:
        state = main([
            "--wav_dir", str(tmp_path / "wavs"),
            "--out_dir", str(tmp_path / "ckpt"),
            "--config", str(cfg_path),
            "--total_steps", "4", "--log_step", "2", "--save_step", "4",
            "--scan_step", "2",
        ])
    finally:
        V.train_vocoder = orig
    assert int(state.step) == 4
    assert os.path.isdir(tmp_path / "ckpt" / "4")
    assert any("vocoder scan mode:" in m for m in logs), logs
    # losses logged from the scanned dispatch are finite
    stepline = [m for m in logs if m.startswith("Vocoder step 4/4")]
    assert stepline, logs


def test_train_vocoder_melgan(tmp_path):
    """arch: melgan trains the MelGAN topology (models/melgan.py) with the
    same GAN objective, and the native checkpoint loads through
    get_vocoder + vocodes — the capability the reference only gets from
    torch.hub pretrained weights (utils/model.py:46-56)."""
    import json

    from fastspeech2_tpu.audio.wav import save_wav
    from fastspeech2_tpu.cli.train_vocoder_cli import main

    wav_dir = tmp_path / "wavs" / "spk0"
    os.makedirs(wav_dir)
    t = np.arange(22050) / 22050.0
    for i, f in enumerate([220.0, 330.0]):
        save_wav(str(wav_dir / f"u{i}.wav"),
                 (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32),
                 22050)

    cfg = {
        "arch": "melgan",
        "upsample_rates": [8, 8, 2, 2],
        "ngf": 4,
        "n_residual_layers": 1,
        "segment_size": 2048,
        "num_mels": 8,
        "learning_rate": 2e-4,
        "batch_size": 2,
        "discriminator": {
            "periods": [2, 3], "n_scales": 2,
            "period_channels": [4, 8],
            "scale_layers": [[8, 15, 1, 1], [16, 41, 4, 4], [16, 5, 1, 1]],
        },
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    state = main([
        "--wav_dir", str(tmp_path / "wavs"),
        "--out_dir", str(tmp_path / "ckpt"),
        "--config", str(cfg_path),
        "--total_steps", "2", "--log_step", "2", "--save_step", "2",
        "--scan_step", "2",   # also covers the scanned path's input scale
    ])
    assert int(state.step) == 2
    assert os.path.isdir(tmp_path / "ckpt" / "2")
    # melgan params, not hifigan: reflect-padded conv_pre + up_i/res_i_j
    assert "up_0" in state.gen_params and "conv_pre" in state.gen_params

    # the native checkpoint round-trips through the inference path
    from fastspeech2_tpu.synthesis.vocoder import MelGANVocoder

    voc = MelGANVocoder(
        params={"params": jax.device_get(state.gen_params)},
        gen_config={"ngf": 4, "n_residual_layers": 1, "n_mel_channels": 8})
    wav = voc(jnp.zeros((1, 4, 8), jnp.float32))
    assert wav.shape == (1, 4 * 256)
    assert np.isfinite(np.asarray(wav)).all()


def test_finetune_sampler_split_restriction(tmp_path):
    """--split train.txt keeps held-out clips out of GAN training
    (leave-one-out protocol, scripts/leave_one_out.py)."""
    from fastspeech2_tpu.training.vocoder import FinetuneSampler

    pre = tmp_path / "pre"
    (pre / "wav").mkdir(parents=True)
    (pre / "mel").mkdir()
    names = ["utt_a", "utt_b", "utt_c"]
    for n in names:
        np.save(pre / "wav" / f"SPK-wav-{n}.npy",
                np.zeros(2048, np.float32))
        np.save(pre / "mel" / f"SPK-mel-{n}.npy",
                np.zeros((8, 80), np.float32))
    (pre / "train.txt").write_text(
        "utt_a|SPK|{AH0}|a\nutt_c|SPK|{AH0}|c\n")

    all_pairs = FinetuneSampler(str(pre), mel_source="gt")
    assert len(all_pairs.pairs) == 3  # default: unrestricted (old behavior)

    split = FinetuneSampler(str(pre), mel_source="gt", split="train.txt")
    got = sorted(os.path.basename(w) for w, _ in split.pairs)
    assert got == ["SPK-wav-utt_a.npy", "SPK-wav-utt_c.npy"]


def test_finetune_sampler_mixed_source(tmp_path):
    """mel_source='mixed' interleaves GT and predicted mel pairs 50/50."""
    from fastspeech2_tpu.training.vocoder import FinetuneSampler

    pre = tmp_path / "pre"
    for d in ("wav", "mel", "mel_pred"):
        (pre / d).mkdir(parents=True)
    for n in ("utt_a", "utt_b"):
        np.save(pre / "wav" / f"SPK-wav-{n}.npy",
                np.zeros(2048, np.float32))
        np.save(pre / "mel" / f"SPK-mel-{n}.npy",
                np.zeros((8, 80), np.float32))
        np.save(pre / "mel_pred" / f"SPK-mel-{n}.npy",
                np.ones((8, 80), np.float32))

    s = FinetuneSampler(str(pre), mel_source="mixed")
    dirs = {os.path.basename(os.path.dirname(m)) for _, m in s.pairs}
    assert dirs == {"mel", "mel_pred"}
    assert len(s.pairs) == 4
    # over many draws both sources appear
    _, mels = s.sample(64)
    maxes = mels.reshape(64, -1).max(1)
    assert (maxes == 0).any() and (maxes == 1).any()


def test_adv_warmup_freezes_discriminator():
    """adv_warmup: discriminators frozen + generator trains on mel-L1 only
    until the gate opens, then the full GAN objective resumes."""
    rng = jax.random.PRNGKey(0)
    gen, disc, mel_fn = _tiny_gen(), _tiny_disc(), _mel_fn()

    t = np.arange(SEG) / 22050.0
    wav = jnp.asarray(np.stack([
        0.5 * np.sin(2 * np.pi * f * t) for f in (220.0, 330.0)
    ]).astype(np.float32))
    mel0 = mel_fn(wav)[0][:, :, : SEG // 256].transpose(0, 2, 1)
    gen_params = jax.jit(gen.init)(rng, mel0)["params"]
    disc_params = jax.jit(disc.init)(rng, wav)["params"]
    gen_opt, _ = make_vocoder_optimizer(2e-4)
    disc_opt, _ = make_vocoder_optimizer(2e-4)
    state = VocoderTrainState.create(gen_params, disc_params,
                                     gen_opt, disc_opt)
    step_fn = jax.jit(make_vocoder_train_step(
        gen, disc, mel_fn, gen_opt, disc_opt, adv_warmup=2))

    d0 = jax.device_get(state.disc_params)
    state, losses0 = step_fn(state, wav)
    # total generator loss during warmup is mel-only (gate = 0)
    assert abs(float(losses0["gen"])
               - 45.0 * float(losses0["gen_mel"])) < 1e-3
    state, _ = step_fn(state, wav)
    d2 = jax.device_get(state.disc_params)
    leaves0 = jax.tree_util.tree_leaves(d0)
    leaves2 = jax.tree_util.tree_leaves(d2)
    assert all(np.array_equal(a, b) for a, b in zip(leaves0, leaves2))

    # step 3: gate open — discriminator moves, adv/fm enter the loss
    state, losses2 = step_fn(state, wav)
    d3 = jax.device_get(state.disc_params)
    assert not all(np.array_equal(a, b) for a, b in
                   zip(leaves2, jax.tree_util.tree_leaves(d3)))
    assert float(losses2["gen"]) > 45.0 * float(losses2["gen_mel"])


def test_resample_segments_oracle():
    """Per-element linear-interp speed perturbation vs a numpy oracle."""
    from fastspeech2_tpu.training.vocoder import resample_segments

    rng = np.random.RandomState(0)
    wav = rng.randn(3, 512).astype(np.float32)
    rates = np.asarray([1.0, 0.9, 1.15], np.float32)
    out = np.asarray(resample_segments(
        jnp.asarray(wav), jnp.asarray(rates), 400))
    # rate 1.0 is the identity on the first 400 samples
    np.testing.assert_allclose(out[0], wav[0, :400], rtol=1e-6)
    for b in (1, 2):
        # float32 positions, matching the in-graph arithmetic (float64
        # positions floor differently when i * rate lands on an integer)
        pos = (np.arange(400, dtype=np.float32) * rates[b]).astype(
            np.float64)
        oracle = np.interp(pos, np.arange(512), wav[b])
        np.testing.assert_allclose(out[b], oracle, rtol=1e-4, atol=1e-5)


def test_gain_shifts_log_mel_additively():
    """The gain augmentation's external-mel correction assumes log-e mels
    shift by ln(g) under waveform gain; verify on real-ish audio."""
    mel_fn = _mel_fn()
    # broadband noise: every mel band carries energy, keeping all bins
    # above the log-compression clamp floor (where additivity breaks —
    # acceptable for augmentation, but excluded from this exactness test)
    wav = jnp.asarray(
        0.3 * np.random.RandomState(0).randn(1, SEG).astype(np.float32))
    g = 1.8
    m1 = np.asarray(mel_fn(wav)[0])
    m2 = np.asarray(mel_fn(wav * g)[0])
    np.testing.assert_allclose(m2, m1 + np.log(g), atol=2e-3)


def test_augmented_train_step_runs():
    """From-scratch step with gain + speed augmentation: consumes the
    extended segment, produces finite losses, and the augmentation is
    step-keyed (two different steps draw different augmentations; the
    same step replays identically — resume determinism)."""
    rng = jax.random.PRNGKey(0)
    gen, disc, mel_fn = _tiny_gen(), _tiny_disc(), _mel_fn()
    seg_ext = int(np.ceil(SEG * 1.1))

    t = np.arange(seg_ext) / 22050.0
    wav = jnp.asarray(np.stack([
        0.5 * np.sin(2 * np.pi * f * t) for f in (220.0, 330.0)
    ]).astype(np.float32))
    mel0 = mel_fn(wav)[0][:, :, : SEG // 256].transpose(0, 2, 1)
    gen_params = jax.jit(gen.init)(rng, mel0)["params"]
    disc_params = jax.jit(disc.init)(rng, wav[:, :SEG])["params"]
    gen_opt, _ = make_vocoder_optimizer(2e-4)
    disc_opt, _ = make_vocoder_optimizer(2e-4)
    state = VocoderTrainState.create(gen_params, disc_params,
                                     gen_opt, disc_opt)
    step_fn = jax.jit(make_vocoder_train_step(
        gen, disc, mel_fn, gen_opt, disc_opt,
        aug_gain_db=6.0, aug_speed=(0.9, 1.1), out_segment=SEG))

    s1, l1 = step_fn(state, wav)
    assert all(np.isfinite(float(v)) for v in l1.values())
    # same state+input replays the same augmentation (step-keyed RNG)
    _, l1b = step_fn(state, wav)
    assert float(l1b["gen_mel"]) == float(l1["gen_mel"])
    # the next step draws a different augmentation
    _, l2 = step_fn(s1, wav)
    assert float(l2["gen_mel"]) != float(l1["gen_mel"])


def test_aug_speed_with_external_mel_raises():
    import pytest

    gen, disc, mel_fn = _tiny_gen(), _tiny_disc(), _mel_fn()
    gen_opt, _ = make_vocoder_optimizer(2e-4)
    disc_opt, _ = make_vocoder_optimizer(2e-4)
    with pytest.raises(ValueError, match="in-graph"):
        make_vocoder_train_step(gen, disc, mel_fn, gen_opt, disc_opt,
                                external_mel=True, aug_speed=(0.9, 1.1),
                                out_segment=SEG)


def test_train_vocoder_gt_wav_augmented(tmp_path):
    """mel_source='gt_wav': trains from the trimmed wav bank with split
    restriction and full (gain + speed) augmentation, scan mode."""
    from fastspeech2_tpu.training.vocoder import train_vocoder

    pre = tmp_path / "pre"
    (pre / "wav").mkdir(parents=True)
    (pre / "mel").mkdir()
    t = np.arange(4096) / 22050.0
    for n, f in [("utt_a", 220.0), ("utt_b", 330.0), ("utt_c", 440.0)]:
        np.save(pre / "wav" / f"SPK-wav-{n}.npy",
                (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32))
        np.save(pre / "mel" / f"SPK-mel-{n}.npy",
                np.zeros((16, 8), np.float32))
    (pre / "train.txt").write_text(
        "utt_a|SPK|{AH0}|a\nutt_c|SPK|{AH0}|c\n")

    state = train_vocoder(
        None, str(tmp_path / "out"),
        total_steps=4, batch_size=2, segment_size=SEG,
        generator_config=dict(
            upsample_rates=(8, 8, 2, 2),
            upsample_kernel_sizes=(16, 16, 4, 4),
            upsample_initial_channel=16,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),)),
        discriminator_config=dict(
            periods=(2, 3), n_scales=2, period_channels=(4, 8),
            scale_layers=((8, 15, 1, 1), (16, 41, 4, 4), (16, 5, 1, 1))),
        n_mel_channels=8,
        finetune_from=str(pre), mel_source="gt_wav", split="train.txt",
        aug_gain_db=6.0, aug_speed=(0.9, 1.1),
        scan_step=2, log_step=2, save_step=4, log=lambda *_: None)
    assert int(state.step) == 4
    assert os.path.isdir(tmp_path / "out" / "4")
