"""iSTFT-head HiFi-GAN fast variant (models/hifigan_istft.py): the OLA
synthesis filterbank against a numpy irfft oracle, the generator's io
contract (T mel frames -> T*256 samples, matching the parity generator),
vocoder selection via model config, and one GAN training step."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.models.hifigan_istft import (
    HiFiGANiSTFTGenerator,
    _hann_periodic,
    overlap_add_istft,
)


def test_overlap_add_istft_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    B, F, n_fft, hop = 2, 20, 16, 4
    spec = rng.randn(B, F, 9) + 1j * rng.randn(B, F, 9)
    out = np.asarray(overlap_add_istft(
        jnp.asarray(spec.real.astype(np.float32)),
        jnp.asarray(spec.imag.astype(np.float32)), n_fft, hop))

    frames = np.fft.irfft(spec, n=n_fft, axis=-1)
    w = _hann_periodic(n_fft)
    frames = frames * w
    total = (F - 1) * hop + n_fft
    sig = np.zeros((B, total))
    wss = np.zeros(total)
    for q in range(F):
        sig[:, q * hop: q * hop + n_fft] += frames[:, q]
        wss[q * hop: q * hop + n_fft] += w ** 2
    sig = sig / np.where(wss > 1e-11, wss, 1.0)
    trim = (n_fft - hop) // 2
    oracle = sig[:, trim: trim + F * hop]
    np.testing.assert_allclose(out, oracle, atol=1e-6)
    assert out.shape == (B, F * hop)


def test_istft_roundtrips_a_sine():
    """Analysis -> synthesis through the head's filterbank must
    reconstruct a bandlimited signal (COLA property of hann, hop=n_fft/4)."""
    n_fft, hop = 16, 4
    t = np.arange(400)
    sig = np.sin(2 * np.pi * t / 32).astype(np.float32)[None, :]
    w = _hann_periodic(n_fft)
    n_frames = (sig.shape[1] - n_fft) // hop + 1
    frames = np.stack([sig[0, q * hop: q * hop + n_fft] * w
                       for q in range(n_frames)])
    spec = np.fft.rfft(frames, axis=-1)
    out = np.asarray(overlap_add_istft(
        jnp.asarray(spec.real.astype(np.float32))[None],
        jnp.asarray(spec.imag.astype(np.float32))[None], n_fft, hop))
    # compare interior (away from edge taper); the head trims
    # (n_fft-hop)/2 = 6 leading samples, so out[i] ~ sig[i + 6]
    inner = slice(32, out.shape[1] - 32)
    shifted = sig[0, 6: 6 + out.shape[1]]
    np.testing.assert_allclose(out[0][inner], shifted[inner], atol=1e-4)


def _tiny_istft_gen():
    return HiFiGANiSTFTGenerator(
        upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), n_mel_channels=8)


def test_generator_io_contract():
    gen = _tiny_istft_gen()
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 6, 8), jnp.float32)
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), mel)
    wav = jax.jit(gen.apply)(variables, mel)
    # 8 * 8 * 4 = 256 = hop_length: same contract as HiFiGANGenerator
    assert wav.shape == (2, 6 * 256)
    assert np.all(np.isfinite(np.asarray(wav)))


def test_get_vocoder_istft_variant(tmp_path):
    from fastspeech2_tpu.synthesis.vocoder import get_vocoder, vocoder_infer

    model_config = {"vocoder": {"model": "HiFi-GAN-iSTFT",
                                "speaker": "LJSpeech"}}
    pre = {"preprocessing": {
        "audio": {"max_wav_value": 32768.0, "sampling_rate": 22050},
        "stft": {"hop_length": 256},
    }}
    voc = get_vocoder(model_config, pre, None)
    assert voc.generator.gen_istft_n_fft == 16
    mels = jnp.zeros((1, 5, 80))
    wavs = vocoder_infer(np.asarray(mels), voc, pre, lengths=[4])
    assert wavs[0].shape == (4 * 256,)
    assert wavs[0].dtype == np.int16


def test_vocoder_train_step_with_istft_gen(tmp_path):
    """One GAN step through train_vocoder with the variant selected by
    gen_istft_n_fft in the generator config; checkpoint then loads back
    through get_vocoder's native path."""
    from scipy.io import wavfile

    from fastspeech2_tpu.synthesis.vocoder import get_vocoder
    from fastspeech2_tpu.training.vocoder import train_vocoder

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        w = (rng.randn(6000) * 3000).astype(np.int16)
        wavfile.write(str(wav_dir / f"{i}.wav"), 22050, w)

    out_dir = tmp_path / "voc"
    state = train_vocoder(
        str(wav_dir), str(out_dir), total_steps=1, batch_size=2,
        segment_size=2048, n_mel_channels=8,
        generator_config=dict(
            upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16),
            upsample_initial_channel=16, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),), gen_istft_n_fft=16,
            gen_istft_hop_size=4),
        discriminator_config=dict(
            periods=(2,), n_scales=1, period_channels=(4,),
            scale_layers=((8, 15, 1, 1), (16, 41, 4, 4), (16, 5, 1, 1))),
        log=lambda *_: None)
    assert int(state.step) == 1
    ckpt = os.path.join(str(out_dir), "1")
    assert os.path.isdir(ckpt)

    # native orbax checkpoint loads through get_vocoder
    from fastspeech2_tpu.synthesis.vocoder import HiFiGANVocoder

    cfg = dict(upsample_rates=[8, 8], upsample_kernel_sizes=[16, 16],
               upsample_initial_channel=16, resblock_kernel_sizes=[3],
               resblock_dilation_sizes=[[1, 3]], gen_istft_n_fft=16,
               gen_istft_hop_size=4, num_mels=8)
    model_config = {"vocoder": {"model": "HiFi-GAN-iSTFT"}}
    pre = {"preprocessing": {
        "audio": {"max_wav_value": 32768.0, "sampling_rate": 22050},
        "stft": {"hop_length": 256},
    }}
    # point the loader at the tiny config via a temp config file
    cfg_path = tmp_path / "cfg.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(ckpt))
    voc = HiFiGANVocoder({"params": tree["gen_params"]}, cfg)
    wav = voc(jnp.zeros((1, 4, 8)))
    assert wav.shape == (1, 4 * 256)


def test_get_vocoder_c8c2i_variant():
    """The faster C8C2I operating point (rates 8,2 + n_fft 64 / hop 16)
    keeps the same io contract: total upsample 8*2*16 = 256."""
    from fastspeech2_tpu.synthesis.vocoder import get_vocoder

    model_config = {"vocoder": {"model": "HiFi-GAN-iSTFT-C8C2I"}}
    pre = {"preprocessing": {
        "audio": {"max_wav_value": 32768.0, "sampling_rate": 22050},
        "stft": {"hop_length": 256},
    }}
    voc = get_vocoder(model_config, pre, None)
    assert voc.generator.gen_istft_n_fft == 64
    assert tuple(voc.generator.upsample_rates) == (8, 2)
    wav = voc(jnp.zeros((1, 5, 80)))
    assert wav.shape == (1, 5 * 256)
    assert np.all(np.isfinite(np.asarray(wav)))
