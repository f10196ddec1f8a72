"""Vocoder loading and waveform inference.

Mirrors utils/model.py:42-92: config selects HiFi-GAN (vendored weights) or
MelGAN (torch.hub download — unavailable offline, so we also provide a
Griffin-Lim fallback); vocoder_infer scales by max_wav_value to int16 and
trims each waveform to mel_len * hop_length.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.models.hifigan import HiFiGANGenerator
from fastspeech2_tpu.utils.jit_cache import cached_jit

_HIFIGAN_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "configs", "hifigan")


class HiFiGANVocoder:
    def __init__(self, params=None, config=None, dtype=jnp.float32,
                 folded="auto"):
        """folded: use the lane-folded inference path
        (models/hifigan_folded.py) — "auto" enables it on TPU, where it is
        ~20% faster end-to-end and numerically identical.  A config with
        "gen_istft_n_fft" selects the iSTFT-head fast variant
        (models/hifigan_istft.py) instead; folding does not apply there.
        """
        if config is None:
            config = {}
        common = dict(
            upsample_initial_channel=config.get(
                "upsample_initial_channel", 512),
            resblock_kernel_sizes=tuple(
                config.get("resblock_kernel_sizes", (3, 7, 11))),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in config.get(
                    "resblock_dilation_sizes",
                    ((1, 3, 5), (1, 3, 5), (1, 3, 5)))),
            n_mel_channels=config.get("num_mels", 80),
            dtype=dtype,
        )
        istft_head = "gen_istft_n_fft" in config
        if istft_head:
            from fastspeech2_tpu.models.hifigan_istft import (
                HiFiGANiSTFTGenerator,
            )

            self.generator = HiFiGANiSTFTGenerator(
                upsample_rates=tuple(config.get("upsample_rates", (8, 8))),
                upsample_kernel_sizes=tuple(
                    config.get("upsample_kernel_sizes", (16, 16))),
                gen_istft_n_fft=config["gen_istft_n_fft"],
                gen_istft_hop_size=config.get("gen_istft_hop_size", 4),
                **common,
            )
            folded = False
        else:
            self.generator = HiFiGANGenerator(
                upsample_rates=tuple(
                    config.get("upsample_rates", (8, 8, 2, 2))),
                upsample_kernel_sizes=tuple(
                    config.get("upsample_kernel_sizes", (16, 16, 4, 4))),
                **common,
            )
        if params is None:
            # random init (keeps the pipeline runnable without weights)
            mel = jnp.zeros((1, 8, self.generator.n_mel_channels))
            params = jax.jit(self.generator.init)(jax.random.PRNGKey(0), mel)
        self.params = params
        if folded == "auto":
            folded = jax.default_backend() not in ("cpu",)
        if folded:
            from fastspeech2_tpu.models.hifigan_folded import FoldedHiFiGAN

            evaluator = FoldedHiFiGAN(params, config=config, dtype=dtype)
            self.raw_apply = lambda _, m: evaluator(m)
            # the folded evaluator closes over its params: the trace is
            # instance-specific, so it must not be shared across instances
            self.jit_key = None
            self._apply = jax.jit(self.raw_apply)
        else:
            self.raw_apply = self.generator.apply
            self.jit_key = self.generator
            self._apply = cached_jit(("vocoder_apply", self.jit_key),
                                     lambda: jax.jit(self.raw_apply))

    def __call__(self, mels):
        """[B, T, n_mels] -> [B, T * upsample] float waveform."""
        return self._apply(self.params, mels)


class MelGANVocoder:
    """MelGAN generator (utils/model.py:46-56 alternative).  The reference
    feeds it log10 mels, dividing the log-e mel by ln(10)
    (utils/model.py:78) — applied here before the network."""

    def __init__(self, params=None, ckpt_path=None, dtype=jnp.float32,
                 gen_config=None):
        from fastspeech2_tpu.models.melgan import MelGANGenerator

        self.generator = MelGANGenerator(dtype=dtype, **(gen_config or {}))
        if params is None and ckpt_path and os.path.exists(ckpt_path):
            from fastspeech2_tpu.convert.from_torch import (
                melgan_params_from_torch,
            )
            import torch

            sd = torch.load(ckpt_path, map_location="cpu",
                            weights_only=True)
            if isinstance(sd, dict) and "model_g" in sd:
                sd = sd["model_g"]
            params = jax.tree_util.tree_map(
                jnp.asarray, melgan_params_from_torch(sd))
        if params is None:
            mel = jnp.zeros((1, 8, self.generator.n_mel_channels))
            params = jax.jit(self.generator.init)(jax.random.PRNGKey(0),
                                                  mel)
        self.params = params
        # the reference feeds MelGAN log10 mels (utils/model.py:78)
        self.raw_apply = lambda p, m: self.generator.apply(
            p, m / jnp.log(10.0))
        self.jit_key = self.generator
        self._apply = cached_jit(("vocoder_apply_log10", self.jit_key),
                                 lambda: jax.jit(self.raw_apply))

    def __call__(self, mels):
        return self._apply(self.params, mels)


class GriffinLimVocoder:
    """Weights-free fallback: mel -> linear magnitude (pseudo-inverse of the
    mel basis, reference audio/tools.py:18-34 spec_from_mel) -> griffin-lim."""

    def __init__(self, preprocess_config, n_iters=30):
        from fastspeech2_tpu.audio.mel import mel_filterbank

        pp = preprocess_config["preprocessing"]
        self.n_fft = pp["stft"]["filter_length"]
        self.hop = pp["stft"]["hop_length"]
        self.win = pp["stft"]["win_length"]
        self.n_iters = n_iters
        basis = mel_filterbank(
            pp["audio"]["sampling_rate"], self.n_fft,
            pp["mel"]["n_mel_channels"], pp["mel"]["mel_fmin"],
            pp["mel"]["mel_fmax"] or pp["audio"]["sampling_rate"] / 2)
        self.inv_basis = jnp.asarray(np.linalg.pinv(basis))

    def __call__(self, mels):
        from fastspeech2_tpu.audio.stft import griffin_lim

        mag = jnp.einsum("fm,btm->bft", self.inv_basis, jnp.exp(mels))
        mag = jnp.maximum(mag, 0.0)
        wav = griffin_lim(mag, self.n_fft, self.hop, self.win,
                          n_iters=self.n_iters)
        # match hop-aligned length T*hop
        return wav


def load_hifigan_config(path=None):
    if path is None:
        path = os.path.join(_HIFIGAN_DIR, "config.json")
    with open(path) as f:
        return json.load(f)


def get_vocoder(model_config, preprocess_config, ckpt_path=None):
    """Build the configured vocoder (utils/model.py:42-71 equivalent).

    ckpt_path may point at a torch HiFi-GAN checkpoint
    ({"generator": state_dict}) which is converted on the fly.
    """
    name = model_config["vocoder"]["model"]
    istft_configs = {
        # C8C8I: best quality/speed point of the iSTFTNet recipe
        "HiFi-GAN-iSTFT": "config_istft.json",
        # C8C2I: ~2x faster again (stage 2 runs at 1/4 the positions),
        # small quality cost per the iSTFTNet paper
        "HiFi-GAN-iSTFT-C8C2I": "config_istft_c8c2i.json",
    }
    if name in ("HiFi-GAN", *istft_configs):
        config = load_hifigan_config(
            os.path.join(_HIFIGAN_DIR, istft_configs[name])
            if name in istft_configs else None)
        if ckpt_path is None and name not in istft_configs:
            # look for generator_<speaker>.pth.tar next to the bundled
            # config, mirroring utils/model.py:58-65's speaker selection.
            # Only for the parity topology: those bundled weights are
            # 4-upsample-stage HiFi-GAN V1; converting them with a
            # 2-stage iSTFT-head config would fail (or silently
            # mismatch), so iSTFT variants never auto-load them.
            speaker = model_config["vocoder"].get("speaker", "LJSpeech")
            candidate = os.path.join(
                _HIFIGAN_DIR, f"generator_{speaker}.pth.tar")
            if os.path.exists(candidate):
                ckpt_path = candidate
        params = None
        if ckpt_path and ckpt_path.endswith(".npz"):
            # tracked fp16 snapshot (scripts/save_weights_npz.py)
            from fastspeech2_tpu.utils.params_io import load_variables_npz

            params = jax.tree_util.tree_map(
                jnp.asarray, load_variables_npz(ckpt_path))
        elif ckpt_path and os.path.isdir(ckpt_path):
            # native checkpoint: an orbax step dir written by
            # train_vocoder (training/vocoder.py save_checkpoint);
            # restore the raw pytree and pick the generator params
            import orbax.checkpoint as ocp

            with ocp.PyTreeCheckpointer() as ckptr:
                tree = ckptr.restore(os.path.abspath(ckpt_path))
            params = {"params": tree["gen_params"]}
        elif ckpt_path and os.path.exists(ckpt_path):
            from fastspeech2_tpu.convert.from_torch import (
                hifigan_params_from_torch,
            )
            import torch

            ckpt = torch.load(ckpt_path, map_location="cpu",
                              weights_only=True)
            sd = ckpt.get("generator", ckpt)
            params = jax.tree_util.tree_map(
                jnp.asarray,
                hifigan_params_from_torch(
                    sd, tuple(config["upsample_rates"]),
                    len(config["resblock_kernel_sizes"])))
        return HiFiGANVocoder(params, config)
    if name == "MelGAN":
        if ckpt_path and ckpt_path.endswith(".npz"):
            from fastspeech2_tpu.utils.params_io import load_variables_npz

            return MelGANVocoder(params=jax.tree_util.tree_map(
                jnp.asarray, load_variables_npz(ckpt_path)))
        if ckpt_path and os.path.isdir(ckpt_path):
            # native orbax step dir from train_vocoder
            # (config_melgan.json recipe)
            import orbax.checkpoint as ocp

            with ocp.PyTreeCheckpointer() as ckptr:
                tree = ckptr.restore(os.path.abspath(ckpt_path))
            return MelGANVocoder(params={"params": tree["gen_params"]})
        return MelGANVocoder(ckpt_path=ckpt_path)
    return GriffinLimVocoder(preprocess_config)


def vocoder_infer(mels, vocoder, preprocess_config, lengths=None):
    """[B, T, n_mels] -> list of int16 numpy waveforms
    (utils/model.py:74-92 semantics)."""
    pp = preprocess_config["preprocessing"]
    max_wav_value = pp["audio"]["max_wav_value"]
    hop = pp["stft"]["hop_length"]
    wavs = np.asarray(vocoder(jnp.asarray(mels)))
    wavs = np.clip(wavs * max_wav_value, -32768, 32767).astype(np.int16)
    out = []
    for i in range(wavs.shape[0]):
        w = wavs[i]
        if lengths is not None:
            w = w[: int(lengths[i]) * hop]
        out.append(w)
    return out
