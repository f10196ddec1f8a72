"""HiFi-GAN vocoder training: losses, two-optimizer train step, loop.

Capability superset: the reference vendors only a pretrained generator
(reference hifigan/models.py:112-174, loaded at utils/model.py:57-69) and
ships no vocoder trainer.  This module trains the native generator from
scratch (or fine-tunes it) with the standard HiFi-GAN objective:

  L_D = sum_k E[(1 - D_k(y))^2] + E[D_k(y_hat)^2]          (LSGAN)
  L_G = sum_k E[(1 - D_k(y_hat))^2] + 2 * L_FM + 45 * L_mel
  L_FM = sum over all discriminator feature maps of L1(feat(y), feat(y_hat))
  L_mel = L1(mel(y), mel(y_hat))

Both updates run inside ONE jitted step (discriminator on
stop_gradient(y_hat), then generator through the updated discriminator's
graph is NOT needed — upstream updates D first, then G against the new D;
we follow that order).  Data parallel: the step is pjit-shardable over the
batch axis exactly like the acoustic train step.

Training data is raw waveform segments; the generator's input mel is
computed on device from the ground-truth segment, as in the upstream
trainer (fine-tuning from predicted mels can substitute the mel source).
"""

import os
import random
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from fastspeech2_tpu.audio.stft import MelSpectrogram
from fastspeech2_tpu.audio.wav import load_wav
from fastspeech2_tpu.models.hifigan import HiFiGANGenerator
from fastspeech2_tpu.models.hifigan_disc import HiFiGANDiscriminators


class VocoderTrainState(struct.PyTreeNode):
    gen_params: Any
    disc_params: Any
    gen_opt_state: Any
    disc_opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, gen_params, disc_params, gen_opt, disc_opt, step=0):
        return cls(
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt_state=gen_opt.init(gen_params),
            disc_opt_state=disc_opt.init(disc_params),
            step=jnp.asarray(step, jnp.int32),
        )


def make_vocoder_optimizer(learning_rate=2e-4, betas=(0.8, 0.99),
                           lr_decay=0.999, steps_per_epoch=1000):
    """AdamW with the upstream per-epoch exponential decay, expressed as a
    per-step staircase schedule."""
    sched = optax.exponential_decay(
        init_value=learning_rate, transition_steps=steps_per_epoch,
        decay_rate=lr_decay, staircase=True)
    return optax.adamw(sched, b1=betas[0], b2=betas[1]), sched


def discriminator_loss(real_scores, fake_scores):
    loss = 0.0
    for dr, dg in zip(real_scores, fake_scores):
        loss = loss + jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def generator_adv_loss(fake_scores):
    loss = 0.0
    for dg in fake_scores:
        loss = loss + jnp.mean((1.0 - dg) ** 2)
    return loss


def feature_loss(real_fmaps, fake_fmaps):
    loss = 0.0
    for fr_list, fg_list in zip(real_fmaps, fake_fmaps):
        for fr, fg in zip(fr_list, fg_list):
            loss = loss + jnp.mean(jnp.abs(fr - fg))
    return 2.0 * loss


def resample_segments(wav_ext, rates, out_len):
    """Per-element linear-interp speed perturbation, all shapes static.

    wav_ext: [B, S_ext] source segments with S_ext >= out_len * max rate;
    rates: [B] playback rates (r > 1 = faster = higher pitch);
    -> [B, out_len] where out[b, i] = wav_ext[b, i * r_b] (linear interp,
    clamped at the segment edge).  One gather pair per step — cheap on
    TPU, and jointly shifts pitch and tempo like sox `speed`."""
    s_ext = wav_ext.shape[1]
    pos = jnp.arange(out_len, dtype=jnp.float32)[None, :] * rates[:, None]
    idx0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, s_ext - 2)
    frac = pos - idx0.astype(jnp.float32)
    lo = jnp.take_along_axis(wav_ext, idx0, axis=1)
    hi = jnp.take_along_axis(wav_ext, idx0 + 1, axis=1)
    return lo * (1.0 - frac) + hi * frac


def make_vocoder_train_step(gen: HiFiGANGenerator,
                            disc: HiFiGANDiscriminators,
                            mel_fn: MelSpectrogram,
                            gen_opt, disc_opt,
                            mel_weight: float = 45.0,
                            external_mel: bool = False,
                            gen_input_scale: float = 1.0,
                            adv_warmup: int = 0,
                            aug_gain_db: float = 0.0,
                            aug_speed: tuple = None,
                            out_segment: int = None,
                            aug_seed: int = 0):
    """external_mel=False: the generator input mel is computed on device
    from the ground-truth segment (from-scratch training).  True: the step
    takes (wav, mel_in) — e.g. acoustic-model-predicted mels for
    fine-tuning — while GT wav still anchors the GAN and mel losses.

    gen_input_scale rescales the generator INPUT mel only (the mel-L1
    target stays log-e): MelGAN consumes log10 mels by the reference's
    convention (utils/model.py:78), so its trainer passes 1/ln(10) and
    natively trained params drop into MelGANVocoder unchanged.

    adv_warmup > 0: for the first N steps the generator trains on the
    mel-L1 reconstruction loss only and the discriminators stay frozen —
    the gentler recipe for variants (C8C2I) that blow up when the
    adversarial game starts from a random generator.

    Augmentation (in-graph, keyed on the step counter so resume replays
    the same stream):
    - aug_gain_db > 0: per-element gain g = 10^(U[-d, d]/20).  Exact in
      both modes: log-e mels shift additively by ln(g) (preprocessed
      mels are raw log mels, preprocessor.py _finalize_utterance), so
      external input mels are corrected in place while in-graph mels
      pick the gain up from the waveform.
    - aug_speed=(lo, hi): per-element playback-rate resampling (joint
      pitch+tempo, sox-`speed` style).  Requires the input mel to be
      computed in-graph (external_mel=False): a precomputed mel cannot
      follow a waveform resample.  The step then takes wav segments of
      length out_segment * hi (out_segment = the post-resample segment
      length the GAN trains on)."""
    hop = mel_fn.hop_length
    if aug_speed is not None and external_mel:
        raise ValueError("aug_speed needs in-graph mels "
                         "(external_mel=False); use gain-only "
                         "augmentation with external mels")

    def mel_of(wav, n_frames):
        m, _ = mel_fn(wav)                       # [B, n_mels, F+1]
        return m[:, :, :n_frames]

    def step(state: VocoderTrainState, wav: jnp.ndarray, mel=None):
        """wav: [B, S] ground-truth segments, S a multiple of hop
        (S = out_segment * aug_speed[1] when speed perturbation is on);
        mel (external_mel only): [B, S//hop, n_mels] generator input."""
        if aug_speed is not None or aug_gain_db:
            rng = jax.random.fold_in(jax.random.PRNGKey(aug_seed),
                                     state.step)
            g_rng, s_rng = jax.random.split(rng)
        if aug_speed is not None:
            rates = jax.random.uniform(
                s_rng, (wav.shape[0],), minval=aug_speed[0],
                maxval=aug_speed[1])
            wav = resample_segments(wav, rates, out_segment)
        gain_log = None
        if aug_gain_db:
            db = jax.random.uniform(g_rng, (wav.shape[0],),
                                    minval=-aug_gain_db,
                                    maxval=aug_gain_db)
            gain = 10.0 ** (db / 20.0)
            wav = wav * gain[:, None]
            gain_log = jnp.log(gain)
        n_frames = wav.shape[1] // hop
        if external_mel:
            mel_in = mel
            if gain_log is not None:
                # raw log-e mels shift additively under gain
                mel_in = mel_in + gain_log[:, None, None]
        else:
            mel_in = mel_of(wav, n_frames).transpose(0, 2, 1)  # [B,F,n_mels]
        if gen_input_scale != 1.0:
            mel_in = mel_in * gen_input_scale

        y_hat = gen.apply({"params": state.gen_params}, mel_in)
        y_hat_sg = jax.lax.stop_gradient(y_hat)

        # ---- discriminator update (y_hat detached) ----
        def d_loss_fn(d_params):
            _, real_scores = disc.apply({"params": d_params}, wav)
            _, fake_scores = disc.apply({"params": d_params}, y_hat_sg)
            return discriminator_loss(real_scores, fake_scores)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
        d_updates, disc_opt_state = disc_opt.update(
            d_grads, state.disc_opt_state, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        if adv_warmup:
            # warmup: hold discriminator params/opt-state at their old
            # values (same compiled graph either side of the boundary)
            in_warmup = state.step < adv_warmup
            keep_old = lambda old, new: jax.tree_util.tree_map(  # noqa: E731
                lambda o, n: jnp.where(in_warmup, o, n), old, new)
            disc_params = keep_old(state.disc_params, disc_params)
            disc_opt_state = keep_old(state.disc_opt_state, disc_opt_state)
            adv_gate = 1.0 - in_warmup.astype(jnp.float32)
        else:
            adv_gate = 1.0

        # ---- generator update (through the updated discriminator) ----
        real_fmaps, _ = disc.apply({"params": disc_params}, wav)
        mel_target = mel_of(wav, n_frames)

        def g_loss_fn(g_params):
            y_g = gen.apply({"params": g_params}, mel_in)
            fake_fmaps, fake_scores = disc.apply({"params": disc_params}, y_g)
            adv = generator_adv_loss(fake_scores)
            fm = feature_loss(real_fmaps, fake_fmaps)
            mel_l1 = jnp.mean(jnp.abs(mel_of(y_g, n_frames) - mel_target))
            total = adv_gate * (adv + fm) + mel_weight * mel_l1
            return total, (adv, fm, mel_l1)

        (g_loss, (adv, fm, mel_l1)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.gen_params)
        g_updates, gen_opt_state = gen_opt.update(
            g_grads, state.gen_opt_state, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = state.replace(
            gen_params=gen_params, disc_params=disc_params,
            gen_opt_state=gen_opt_state, disc_opt_state=disc_opt_state,
            step=state.step + 1)
        losses = {"disc": d_loss, "gen": g_loss, "gen_adv": adv,
                  "gen_fm": fm, "gen_mel": mel_l1}
        return new_state, losses

    return step


def make_scanned_vocoder_step(inner, segment_size, hop, external_mel):
    """K GAN steps per dispatch over a device-resident waveform bank.

    Like the acoustic loop's scan mode (loop.py _train_scanned): per-step
    dispatch through a relay-attached TPU costs ~0.65 s/step (measured,
    docs/vocoder_training.md) vs tens of ms of compute.  The whole corpus
    lives on device as a zero-padded [N, L] bank (+[N, F, n_mels] mel bank
    when fine-tuning); the host supplies [K, B] clip indices and segment
    starts, and each scan step gathers its segments in-graph.
    """

    def scanned(state, bank, mel_bank, clips, starts):
        def gather(source, idx, start, length):
            return jax.vmap(
                lambda c, s: jax.lax.dynamic_slice_in_dim(
                    jnp.take(source, c, axis=0), s, length)
            )(idx, start)

        def body(state, xs):
            c, s = xs
            seg = gather(bank, c, s, segment_size)
            if external_mel:
                mel = gather(mel_bank, c, s // hop, segment_size // hop)
                state, losses = inner(state, seg, mel)
            else:
                state, losses = inner(state, seg)
            return state, losses

        state, seq = jax.lax.scan(body, state, (clips, starts))
        return state, seq

    return scanned


class FinetuneSampler:
    """Aligned (wav, mel) segment pairs from a preprocessed corpus.

    Requires `preprocessing.audio.save_trimmed_wav: true` at preprocess
    time (wav/<spk>-wav-<base>.npy, exactly n_frames*hop samples) and,
    for mel_source="pred", an export_mels.py run (mel_pred/ directory).
    """

    def __init__(self, preprocessed_path, segment_size=8192, hop_length=256,
                 mel_source="pred", seed=0, split=None):
        import glob

        self.segment_size = segment_size
        self.hop = hop_length
        self.n_frames = segment_size // hop_length
        # "mixed" interleaves GT-mel and predicted-mel pairs 50/50 per
        # batch element: the standard mitigation for GT-aligned
        # fine-tuning's copy-synthesis regression (the generator keeps
        # seeing clean mels while learning to invert predicted ones)
        mel_dirs = {"pred": ["mel_pred"], "gt": ["mel"],
                    "mixed": ["mel", "mel_pred"]}[mel_source]
        allowed = None
        if split:
            # restrict to utterances named in a metadata file (e.g.
            # train.txt) so held-out clips in the same feature dirs never
            # enter training (leave-one-out protocol, scripts/leave_one_out.py)
            allowed = set()
            with open(os.path.join(preprocessed_path, split)) as f:
                for line in f:
                    parts = line.rstrip("\n").split("|")
                    if len(parts) >= 2:
                        allowed.add(f"{parts[1]}-wav-{parts[0]}.npy")
        self.pairs = []
        for mel_dir in mel_dirs:
            for wav_path in sorted(glob.glob(
                    os.path.join(preprocessed_path, "wav", "*-wav-*.npy"))):
                if allowed is not None and \
                        os.path.basename(wav_path) not in allowed:
                    continue
                mel_path = os.path.join(
                    preprocessed_path, mel_dir,
                    os.path.basename(wav_path).replace("-wav-", "-mel-"))
                if os.path.exists(mel_path):
                    self.pairs.append((wav_path, mel_path))
        if not self.pairs:
            raise FileNotFoundError(
                f"no aligned wav/{'|'.join(mel_dirs)} pairs under "
                f"{preprocessed_path} (preprocess with save_trimmed_wav: "
                "true"
                + (" and run export_mels.py"
                   if mel_source != "gt" else "")
                + ")")
        self._rng = random.Random(seed)
        self._cache = {}

    def _load(self, pair):
        if pair not in self._cache:
            wav = np.load(pair[0]).astype(np.float32)
            mel = np.load(pair[1]).astype(np.float32)
            n = min(len(wav) // self.hop, mel.shape[0])
            self._cache[pair] = (wav[: n * self.hop], mel[:n])
        return self._cache[pair]

    def sample(self, batch_size):
        n_mels = self._load(self.pairs[0])[1].shape[1]
        wav_out = np.zeros((batch_size, self.segment_size), np.float32)
        mel_out = np.zeros((batch_size, self.n_frames, n_mels), np.float32)
        for b in range(batch_size):
            wav, mel = self._load(self._rng.choice(self.pairs))
            n = mel.shape[0]
            if n > self.n_frames:
                f = self._rng.randrange(n - self.n_frames)
                mel_out[b] = mel[f: f + self.n_frames]
                wav_out[b] = wav[f * self.hop: (f + self.n_frames) * self.hop]
            else:
                mel_out[b, :n] = mel
                wav_out[b, : n * self.hop] = wav
        return wav_out, mel_out


class TrimmedWavSampler:
    """Random fixed-length segments from a preprocessed corpus's trimmed
    wav bank (wav/<spk>-wav-<base>.npy), with the same `split` restriction
    as FinetuneSampler — mel_source="gt_wav": ground-truth training where
    the input mel is computed IN-GRAPH from the waveform, so waveform
    augmentation (speed perturbation) stays consistent with the mel."""

    def __init__(self, preprocessed_path, segment_size=8192, seed=0,
                 split=None):
        inner = FinetuneSampler(preprocessed_path, segment_size,
                                mel_source="gt", seed=seed, split=split)
        self.segment_size = segment_size
        self.paths = [w for w, _ in inner.pairs]
        self._rng = random.Random(seed)
        self._cache = {}

    def _load(self, path):
        if path not in self._cache:
            self._cache[path] = np.load(path).astype(np.float32)
        return self._cache[path]

    def sample(self, batch_size):
        out = np.zeros((batch_size, self.segment_size), np.float32)
        for b in range(batch_size):
            wav = self._load(self._rng.choice(self.paths))
            if len(wav) > self.segment_size:
                start = self._rng.randrange(len(wav) - self.segment_size)
                out[b] = wav[start:start + self.segment_size]
            else:
                out[b, :len(wav)] = wav
        return out


class SegmentSampler:
    """Random fixed-length waveform segments from a corpus directory laid
    out like the raw preprocessing corpus (<root>/<speaker>/*.wav)."""

    def __init__(self, wav_dir, segment_size=8192, sampling_rate=22050,
                 seed=0):
        self.segment_size = segment_size
        self.paths = []
        for dirpath, _, files in os.walk(wav_dir):
            for f in sorted(files):
                if f.endswith(".wav"):
                    self.paths.append(os.path.join(dirpath, f))
        if not self.paths:
            raise FileNotFoundError(f"no .wav under {wav_dir}")
        self.sampling_rate = sampling_rate
        self._rng = random.Random(seed)
        self._cache = {}

    def _load(self, path):
        if path not in self._cache:
            wav, _ = load_wav(path, target_sr=self.sampling_rate)
            self._cache[path] = np.asarray(wav, np.float32)
        return self._cache[path]

    def sample(self, batch_size):
        out = np.zeros((batch_size, self.segment_size), np.float32)
        for b in range(batch_size):
            wav = self._load(self._rng.choice(self.paths))
            if len(wav) > self.segment_size:
                start = self._rng.randrange(len(wav) - self.segment_size)
                out[b] = wav[start:start + self.segment_size]
            else:
                out[b, :len(wav)] = wav
        return out


def train_vocoder(wav_dir, out_dir, *, total_steps=1000, batch_size=16,
                  segment_size=8192, sampling_rate=22050,
                  learning_rate=2e-4, lr_decay=0.999, steps_per_epoch=1000,
                  log_step=100, save_step=1000, generator_config=None,
                  discriminator_config=None,
                  n_mel_channels=80, mel_fmax=8000.0, seed=0,
                  finetune_from=None, mel_source="pred", split=None,
                  init_generator_params=None, data_parallel=None,
                  scan_step=1, mel_weight=45.0, adv_warmup=0,
                  aug_gain_db=0.0, aug_speed=None,
                  log=print):
    """Train (or smoke-train) the native HiFi-GAN generator.

    finetune_from: path to a preprocessed corpus — trains on aligned
    (GT wav, mel) segment pairs (mel_source "pred" = acoustic-model
    exports from export_mels.py, "gt" = ground-truth mels) instead of
    computing the input mel from the waveform.  init_generator_params
    optionally warm-starts the generator (e.g. converted pretrained
    weights).  data_parallel > 1 shards the segment batch over a
    1-D device mesh (params replicated; XLA inserts the gradient
    all-reduce)."""
    from fastspeech2_tpu.training.checkpoint import save_checkpoint

    gen_cfg = dict(generator_config or {})
    arch = gen_cfg.pop("arch", None)
    gen_input_scale = 1.0
    if arch == "melgan":
        # trains the MelGAN generator (models/melgan.py) against the
        # same MPD+MSD discriminators and objective; the reference only
        # torch.hub-loads pretrained MelGAN weights (utils/model.py:46-56)
        from fastspeech2_tpu.models.melgan import MelGANGenerator

        gen = MelGANGenerator(**gen_cfg, n_mel_channels=n_mel_channels)
        gen_input_scale = 1.0 / float(np.log(10.0))
    elif "gen_istft_n_fft" in gen_cfg:
        # fast-variant generator (models/hifigan_istft.py); same io
        # contract, trains against the same MPD/MSD discriminators
        from fastspeech2_tpu.models.hifigan_istft import (
            HiFiGANiSTFTGenerator,
        )

        gen = HiFiGANiSTFTGenerator(**gen_cfg,
                                    n_mel_channels=n_mel_channels)
    else:
        # pin XLA resblocks for training even if 'auto' ever resolves to
        # the Pallas kernel: its backward is an XLA recompute, so
        # kernel-fwd + recompute-bwd would be strictly slower
        gen_cfg.setdefault("resblock_backend", "xla")
        gen = HiFiGANGenerator(**gen_cfg, n_mel_channels=n_mel_channels)
    disc = HiFiGANDiscriminators(**(discriminator_config or {}))
    mel_fn = MelSpectrogram(
        hop_length=256, n_mel_channels=n_mel_channels,
        sampling_rate=sampling_rate, mel_fmax=mel_fmax)
    hop = mel_fn.hop_length
    external_mel = finetune_from is not None and mel_source != "gt_wav"
    if aug_speed is not None and external_mel:
        raise ValueError(
            "aug_speed needs the input mel computed in-graph: use "
            "mel_source='gt_wav' (or from-scratch --wav_dir mode); "
            "external mels support gain augmentation only")
    # speed perturbation consumes longer source segments: the step
    # resamples [B, seg_ext] down/up to segment_size at r<=aug_speed[1]
    seg_ext = segment_size
    if aug_speed is not None:
        import math as _math

        seg_ext = int(_math.ceil(segment_size * aug_speed[1]))

    if external_mel:
        sampler = FinetuneSampler(finetune_from, segment_size, hop,
                                  mel_source, seed, split=split)
        seg0, mel0 = sampler.sample(batch_size)
        seg0, mel0 = jnp.asarray(seg0), jnp.asarray(mel0)
    else:
        if finetune_from is not None:
            sampler = TrimmedWavSampler(finetune_from, seg_ext, seed,
                                        split=split)
        else:
            sampler = SegmentSampler(wav_dir, seg_ext, sampling_rate, seed)
        seg0 = jnp.asarray(sampler.sample(batch_size))
        mel0 = mel_fn(seg0)[0][:, :, : segment_size // hop].transpose(
            0, 2, 1)
        seg0 = seg0[:, :segment_size]
    rng = jax.random.PRNGKey(seed)
    # explicit None check: an empty/malformed snapshot dict must fail
    # loudly at apply time, not silently fall back to random init
    gen_params = (init_generator_params if init_generator_params is not None
                  else gen.init(rng, mel0)["params"])
    disc_params = disc.init(rng, seg0)["params"]

    gen_opt, _ = make_vocoder_optimizer(
        learning_rate, lr_decay=lr_decay, steps_per_epoch=steps_per_epoch)
    disc_opt, _ = make_vocoder_optimizer(
        learning_rate, lr_decay=lr_decay, steps_per_epoch=steps_per_epoch)
    state = VocoderTrainState.create(gen_params, disc_params,
                                     gen_opt, disc_opt)

    # resume from the newest checkpoint in out_dir, if any (long GAN runs
    # get the same elastic-resume behavior as the acoustic trainer)
    from fastspeech2_tpu.training.checkpoint import (
        latest_step,
        restore_checkpoint,
    )

    start_step = latest_step(out_dir)
    if start_step is not None:
        state = restore_checkpoint(out_dir, jax.device_get(state),
                                   start_step)
        log(f"Resumed vocoder training from step {start_step}")
    else:
        start_step = 0

    batch_put = jnp.asarray
    if data_parallel and data_parallel > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from fastspeech2_tpu.parallel import make_mesh

        if batch_size % data_parallel:
            raise ValueError(
                f"batch_size {batch_size} not divisible by "
                f"data_parallel {data_parallel}")
        mesh = make_mesh(data=data_parallel, model=1)
        replicated = NamedSharding(mesh, P())
        batch_sharding = NamedSharding(mesh, P("data"))
        state = jax.device_put(state, replicated)

        def batch_put(x):
            return jax.device_put(np.asarray(x), batch_sharding)

    # the optimizers are pure functions of (learning_rate, lr_decay,
    # steps_per_epoch); with the value-hashable modules this key fully
    # identifies the trace, so repeated train_vocoder calls in one
    # process share it (utils/jit_cache.py)
    from fastspeech2_tpu.utils.jit_cache import cached_jit

    aug_kw = dict(aug_gain_db=aug_gain_db, aug_speed=aug_speed,
                  out_segment=segment_size, aug_seed=seed)
    step_fn = cached_jit(
        ("voc_train_step", gen, disc, mel_fn, learning_rate, lr_decay,
         steps_per_epoch, external_mel, mel_weight, gen_input_scale,
         adv_warmup, aug_gain_db, aug_speed, segment_size, seed),
        lambda: jax.jit(
            make_vocoder_train_step(gen, disc, mel_fn, gen_opt, disc_opt,
                                    mel_weight=mel_weight,
                                    external_mel=external_mel,
                                    gen_input_scale=gen_input_scale,
                                    adv_warmup=adv_warmup, **aug_kw),
            donate_argnums=0))

    os.makedirs(out_dir, exist_ok=True)

    if scan_step > 1:
        return _train_vocoder_scanned(
            scan_step, state, start_step, total_steps, batch_size,
            segment_size, hop, sampler, external_mel, gen, disc, mel_fn,
            gen_opt, disc_opt, learning_rate, lr_decay, steps_per_epoch,
            log_step, save_step, out_dir, data_parallel, seed, mel_weight,
            gen_input_scale, adv_warmup, aug_kw, seg_ext, log)

    for i in range(start_step + 1, total_steps + 1):
        if external_mel:
            wav, mel = sampler.sample(batch_size)
            state, losses = step_fn(state, batch_put(wav), batch_put(mel))
        else:
            wav = batch_put(sampler.sample(batch_size))
            state, losses = step_fn(state, wav)
        if i % log_step == 0 or i == total_steps:
            vals = {k: float(v) for k, v in losses.items()}
            log(f"Vocoder step {i}/{total_steps}: "
                + ", ".join(f"{k}={v:.4f}" for k, v in vals.items()))
        if i % save_step == 0 or i == total_steps:
            save_checkpoint(out_dir, state, step=i)
    return state


def _train_vocoder_scanned(scan_step, state, start_step, total_steps,
                           batch_size, segment_size, hop, sampler,
                           external_mel, gen, disc, mel_fn, gen_opt,
                           disc_opt, learning_rate, lr_decay,
                           steps_per_epoch, log_step, save_step, out_dir,
                           data_parallel, seed, mel_weight,
                           gen_input_scale, adv_warmup, aug_kw, seg_ext,
                           log):
    """Device-resident scanned GAN training (see make_scanned_vocoder_step).

    The corpus must fit in HBM as a padded bank: N * L_max floats
    (+ mel bank when fine-tuning) — e.g. full 24 h LJSpeech is ~2.6 GB,
    comfortably resident on one v5e chip."""
    import math

    from fastspeech2_tpu.training.checkpoint import save_checkpoint
    from fastspeech2_tpu.utils.jit_cache import cached_jit

    K = math.gcd(math.gcd(scan_step, log_step), save_step)
    if K <= 1:
        raise ValueError(
            f"scan_step {scan_step} shares no factor with log_step "
            f"{log_step} / save_step {save_step}")

    # ---- build the zero-padded device bank(s) + per-clip start ranges ----
    if external_mel:
        items = [sampler._load(p) for p in sampler.pairs]
        wavs = [w for w, _ in items]
        mels = [m for _, m in items]
        n_frames_seg = segment_size // hop
        f_max = max(max(m.shape[0] for m in mels), n_frames_seg)
        mel_bank = np.zeros((len(mels), f_max, mels[0].shape[1]),
                            np.float32)
        for i, m in enumerate(mels):
            mel_bank[i, : m.shape[0]] = m
        l_max = f_max * hop
        # frame-aligned start ranges (starts are multiples of hop)
        hi = np.array([max(m.shape[0] - n_frames_seg, 0) for m in mels])
    else:
        wavs = [sampler._load(p) for p in sampler.paths]
        l_max = max(max(len(w) for w in wavs), seg_ext)
        mel_bank = np.zeros((1, 1, 1), np.float32)  # unused placeholder
        hi = np.array([max(len(w) - seg_ext, 0) for w in wavs])
    bank = np.zeros((len(wavs), l_max), np.float32)
    for i, w in enumerate(wavs):
        bank[i, : len(w)] = w

    put = jnp.asarray
    sched_sharding = None
    if data_parallel and data_parallel > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = state.step.sharding.mesh  # set by the caller's device_put
        put = lambda x: jax.device_put(  # noqa: E731 — replicated banks
            np.asarray(x), NamedSharding(mesh, P()))
        sched_sharding = NamedSharding(mesh, P(None, "data"))
    bank_dev = put(bank)
    mel_bank_dev = put(mel_bank)
    log(f"vocoder scan mode: {len(wavs)} clips ({bank.nbytes / 1e6:.0f} MB"
        f"{' + mel bank' if external_mel else ''}) device-resident, "
        f"{K} steps/dispatch")

    inner = make_vocoder_train_step(gen, disc, mel_fn, gen_opt, disc_opt,
                                    mel_weight=mel_weight,
                                    external_mel=external_mel,
                                    gen_input_scale=gen_input_scale,
                                    adv_warmup=adv_warmup, **aug_kw)
    scanned = cached_jit(
        ("voc_scanned_step", gen, disc, mel_fn, learning_rate, lr_decay,
         steps_per_epoch, external_mel, K, segment_size, mel_weight,
         gen_input_scale, adv_warmup,
         tuple(sorted((k, v) for k, v in aug_kw.items())), seg_ext),
        lambda: jax.jit(
            make_scanned_vocoder_step(inner, seg_ext, hop,
                                      external_mel),
            donate_argnums=0))

    rng = np.random.RandomState(seed + start_step)
    i = start_step
    while i < total_steps:
        k = min(K, total_steps - i)
        clips = rng.randint(0, len(wavs), (k, batch_size))
        starts = (rng.random_sample((k, batch_size))
                  * (hi[clips] + 1)).astype(np.int64)
        if external_mel:
            starts = starts * hop  # frame-aligned wav offsets
        clips = clips.astype(np.int32)
        starts = starts.astype(np.int32)
        if sched_sharding is not None:
            clips = jax.device_put(clips, sched_sharding)
            starts = jax.device_put(starts, sched_sharding)
        state, seq = scanned(state, bank_dev, mel_bank_dev,
                             jnp.asarray(clips), jnp.asarray(starts))
        i += k
        if i % log_step == 0 or i == total_steps:
            vals = {kk: float(v[-1]) for kk, v in seq.items()}
            log(f"Vocoder step {i}/{total_steps}: "
                + ", ".join(f"{kk}={v:.4f}" for kk, v in vals.items()))
        if i % save_step == 0 or i == total_steps:
            save_checkpoint(out_dir, state, step=i)
    return state
