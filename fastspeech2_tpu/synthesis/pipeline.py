"""Text -> waveform synthesis pipeline.

The TPU path: phone IDs (padded to a text bucket) -> one jitted acoustic
forward with a static max_mel_len -> one jitted HiFi-GAN forward -> trim by
mel_len.  Control ratios are traced scalars so sweeping p/e/d does not
recompile.  Mirrors synthesize.py + utils/tools.py:164-210 outputs: per
utterance a trimmed int16 wav and a mel/F0/energy png.
"""

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fastspeech2_tpu.data.dataset import round_up
from fastspeech2_tpu.synthesis.plotting import expand_by_duration, plot_mel
from fastspeech2_tpu.synthesis.vocoder import vocoder_infer
from fastspeech2_tpu.text import text_to_sequence
from fastspeech2_tpu.utils.jit_cache import cached_jit
from fastspeech2_tpu.text.g2p import (
    english_to_phones,
    mandarin_to_phones,
    read_lexicon,
)


class Synthesizer:
    def __init__(self, model, variables, config, preprocess_config,
                 vocoder=None, max_mel_len=None, text_bucket=16,
                 control_mode="reference", mesh=None,
                 snap_to_warm=False):
        """control_mode: how p/e control ratios are interpreted.

        - "reference": scale the PREDICTED (z-normalized) variance, the
          reference's semantics (model/modules.py:124,146).  On a
          z-scored feature this shifts additively in real units, so
          p_control=1.2 does NOT mean "+20% F0".
        - "absolute": scale the DENORMALIZED value — p_control=1.2 means
          F0 rises 20% in Hz, e_control likewise for energy.  Uses the
          corpus stats.json: z' = r*z + (r-1)*mean/std  <=>  v' = r*v.
          A strict superset of the reference's advertised control.

        mesh: optional jax.sharding.Mesh with a "data" axis — inference
        batches shard over it (params replicated, XLA splits the batch
        across chips); the batch bucket rounds up to the axis size.
        This is the multi-chip serving path (supersedes the reference's
        single-GPU inference, synthesize.py:19).

        snap_to_warm: serving mode — pad each dispatch UP to the
        smallest already-compiled (batch-bucket, text-bucket) shape
        instead of compiling the exact shape.  With the top combo
        pre-compiled (BatchingSynthesizer.warmup), no steady-path
        request ever pays a cold multi-second XLA compile; as the
        background warmup fills in smaller combos, padding waste decays
        to zero.  Off by default (one-shot CLI callers prefer exact
        shapes).
        """
        self.model = model
        self.variables = variables
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            replicated = NamedSharding(mesh, P())
            self.variables = jax.device_put(variables, replicated)
            if vocoder is not None and getattr(vocoder, "params", None) \
                    is not None:
                vocoder.params = jax.device_put(vocoder.params, replicated)
            self._batch_sharding = NamedSharding(mesh, P("data"))
            self._dp = mesh.shape["data"]
        self.config = config
        self.preprocess_config = preprocess_config
        self.vocoder = vocoder
        self.max_mel_len = max_mel_len or config.max_seq_len
        self.text_bucket = text_bucket
        self.control_mode = control_mode
        self._lexicon = None
        self._stats = None
        # warm-shape registry for snap_to_warm: {(batch_bucket, text_pad)}
        # of shapes whose executables exist (marked after every dispatch
        # at the default static mel length)
        self.snap_to_warm = snap_to_warm
        self._warm = set()
        import threading as _threading

        self._warm_lock = _threading.Lock()

        def _build_forward():
            @partial(jax.jit,
                     static_argnames=("max_mel_len", "truncate_decoder"))
            def _forward(variables, speakers, texts, src_lens, p, e, d,
                         p_off, e_off, max_mel_len, truncate_decoder=True):
                return model.apply(
                    variables, speakers, texts, src_lens,
                    max_mel_len=max_mel_len,
                    p_control=p, e_control=e, d_control=d,
                    p_offset=p_off, e_offset=e_off,
                    train=False, truncate_decoder=truncate_decoder,
                )

            return _forward

        # flax modules hash by value: equivalent Synthesizer instances in
        # one process share traces/executables (utils/jit_cache.py)
        self._forward = cached_jit(("pipeline_forward", model),
                                   _build_forward)

        # fused text->wav: one dispatch for acoustic + vocoder when the
        # vocoder exposes a jit-composable apply (HiFi-GAN/MelGAN)
        self._fused = None
        inner = getattr(vocoder, "raw_apply", None)
        if inner is not None:
            def _build_fused():
                @partial(jax.jit,
                         static_argnames=("max_mel_len",
                                          "truncate_decoder"))
                def _fused(variables, voc_params, speakers, texts,
                           src_lens, p, e, d, p_off, e_off, max_mel_len,
                           truncate_decoder=True):
                    out = model.apply(
                        variables, speakers, texts, src_lens,
                        max_mel_len=max_mel_len,
                        p_control=p, e_control=e, d_control=d,
                        p_offset=p_off, e_offset=e_off,
                        train=False, truncate_decoder=truncate_decoder)
                    wav = inner(voc_params, out.postnet_mel)
                    return wav, out

                return _fused

            # jit_key value-identifies the vocoder's traced apply; None
            # means uncacheable (e.g. folded evaluator closing over params)
            voc_key = getattr(vocoder, "jit_key", None)
            if voc_key is not None:
                self._fused = cached_jit(
                    ("pipeline_fused", model, voc_key), _build_fused)
            else:
                self._fused = _build_fused()

    # -- text frontends --------------------------------------------------

    @property
    def lexicon(self):
        if self._lexicon is None:
            path = self.preprocess_config["path"]["lexicon_path"]
            self._lexicon = (read_lexicon(path)
                             if os.path.exists(path) else {})
        return self._lexicon

    def _pack_batch(self, id_seqs, speakers):
        """Pad phone IDs to (batch-bucket, text-bucket) static shapes.

        The batch dim rounds up to a power of two so a serving coalescer
        (or any varying caller) hits a bounded set of compiled
        executables instead of one per batch size — measured on the
        relay, an unbucketed batch dim put a fresh multi-second compile
        in the p95 of a steady request load.  Padding rows duplicate
        row 0, so batch-max quantities (PostNet frame mask, extended
        mel-length re-dispatch) are unchanged; callers slice all
        per-sample outputs with the REAL batch count.
        """
        B = len(id_seqs)
        Bb = max(1, 1 << (B - 1).bit_length())
        if self._batch_sharding is not None:
            Bb = max(Bb, self._dp)  # divisible: both are powers of two
        P = round_up(max(len(s) for s in id_seqs), self.text_bucket)
        if self.snap_to_warm:
            Bb, P = self._snap(Bb, P)
        texts = np.zeros((Bb, P), np.int32)
        src_lens = np.zeros(Bb, np.int32)
        for b in range(Bb):
            s = id_seqs[b] if b < B else id_seqs[0]
            texts[b, : len(s)] = s
            src_lens[b] = len(s)
        if speakers is None:
            spk = np.zeros(Bb, np.int32)
        else:
            spk = np.asarray(speakers, np.int32)
            spk = np.concatenate(
                [spk, np.full(Bb - B, spk[0], np.int32)])
        return spk, texts, src_lens

    def _snap(self, Bb, P):
        """Smallest warm (batch, text) shape covering (Bb, P), else exact.

        Candidate cost ranks by padded work (text dim dominates: the
        static mel length is fixed, so extra text columns only grow the
        encoder).  If no warm shape covers the request, the exact shape
        is returned and its compile is paid once — after which it is
        warm (see _mark_warm)."""
        with self._warm_lock:
            if (Bb, P) in self._warm:
                return Bb, P
            covering = [(p, b) for (b, p) in self._warm
                        if b >= Bb and p >= P]
        if covering:
            p, b = min(covering)
            return b, p
        return Bb, P

    def _mark_warm(self, texts_shape):
        """Record a dispatched (batch, text) shape as compiled."""
        with self._warm_lock:
            self._warm.add((int(texts_shape[0]), int(texts_shape[1])))

    def warm_shape(self, batch, phones):
        """Compile the executable for an exact (batch, text-pad) shape.

        Used by serving warmup: dispatches dummy phone IDs at the padded
        shape through the same jitted path requests take, so the
        resulting executable is byte-identical to what a real request
        needs."""
        P = round_up(max(1, phones), self.text_bucket)
        ids = [np.ones(P, np.int32)] * max(1, batch)
        snap, self.snap_to_warm = self.snap_to_warm, False
        try:
            if self._fused is not None:
                speakers, texts, src_lens = self._pack_batch(ids, None)
                wav, out = self._fused(
                    self.variables, self.vocoder.params,
                    self._put(speakers), self._put(texts),
                    self._put(src_lens),
                    jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
                    jnp.float32(0.0), jnp.float32(0.0),
                    max_mel_len=self.max_mel_len)
                jax.block_until_ready(wav)
                self._mark_warm(texts.shape)
            else:
                self.infer_ids(ids)
        finally:
            self.snap_to_warm = snap

    def text_to_ids(self, text):
        pp = self.preprocess_config["preprocessing"]
        language = pp["text"]["language"]
        if language == "zh":
            phones = mandarin_to_phones(text, self.lexicon)
        else:
            phones = english_to_phones(text, self.lexicon)
        return np.asarray(
            text_to_sequence(phones, pp["text"]["text_cleaners"]),
            dtype=np.int32), phones

    # -- inference -------------------------------------------------------

    def _put(self, x):
        """Batch array -> device; under a mesh, sharded over "data"
        along dim 0 (PartitionSpec pads remaining dims as replicated)."""
        if self._batch_sharding is not None:
            return jax.device_put(np.asarray(x), self._batch_sharding)
        return jnp.asarray(x)

    def _control_offsets(self, p_control, e_control):
        """(p_offset, e_offset) for the active control_mode.

        In "absolute" mode, turn a denormalized ratio r into the
        z-space affine z' = r*z + (r-1)*mean/std using the corpus
        stats.json; only applies to features the preprocessor actually
        z-scored (normalization: True), else the ratio is already
        absolute and the offset stays 0.
        """
        if self.control_mode != "absolute":
            return 0.0, 0.0
        if self._stats is None:
            stats_path = os.path.join(
                self.preprocess_config["path"]["preprocessed_path"],
                "stats.json")
            with open(stats_path) as f:
                self._stats = json.load(f)
        pp = self.preprocess_config["preprocessing"]
        p_off = e_off = 0.0
        if pp["pitch"].get("normalization", False):
            mean, std = self._stats["pitch"][2:4]
            p_off = (p_control - 1.0) * mean / std
        if pp["energy"].get("normalization", False):
            mean, std = self._stats["energy"][2:4]
            e_off = (e_control - 1.0) * mean / std
        return p_off, e_off

    def _needed_mel_len(self, out):
        """Unclipped total predicted frames (duration_rounded is never
        truncated, so this sees past the static max_mel_len cap)."""
        return int(np.asarray(out.duration_rounded).sum(axis=1).max())

    def _extended_mel_len(self, need):
        # coarse 512-frame buckets bound the number of long-utterance
        # recompiles
        return round_up(need, 512)

    def infer_ids(self, id_seqs, speakers=None, p_control=1.0,
                  e_control=1.0, d_control=1.0):
        """id_seqs: list of int phone-ID arrays -> FastSpeech2Output.

        Utterances whose predicted duration exceeds the default static
        frame length are re-dispatched at a longer static length with
        decoder truncation OFF — the reference's eval behavior
        (transformer/Models.py:82-87,145-151: PE regenerated, no
        truncation at inference)."""
        B = len(id_seqs)
        p_off, e_off = self._control_offsets(p_control, e_control)
        speakers, texts, src_lens = self._pack_batch(id_seqs, speakers)
        out = self._forward(
            self.variables, self._put(speakers), self._put(texts),
            self._put(src_lens),
            jnp.float32(p_control), jnp.float32(e_control),
            jnp.float32(d_control),
            jnp.float32(p_off), jnp.float32(e_off),
            max_mel_len=self.max_mel_len,
        )
        self._mark_warm(texts.shape)
        need = self._needed_mel_len(out)
        if need > self.max_mel_len:
            out = self._forward(
                self.variables, self._put(speakers), self._put(texts),
                self._put(src_lens),
                jnp.float32(p_control), jnp.float32(e_control),
                jnp.float32(d_control),
                jnp.float32(p_off), jnp.float32(e_off),
                max_mel_len=self._extended_mel_len(need),
                truncate_decoder=False,
            )
        return out

    def synthesize(self, texts, speakers=None, p_control=1.0, e_control=1.0,
                   d_control=1.0):
        """list of raw strings -> (list of int16 wavs, FastSpeech2Output)."""
        id_seqs = [self.text_to_ids(t)[0] for t in texts]
        if self._fused is not None:
            B = len(id_seqs)
            p_off, e_off = self._control_offsets(p_control, e_control)
            speakers, texts_arr, src_lens = self._pack_batch(id_seqs,
                                                            speakers)
            wav_float, out = self._fused(
                self.variables, self.vocoder.params,
                self._put(speakers), self._put(texts_arr),
                self._put(src_lens),
                jnp.float32(p_control), jnp.float32(e_control),
                jnp.float32(d_control),
                jnp.float32(p_off), jnp.float32(e_off),
                max_mel_len=self.max_mel_len)
            self._mark_warm(texts_arr.shape)
            need = self._needed_mel_len(out)
            if need > self.max_mel_len:
                # re-dispatch at an extended static length, untruncated
                wav_float, out = self._fused(
                    self.variables, self.vocoder.params,
                    self._put(speakers), self._put(texts_arr),
                    self._put(src_lens),
                    jnp.float32(p_control), jnp.float32(e_control),
                    jnp.float32(d_control),
                    jnp.float32(p_off), jnp.float32(e_off),
                    max_mel_len=self._extended_mel_len(need),
                    truncate_decoder=False)
            pp = self.preprocess_config["preprocessing"]
            hop = pp["stft"]["hop_length"]
            max_wav_value = pp["audio"]["max_wav_value"]
            wavs_np = np.clip(
                np.asarray(wav_float, np.float32) * max_wav_value,
                -32768, 32767).astype(np.int16)
            mel_len = np.asarray(out.mel_len)
            wavs = [wavs_np[i, : int(mel_len[i]) * hop]
                    for i in range(B)]
            return wavs, out
        out = self.infer_ids(id_seqs, speakers, p_control, e_control,
                             d_control)
        mel_len = np.asarray(out.mel_len)
        wavs = None
        if self.vocoder is not None:
            # drop the batch-bucket padding rows (see _pack_batch)
            wavs = vocoder_infer(
                out.postnet_mel, self.vocoder, self.preprocess_config,
                lengths=mel_len)[: len(id_seqs)]
        return wavs, out

    def synthesize_long(self, text, speaker=0, p_control=1.0, e_control=1.0,
                        d_control=1.0, pause_ms=120.0):
        """Unlimited-length synthesis: split on sentence punctuation,
        synthesize chunks batched, join with short pauses.

        (The reference hard-truncates single-mode input at 100 characters,
        synthesize.py:203; this is the non-truncating superset.)
        """
        import re

        chunks = [c.strip() for c in
                  re.split(r"(?<=[.!?;:])\s+", text.strip()) if c.strip()]
        if not chunks:
            return np.zeros(0, np.int16), []
        speakers = np.full(len(chunks), speaker, np.int32)
        wavs, out = self.synthesize(
            chunks, speakers, p_control, e_control, d_control)
        sr = self.preprocess_config["preprocessing"]["audio"][
            "sampling_rate"]
        pause = np.zeros(int(sr * pause_ms / 1000.0), np.int16)
        pieces = []
        for i, w in enumerate(wavs):
            pieces.append(w)
            if i < len(wavs) - 1:
                pieces.append(pause)
        return np.concatenate(pieces), chunks

    # -- result files ----------------------------------------------------

    def save_results(self, ids, out, wavs, result_path):
        """Write <id>.wav + <id>.png for each utterance
        (utils/tools.py:164-210)."""
        os.makedirs(result_path, exist_ok=True)
        pp = self.preprocess_config["preprocessing"]
        sampling_rate = pp["audio"]["sampling_rate"]
        stats_path = os.path.join(
            self.preprocess_config["path"]["preprocessed_path"],
            "stats.json")
        if os.path.exists(stats_path):
            with open(stats_path) as f:
                stats = json.load(f)
            stats = stats["pitch"] + stats["energy"][:2]
        else:
            stats = [0.0, 1.0, 0.0, 1.0, 0.0, 1.0]

        from scipy.io import wavfile
        from matplotlib import pyplot as plt

        mel_len = np.asarray(out.mel_len)
        src_len = np.asarray(out.src_len)
        for i, basename in enumerate(ids):
            L, S = int(mel_len[i]), int(src_len[i])
            mel = np.asarray(out.postnet_mel)[i, :L].T
            duration = np.asarray(out.duration_rounded)[i, :S]
            pitch = np.asarray(out.pitch_prediction)[i]
            energy = np.asarray(out.energy_prediction)[i]
            if pp["pitch"]["feature"] == "phoneme_level":
                pitch = expand_by_duration(pitch[:S], duration)
            else:
                pitch = pitch[:L]
            if pp["energy"]["feature"] == "phoneme_level":
                energy = expand_by_duration(energy[:S], duration)
            else:
                energy = energy[:L]
            fig = plot_mel([(mel, pitch, energy)], stats,
                           ["Synthesized Spectrogram"])
            fig.savefig(os.path.join(result_path, f"{basename}.png"))
            plt.close(fig)
            if wavs is not None:
                wavfile.write(
                    os.path.join(result_path, f"{basename}.wav"),
                    sampling_rate, wavs[i])
