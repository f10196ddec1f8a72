"""Variance adaptor: duration/pitch/energy predictors + length regulation.

Parity with the reference (model/modules.py:17-296) with two deliberate
changes:

* The length regulator is a static-shape segment gather
  (fastspeech2_tpu.ops.length_regulator) instead of a Python loop.
* The energy path honours `e_control` — the reference threads e_control to
  the adaptor but passes p_control to the energy branch
  (model/modules.py:124,146), making --energy_control a no-op.  We fix that
  (documented reference bug #1 in SURVEY.md).
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fastspeech2_tpu.configs.config import FastSpeech2Config
from fastspeech2_tpu.models.common import (
    TorchConv1d,
    TorchDense,
    TorchLayerNorm,
)
from fastspeech2_tpu.ops.length_regulator import length_regulate
from fastspeech2_tpu.ops.masking import fill_masked, pad_mask_from_lengths


class VariancePredictor(nn.Module):
    """conv(k)->ReLU->LN->dropout x2 -> linear -> squeeze, padded = 0
    (reference model/modules.py:197-250; note the second conv uses padding=1
    which equals SAME for the default kernel_size=3)."""

    filter_size: int
    kernel_size: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic=True):
        y = TorchConv1d(self.filter_size, self.kernel_size, dtype=self.dtype,
                        name="conv1d_1")(x)
        y = nn.relu(y)
        y = TorchLayerNorm(self.filter_size, dtype=self.dtype)(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = TorchConv1d(self.filter_size, self.kernel_size, dtype=self.dtype,
                        name="conv1d_2")(y)
        y = nn.relu(y)
        y = TorchLayerNorm(self.filter_size, dtype=self.dtype)(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = TorchDense(1, dtype=self.dtype, name="linear_layer")(y)
        y = jnp.squeeze(y, axis=-1)
        if pad_mask is not None:
            y = fill_masked(y, pad_mask)
        return y


def _make_bins(vmin, vmax, n_bins, quantization):
    if quantization == "log":
        edges = np.exp(np.linspace(np.log(vmin), np.log(vmax), n_bins - 1))
    else:
        edges = np.linspace(vmin, vmax, n_bins - 1)
    return jnp.asarray(edges, dtype=jnp.float32)


class VarianceAdaptor(nn.Module):
    """Reference model/modules.py:17-158 with static-shape length regulation."""

    config: FastSpeech2Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.duration_predictor = VariancePredictor(
            cfg.vp_filter_size, cfg.vp_kernel_size, cfg.vp_dropout,
            dtype=self.dtype)
        self.pitch_predictor = VariancePredictor(
            cfg.vp_filter_size, cfg.vp_kernel_size, cfg.vp_dropout,
            dtype=self.dtype)
        self.energy_predictor = VariancePredictor(
            cfg.vp_filter_size, cfg.vp_kernel_size, cfg.vp_dropout,
            dtype=self.dtype)
        self.pitch_bins = _make_bins(
            cfg.pitch_min, cfg.pitch_max, cfg.n_bins, cfg.pitch_quantization)
        self.energy_bins = _make_bins(
            cfg.energy_min, cfg.energy_max, cfg.n_bins,
            cfg.energy_quantization)
        self.pitch_embedding = nn.Embed(
            cfg.n_bins, cfg.encoder_hidden, param_dtype=jnp.float32,
            dtype=self.dtype)
        self.energy_embedding = nn.Embed(
            cfg.n_bins, cfg.encoder_hidden, param_dtype=jnp.float32,
            dtype=self.dtype)

    def _variance_embedding(self, predictor, embed, bins, x, target, pad_mask,
                            control, offset, deterministic):
        prediction = predictor(x, pad_mask, deterministic=deterministic)
        if target is not None:
            ids = jnp.searchsorted(bins, target.astype(jnp.float32),
                                   side="left")
            embedding = embed(ids)
        else:
            # control scales the predicted (normalized) variance like the
            # reference (model/modules.py:124,146); offset (default 0)
            # lets callers express ABSOLUTE Hz-/energy-ratio control on
            # z-scored features: z' = r*z + (r-1)*mean/std  <=>  v' = r*v
            # (synthesis/pipeline.py control_mode="absolute")
            prediction = prediction * control + offset
            ids = jnp.searchsorted(bins, prediction.astype(jnp.float32),
                                   side="left")
            embedding = embed(ids)
        return prediction, embedding

    def __call__(
        self,
        x,
        src_pad_mask,
        mel_pad_mask=None,
        max_mel_len: Optional[int] = None,
        pitch_target=None,
        energy_target=None,
        duration_target=None,
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        p_offset: float = 0.0,
        e_offset: float = 0.0,
        deterministic: bool = True,
    ):
        cfg = self.config
        log_duration_prediction = self.duration_predictor(
            x, src_pad_mask, deterministic=deterministic)

        pitch_prediction = energy_prediction = None
        if cfg.pitch_feature_level == "phoneme_level":
            pitch_prediction, emb = self._variance_embedding(
                self.pitch_predictor, self.pitch_embedding, self.pitch_bins,
                x, pitch_target, src_pad_mask, p_control, p_offset,
                deterministic)
            x = x + emb
        if cfg.energy_feature_level == "phoneme_level":
            energy_prediction, emb = self._variance_embedding(
                self.energy_predictor, self.energy_embedding,
                self.energy_bins, x, energy_target, src_pad_mask, e_control,
                e_offset, deterministic)
            x = x + emb

        if duration_target is not None:
            duration_rounded = duration_target
        else:
            # round FIRST, then scale and truncate: the reference computes
            # clamp(round(exp(log_d) - 1) * d_control, min=0) at
            # model/modules.py:132-135 and LengthRegulator.expand truncates
            # via int() (modules.py:186) — int() == floor after the clamp
            duration_rounded = jnp.floor(
                jnp.clip(
                    jnp.round(
                        jnp.exp(
                            log_duration_prediction.astype(jnp.float32))
                        - 1.0)
                    * d_control,
                    0,
                    None,
                )
            ).astype(jnp.int32)
            # padded phones must not emit frames
            duration_rounded = jnp.where(src_pad_mask, 0, duration_rounded)
        if max_mel_len is None:
            max_mel_len = cfg.max_seq_len
        x, mel_len = length_regulate(x, duration_rounded, max_mel_len)
        if duration_target is None or mel_pad_mask is None:
            mel_pad_mask = pad_mask_from_lengths(mel_len, max_mel_len)

        if cfg.pitch_feature_level == "frame_level":
            pitch_prediction, emb = self._variance_embedding(
                self.pitch_predictor, self.pitch_embedding, self.pitch_bins,
                x, pitch_target, mel_pad_mask, p_control, p_offset,
                deterministic)
            x = x + emb
        if cfg.energy_feature_level == "frame_level":
            energy_prediction, emb = self._variance_embedding(
                self.energy_predictor, self.energy_embedding,
                self.energy_bins, x, energy_target, mel_pad_mask, e_control,
                e_offset, deterministic)
            x = x + emb

        x = fill_masked(x, mel_pad_mask)
        return (
            x,
            pitch_prediction,
            energy_prediction,
            log_duration_prediction,
            duration_rounded,
            mel_len,
            mel_pad_mask,
        )
