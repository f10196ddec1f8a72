"""FastSpeech 2 training loss (reference model/loss.py:5-92).

Same six scalars: total, mel L1, postnet-mel L1, pitch MSE, energy MSE,
log-duration MSE with targets log(d+1).  The reference's masked_select
(dynamic shapes) becomes a static masked mean: sum(err * keep) / sum(keep),
which is numerically identical.
"""

from typing import NamedTuple

import jax.numpy as jnp

from fastspeech2_tpu.configs.config import FastSpeech2Config
from fastspeech2_tpu.models.fastspeech2 import FastSpeech2Output
from fastspeech2_tpu.ops.masking import masked_mean


class LossOutput(NamedTuple):
    total: jnp.ndarray
    mel: jnp.ndarray
    postnet_mel: jnp.ndarray
    pitch: jnp.ndarray
    energy: jnp.ndarray
    duration: jnp.ndarray


def fastspeech2_loss(
    config: FastSpeech2Config,
    output: FastSpeech2Output,
    mel_targets,        # [B, T, n_mels]
    pitch_targets,      # [B, P] or [B, T]
    energy_targets,
    duration_targets,   # [B, P] int
    row_keep=None,      # [B] bool; False rows (loader pad-duplicates) are
                        # excluded from every masked mean (evaluate.py:48-51
                        # averages over true samples only)
) -> LossOutput:
    src_keep = ~output.src_pad_mask                     # [B, P]
    mel_keep = ~output.mel_pad_mask                     # [B, T'] (maybe truncated)
    if row_keep is not None:
        src_keep = src_keep & row_keep[:, None]
        mel_keep = mel_keep & row_keep[:, None]

    t = output.mel.shape[1]
    mel_targets = mel_targets[:, :t, :].astype(jnp.float32)

    log_duration_targets = jnp.log(duration_targets.astype(jnp.float32) + 1.0)

    def variance_keep(level):
        return src_keep if level == "phoneme_level" else mel_keep

    pitch_loss = masked_mean(
        (output.pitch_prediction.astype(jnp.float32)
         - pitch_targets.astype(jnp.float32)) ** 2,
        variance_keep(config.pitch_feature_level),
    )
    energy_loss = masked_mean(
        (output.energy_prediction.astype(jnp.float32)
         - energy_targets.astype(jnp.float32)) ** 2,
        variance_keep(config.energy_feature_level),
    )
    duration_loss = masked_mean(
        (output.log_duration_prediction.astype(jnp.float32)
         - log_duration_targets) ** 2,
        src_keep,
    )
    mel_loss = masked_mean(
        jnp.abs(output.mel.astype(jnp.float32) - mel_targets),
        mel_keep[:, :, None] & jnp.ones_like(mel_targets, dtype=bool),
    )
    postnet_mel_loss = masked_mean(
        jnp.abs(output.postnet_mel.astype(jnp.float32) - mel_targets),
        mel_keep[:, :, None] & jnp.ones_like(mel_targets, dtype=bool),
    )

    total = mel_loss + postnet_mel_loss + duration_loss + pitch_loss + energy_loss
    return LossOutput(
        total=total,
        mel=mel_loss,
        postnet_mel=postnet_mel_loss,
        pitch=pitch_loss,
        energy=energy_loss,
        duration=duration_loss,
    )
