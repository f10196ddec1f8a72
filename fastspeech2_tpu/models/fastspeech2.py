"""FastSpeech 2 acoustic model (reference model/fastspeech2.py:13-110).

encoder -> (+ speaker embedding) -> variance adaptor -> decoder ->
mel linear -> PostNet residual.  Fully static shapes: the caller fixes the
phone length P and frame length T per compilation (bucketed batching); all
data-dependence is carried by length vectors + masks.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp
from flax import linen as nn

from fastspeech2_tpu.configs.config import FastSpeech2Config
from fastspeech2_tpu.models.common import TorchDense
from fastspeech2_tpu.models.postnet import PostNet
from fastspeech2_tpu.models.transformer import Decoder, Encoder
from fastspeech2_tpu.models.variance import VarianceAdaptor
from fastspeech2_tpu.ops.masking import pad_mask_from_lengths


class FastSpeech2Output(NamedTuple):
    """Mirrors the reference's 10-tuple forward output
    (model/fastspeech2.py:99-110)."""

    mel: jnp.ndarray                # [B, T, n_mels] pre-PostNet
    postnet_mel: jnp.ndarray        # [B, T, n_mels]
    pitch_prediction: jnp.ndarray   # [B, P] or [B, T]
    energy_prediction: jnp.ndarray
    log_duration_prediction: jnp.ndarray  # [B, P]
    duration_rounded: jnp.ndarray   # [B, P] int
    src_pad_mask: jnp.ndarray       # [B, P] True = pad
    mel_pad_mask: jnp.ndarray       # [B, T] True = pad
    src_len: jnp.ndarray            # [B]
    mel_len: jnp.ndarray            # [B]


class FastSpeech2(nn.Module):
    config: FastSpeech2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        speakers,                     # [B] int
        texts,                        # [B, P] int phone IDs
        src_lens,                     # [B] int
        mels=None,                    # unused in forward; kept for API parity
        mel_lens=None,                # [B] int (training)
        max_mel_len: Optional[int] = None,   # static frame length T
        p_targets=None,               # [B, P] or [B, T]
        e_targets=None,
        d_targets=None,               # [B, P] int
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        p_offset: float = 0.0,   # see VarianceAdaptor: absolute-ratio
        e_offset: float = 0.0,   # control on z-scored features
        train: bool = False,
        truncate_decoder: bool = True,
        # True mirrors the reference's training-time truncation to
        # max_seq_len (transformer/Models.py:154-162); inference callers
        # pass False to reproduce the reference's eval-time PE extension
        # with NO truncation (Models.py:82-87,145-151) for one long
        # utterance.
    ) -> FastSpeech2Output:
        cfg = self.config
        max_src_len = texts.shape[1]
        src_pad_mask = pad_mask_from_lengths(src_lens, max_src_len)
        mel_pad_mask = (
            pad_mask_from_lengths(mel_lens, max_mel_len)
            if mel_lens is not None
            else None
        )
        deterministic = not train

        x = Encoder(
            vocab_size=cfg.vocab_size,
            n_layers=cfg.encoder_layer,
            n_head=cfg.encoder_head,
            d_model=cfg.encoder_hidden,
            d_inner=cfg.conv_filter_size,
            kernel_size=cfg.conv_kernel_size,
            dropout=cfg.encoder_dropout,
            dtype=self.dtype,
            attention_backend=cfg.attention_backend,
            ffn_backend=cfg.ffn_backend,
            remat=cfg.remat,
            name="encoder",
        )(texts, src_pad_mask, deterministic=deterministic)

        if cfg.multi_speaker:
            spk = nn.Embed(
                cfg.n_speaker, cfg.encoder_hidden,
                param_dtype=jnp.float32, dtype=self.dtype,
                name="speaker_emb",
            )(speakers)
            x = x + spk[:, None, :]

        (
            x,
            pitch_prediction,
            energy_prediction,
            log_duration_prediction,
            duration_rounded,
            mel_len,
            mel_pad_mask,
        ) = VarianceAdaptor(cfg, dtype=self.dtype, name="variance_adaptor")(
            x,
            src_pad_mask,
            mel_pad_mask=mel_pad_mask,
            max_mel_len=max_mel_len,
            pitch_target=p_targets,
            energy_target=e_targets,
            duration_target=d_targets,
            p_control=p_control,
            e_control=e_control,
            d_control=d_control,
            p_offset=p_offset,
            e_offset=e_offset,
            deterministic=deterministic,
        )

        x, mel_pad_mask = Decoder(
            n_layers=cfg.decoder_layer,
            n_head=cfg.decoder_head,
            d_model=cfg.decoder_hidden,
            d_inner=cfg.conv_filter_size,
            kernel_size=cfg.conv_kernel_size,
            dropout=cfg.decoder_dropout,
            max_seq_len=cfg.max_seq_len,
            dtype=self.dtype,
            attention_backend=cfg.attention_backend,
            ffn_backend=cfg.ffn_backend,
            remat=cfg.remat,
            name="decoder",
        )(x, mel_pad_mask, deterministic=deterministic,
          truncate_to_max_len=truncate_decoder)

        mel = TorchDense(cfg.n_mel_channels, dtype=self.dtype,
                         name="mel_linear")(x)
        # The reference's PostNet convolves an unmasked [B, T_ref] mel where
        # T_ref = max(mel_len) of the batch; frames beyond a sample's length
        # hold mel_linear's bias row, and beyond T_ref the conv sees zero
        # padding.  With a static T >= T_ref we reproduce that exactly by
        # zeroing frames >= max(mel_len) before the PostNet.
        t_idx = jnp.arange(mel.shape[1])
        beyond_batch_max = jnp.broadcast_to(
            t_idx[None, :] >= jnp.max(mel_len), mel.shape[:2])
        postnet_mel = mel + PostNet(
            n_mel_channels=cfg.n_mel_channels,
            embedding_dim=cfg.postnet_embedding_dim,
            kernel_size=cfg.postnet_kernel_size,
            n_convolutions=cfg.postnet_n_convolutions,
            dtype=self.dtype,
            name="postnet",
        )(mel, train=train, frame_mask=beyond_batch_max)

        return FastSpeech2Output(
            mel=mel,
            postnet_mel=postnet_mel,
            pitch_prediction=pitch_prediction,
            energy_prediction=energy_prediction,
            log_duration_prediction=log_duration_prediction,
            duration_rounded=duration_rounded,
            src_pad_mask=src_pad_mask,
            mel_pad_mask=mel_pad_mask,
            src_len=src_lens,
            mel_len=mel_len,
        )
