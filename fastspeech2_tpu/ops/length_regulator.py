"""Static-shape length regulator.

The reference expands phoneme vectors by their durations with a per-utterance
Python loop plus dynamic concat/pad (model/modules.py:161-194) — a host sync
per step and hostile to XLA.  Here the expansion is a pure gather:

    cum[b, p]   = cumsum(durations)[b, p]
    phone(b, t) = searchsorted(cum[b], t, side='right')   # frames -> phones
    out[b, t]   = x[b, phone(b, t)]

`out` always has the caller-chosen static frame length `max_mel_len`; frames
past the utterance's total duration gather the last phone and are masked by
the returned mel lengths.  O(T log P) compare work, zero host syncs, fully
differentiable w.r.t. x (gradients scatter-add back to phones).
"""

import jax
import jax.numpy as jnp


def length_regulate(x, durations, max_mel_len):
    """Expand phone-level features to frame level.

    Args:
      x:          [B, P, D] phone features.
      durations:  [B, P] integer frame counts (0 allowed).
      max_mel_len: static int, output frame length.

    Returns:
      out:      [B, max_mel_len, D] frame features (frames beyond the total
                duration repeat the last phone; mask with mel_len).
      mel_len:  [B] int32 total frames, clipped to max_mel_len.
    """
    durations = durations.astype(jnp.int32)
    cum = jnp.cumsum(durations, axis=1)                      # [B, P]
    mel_len = jnp.minimum(cum[:, -1], max_mel_len)
    frames = jnp.arange(max_mel_len, dtype=jnp.int32)        # [T]
    # phone index for frame t = #cum entries <= t
    idx = jax.vmap(
        lambda c: jnp.searchsorted(c, frames, side="right")
    )(cum)                                                   # [B, T]
    idx = jnp.minimum(idx, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    return out, mel_len


def gather_index_from_durations(durations, max_mel_len):
    """Just the [B, T] frame->phone index map (for expanding scalar tracks)."""
    durations = durations.astype(jnp.int32)
    cum = jnp.cumsum(durations, axis=1)
    frames = jnp.arange(max_mel_len, dtype=jnp.int32)
    idx = jax.vmap(
        lambda c: jnp.searchsorted(c, frames, side="right")
    )(cum)
    return jnp.minimum(idx, durations.shape[1] - 1)
