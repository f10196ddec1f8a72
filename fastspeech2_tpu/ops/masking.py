"""Mask utilities.

Convention follows the reference (utils/tools.py:91-99): a *pad mask* is True
at PADDED positions.  All model code uses this convention; losses invert it.
"""

import jax.numpy as jnp


def pad_mask_from_lengths(lengths, max_len):
    """[B] lengths -> [B, max_len] bool mask, True = padded position.

    `max_len` must be a static int (XLA static shapes).
    """
    ids = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return ids >= lengths[:, None]


def fill_masked(x, pad_mask, value=0.0):
    """Zero (or set) entries of x at padded positions.

    pad_mask broadcasts against x from the left: [B, L] mask works for
    [B, L] or [B, L, D] tensors.
    """
    if x.ndim == pad_mask.ndim + 1:
        pad_mask = pad_mask[..., None]
    return jnp.where(pad_mask, jnp.asarray(value, dtype=x.dtype), x)


def masked_mean(values, keep_mask):
    """Mean over elements where keep_mask is True (True = KEEP here).

    Equivalent to `values.masked_select(keep_mask).mean()` in the reference
    loss (model/loss.py:52-79) but with static shapes.
    """
    keep = keep_mask.astype(values.dtype)
    total = jnp.sum(values * keep)
    count = jnp.maximum(jnp.sum(keep), 1.0)
    return total / count
