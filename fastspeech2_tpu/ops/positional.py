"""Sinusoidal positional encodings.

Same formula as the reference table (transformer/Models.py:10-30):
    angle(pos, j) = pos / 10000^(2*(j//2)/d)
    PE[pos, 2i]   = sin(angle), PE[pos, 2i+1] = cos(angle)

Computed directly in jnp for the static sequence length of the current
compilation — XLA constant-folds it, which subsumes both the reference's
precomputed table and its eval-time on-the-fly extension for long inputs
(transformer/Models.py:82-87,145-151).
"""

import jax.numpy as jnp
import numpy as np


def sinusoid_position_encoding(n_position, d_hid, dtype=jnp.float32):
    """[n_position, d_hid] sinusoid table (host numpy, folded at trace)."""
    pos = np.arange(n_position)[:, None]
    j = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2.0 * (j // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return jnp.asarray(table, dtype=dtype)
