"""Compact fp16 weight snapshots (params-only, npz).

Orbax checkpoints carry fp32 params + both Adam moments (334 MB for the
35M-param acoustic model) — right for resuming training, wrong for
shipping inference weights in-repo.  This stores just the variable
collections, fp16, in one npz (~66 MB for the acoustic model), with
flattened "collection/nested/path" keys.  Float leaves round-trip through
fp16 (inference-grade); integer leaves are stored as-is.

Used by scripts/save_weights_npz.py to persist natively trained weights
under weights/ (git-tracked — gitignored output/ does not survive
between build rounds).
"""

import os

import numpy as np

_SEP = "/"


def save_variables_npz(path, variables):
    """variables: Flax variables dict (e.g. {"params": ..., "batch_stats":
    ...}) -> compressed npz at path."""
    import jax

    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                if _SEP in k:
                    raise ValueError(f"key {k!r} contains {_SEP!r}")
                walk(f"{prefix}{_SEP}{k}" if prefix else k, v)
        else:
            a = np.asarray(jax.device_get(node))
            flat[prefix] = (a.astype(np.float16)
                            if np.issubdtype(a.dtype, np.floating) else a)

    walk("", variables)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez_compressed(path, **flat)


def load_variables_npz(path, dtype=np.float32):
    """npz -> nested variables dict; float leaves cast to ``dtype``."""
    data = np.load(path)
    variables = {}
    for key in data.files:
        node = variables
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        a = data[key]
        node[parts[-1]] = (a.astype(dtype)
                           if np.issubdtype(a.dtype, np.floating) else a)
    return variables
