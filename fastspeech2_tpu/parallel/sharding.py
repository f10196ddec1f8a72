"""Parameter partitioning rules (tensor parallelism).

Path-pattern -> PartitionSpec rules over the Flax param tree.  The FFT
blocks are Megatron-style sharded over the "model" axis: QKV projections
and FFN in-projections split their output (head / hidden) dimension, the
attention out-projection and FFN out-projection split their input dimension,
so each block needs exactly one all-reduce per sublayer — inserted by XLA
from these annotations.  Everything small (embeddings, predictors, postnet,
mel linear, norms) is replicated.
"""

import re

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from fastspeech2_tpu.parallel.mesh import MODEL_AXIS

# (path regex, spec for kernel-rank leaves). First match wins.
_RULES = [
    # attention QKV: Dense kernel [d_model, n_head*d_k] -> split columns
    (r".*slf_attn/(w_qs|w_ks|w_vs)/Dense_0/kernel", P(None, MODEL_AXIS)),
    (r".*slf_attn/(w_qs|w_ks|w_vs)/Dense_0/bias", P(MODEL_AXIS)),
    # attention out-proj: kernel [n_head*d_v, d_model] -> split rows
    (r".*slf_attn/fc/Dense_0/kernel", P(MODEL_AXIS, None)),
    # FFN conv1: kernel [k, d_model, d_hid] -> split hidden
    (r".*pos_ffn/w_1/Conv_0/kernel", P(None, None, MODEL_AXIS)),
    (r".*pos_ffn/w_1/Conv_0/bias", P(MODEL_AXIS)),
    # FFN conv2: kernel [k, d_hid, d_model] -> split input channels
    (r".*pos_ffn/w_2/Conv_0/kernel", P(None, MODEL_AXIS, None)),
]


def _path_str(path):
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_partition_spec(params):
    """PartitionSpec pytree matching `params`."""

    def spec_for(path, leaf):
        p = _path_str(path)
        for pattern, spec in _RULES:
            if re.fullmatch(pattern, p):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _normalize_spec(spec, mesh):
    """Drop mesh axes of size 1 from a spec.

    GSPMD canonicalizes size-1 axis annotations away in compiled outputs
    (P(None, 'model') on a model=1 mesh comes back as P()); annotating
    inputs with the already-canonical spec keeps step input and output
    shardings identical, so one executable serves every step instead of
    recompiling once the first output feeds back in.
    """
    axes = [None if (a is not None and mesh.shape[a] == 1) else a
            for a in spec]
    while axes and axes[-1] is None:
        axes.pop()
    return P(*axes)


def shard_variables(variables, mesh):
    """Device-put a variables pytree according to the partition rules.

    Non-param collections (batch_stats) are replicated.
    """
    specs = {
        k: (param_partition_spec(v) if k == "params"
            else jax.tree_util.tree_map(lambda _: P(), v))
        for k, v in variables.items()
    }
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, _normalize_spec(s, mesh)), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(variables, shardings), shardings
