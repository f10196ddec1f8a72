"""Training state pytree: params + PostNet batch stats + Adam state + step.

Replaces the reference's (nn.Module, ScheduledOptim) pair
(train.py:41-47); everything lives in one immutable pytree so a train step
is a pure sharded function and checkpointing is a single tree save.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, optimizer, step=0):
        return cls(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=optimizer.init(variables["params"]),
            step=jnp.asarray(step, jnp.int32),
        )

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    def num_params(self):
        return sum(
            x.size for x in jax.tree_util.tree_leaves(self.params)
        )
