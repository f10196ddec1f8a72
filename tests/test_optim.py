"""Noam schedule parity with the reference ScheduledOptim formula."""

import numpy as np

from fastspeech2_tpu.training.optim import noam_schedule


def _reference_lr(step, d_model, warmup, anneal_steps, anneal_rate):
    """Oracle of model/optimizer.py:33-43 (step = current_step AFTER the
    pre-update increment, i.e. 1-based)."""
    lr = min(np.power(step, -0.5), np.power(warmup, -1.5) * step)
    for s in anneal_steps:
        if step > s:
            lr = lr * anneal_rate
    return np.power(d_model, -0.5) * lr


def test_noam_matches_reference():
    d_model, warmup = 256, 4000
    anneal_steps, anneal_rate = (300000, 400000, 500000), 0.3
    sched = noam_schedule(d_model, warmup, anneal_steps, anneal_rate)
    for step in [1, 10, 1000, 3999, 4000, 4001, 100000, 300000, 300001,
                 450000, 500001, 899999]:
        # optax count is 0-based pre-update; reference step is 1-based.
        got = float(sched(step - 1))
        expect = _reference_lr(step, d_model, warmup, anneal_steps,
                               anneal_rate)
        np.testing.assert_allclose(got, expect, rtol=1e-6), step


def test_noam_peak_at_warmup():
    sched = noam_schedule(256, 4000)
    lrs = [float(sched(s)) for s in range(0, 20000, 500)]
    peak = int(np.argmax(lrs)) * 500
    assert abs(peak - 4000) <= 500


def test_mu_dtype_bfloat16_still_descends():
    """optimizer.mu_dtype: bfloat16 (the MFU lever in docs/tpu_notes.md)
    must keep Adam's trajectory close to fp32: same loss descent on a
    quadratic, m stored in bf16, nu untouched (fp32)."""
    import jax
    import jax.numpy as jnp
    import optax

    from fastspeech2_tpu.configs.config import OptimConfig
    from fastspeech2_tpu.training.optim import make_optimizer

    target = jnp.asarray(np.linspace(-1, 1, 64), jnp.float32)

    def loss(p):
        return jnp.mean(jnp.square(p - target))

    trajs = {}
    for mu in ("float32", "bfloat16"):
        opt, _ = make_optimizer(
            OptimConfig(warm_up_step=10, anneal_steps=(), mu_dtype=mu), 16)
        p = jnp.zeros(64)
        state = opt.init(p)
        if mu == "bfloat16":
            m_leaf = jax.tree_util.tree_leaves(
                [s.mu for s in state if hasattr(s, "mu")])[0]
            assert m_leaf.dtype == jnp.bfloat16
        losses = []
        for _ in range(200):
            g = jax.grad(loss)(p)
            u, state = opt.update(g, state, p)
            p = optax.apply_updates(p, u)
            losses.append(float(loss(p)))
        trajs[mu] = losses
    assert trajs["bfloat16"][-1] < trajs["bfloat16"][0] * 0.05
    np.testing.assert_allclose(
        trajs["bfloat16"][-1], trajs["float32"][-1],
        rtol=0.15, atol=1e-4)
