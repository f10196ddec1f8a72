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
