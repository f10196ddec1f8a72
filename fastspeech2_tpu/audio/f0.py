"""Fundamental-frequency (F0) estimation on device.

The reference calls pyworld's DIO + StoneMask C extension at preprocessing
time (preprocessor/preprocessor.py:182-187) with frame_period =
hop_length/sr*1000 and default 71-800 Hz range.  pyworld is not available in
this environment, so this module provides a JAX YIN estimator (difference
function -> cumulative-mean normalization -> threshold + parabolic
interpolation) with the same output contract: one F0 value per mel frame,
Hz, 0.0 at unvoiced frames.  Downstream handling (linear interpolation over
unvoiced regions, phoneme averaging, normalization;
preprocessor/preprocessor.py:198-228) is estimator-agnostic.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def yin_f0(
    y,
    sampling_rate,
    hop_length,
    f0_floor: float = 71.0,
    f0_ceil: float = 800.0,
    threshold: float = 0.15,
):
    """y: [T] float waveform -> [n_frames] F0 (Hz, 0 = unvoiced).

    n_frames = 1 + T // hop_length, matching the centered mel framing.
    """
    tau_max = int(sampling_rate / f0_floor) + 1
    tau_min = max(2, int(sampling_rate / f0_ceil))
    window = 2 * tau_max  # integration window per frame

    pad = window // 2
    y = jnp.pad(y, (pad, pad + window))
    n_frames = 1 + (y.shape[0] - 2 * pad - window) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(window + tau_max)[None, :])
    frames = y[idx]                                   # [F, W + tau_max]

    # difference function d(tau) = r(0) + r_tau(0) - 2*corr(tau) via FFT
    x = frames
    x0 = x[:, :window]
    fft_len = 1
    while fft_len < (window + tau_max):
        fft_len *= 2
    fx = jnp.fft.rfft(x, n=fft_len, axis=-1)
    fx0 = jnp.fft.rfft(x0[:, ::-1], n=fft_len, axis=-1)
    corr = jnp.fft.irfft(fx * fx0, n=fft_len, axis=-1)[
        :, window - 1: window - 1 + tau_max + 1]      # corr[tau]

    cumsq = jnp.cumsum(x * x, axis=-1)
    r0 = cumsq[:, window - 1]
    sq = jnp.pad(cumsq, ((0, 0), (1, 0)))
    r_tau = (jnp.take_along_axis(
        sq, jnp.arange(tau_max + 1)[None, :] + window, axis=1)
        - jnp.take_along_axis(sq, jnp.arange(tau_max + 1)[None, :], axis=1))
    d = r0[:, None] + r_tau - 2.0 * corr              # [F, tau_max+1]
    d = jnp.maximum(d, 0.0)

    # cumulative-mean-normalized difference
    tau = jnp.arange(tau_max + 1, dtype=d.dtype)
    csum = jnp.cumsum(d[:, 1:], axis=-1)
    cmndf = jnp.concatenate(
        [jnp.ones((d.shape[0], 1), d.dtype),
         d[:, 1:] * tau[None, 1:] / jnp.maximum(csum, 1e-12)],
        axis=-1,
    )

    # first LOCAL MINIMUM of the cmndf in [tau_min, tau_max) that is under
    # the threshold (plain "first below threshold" stops on the falling
    # slope before the dip and biases F0 sharp); fall back to the global
    # argmin when nothing crosses the threshold.
    in_range = (tau[None, :] >= tau_min) & (tau[None, :] < tau_max)
    prev = jnp.concatenate([cmndf[:, :1], cmndf[:, :-1]], axis=-1)
    nxt = jnp.concatenate([cmndf[:, 1:], cmndf[:, -1:]], axis=-1)
    is_min = (cmndf <= prev) & (cmndf <= nxt)
    below = is_min & (cmndf < threshold) & in_range
    big = jnp.where(in_range, cmndf, jnp.inf)
    first_below = jnp.argmax(below, axis=-1)
    any_below = jnp.any(below, axis=-1)
    best = jnp.where(any_below, first_below, jnp.argmin(big, axis=-1))

    # parabolic interpolation around the minimum
    b_idx = jnp.clip(best, 1, tau_max - 1)
    dm = jnp.take_along_axis(cmndf, (b_idx - 1)[:, None], 1)[:, 0]
    d0 = jnp.take_along_axis(cmndf, b_idx[:, None], 1)[:, 0]
    dp = jnp.take_along_axis(cmndf, (b_idx + 1)[:, None], 1)[:, 0]
    denom = dm + dp - 2.0 * d0
    shift = jnp.where(
        jnp.abs(denom) > 1e-12, 0.5 * (dm - dp) / denom, 0.0)
    shift = jnp.clip(shift, -1.0, 1.0)
    tau_refined = b_idx.astype(d.dtype) + shift

    # silence gate: all-zero frames give d == 0 -> cmndf == 0 which would
    # read as "perfectly periodic"; require real signal energy.
    has_energy = r0 / window > 1e-9
    voiced = any_below & (d0 < 0.5) & has_energy
    f0 = jnp.where(voiced, sampling_rate / jnp.maximum(tau_refined, 1.0), 0.0)
    return f0


def interpolate_unvoiced(f0):
    """Linear interpolation over unvoiced (zero) frames
    (numpy port of preprocessor/preprocessor.py:198-207 semantics)."""
    import numpy as np

    f0 = np.asarray(f0, dtype=np.float64).copy()
    voiced = f0 > 0
    if not voiced.any():
        return f0
    idx = np.arange(len(f0))
    f0[~voiced] = np.interp(idx[~voiced], idx[voiced], f0[voiced])
    return f0
