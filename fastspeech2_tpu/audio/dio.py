"""DIO + StoneMask F0 estimation in JAX (static shapes, jittable).

The reference extracts F0 with pyworld's DIO + StoneMask C extension at
preprocessing time (reference preprocessor/preprocessor.py:182-187).  This
module implements the same algorithm family natively:

DIO (Morise 2009, as implemented in WORLD's dio.cpp):
  1. band-limit the signal with Nuttall-window low-pass filters at
     half-octave cutoffs ``boundary = f0_floor * 2**((k+1)/2)``;
  2. in each band, read four period estimates per frame from the intervals
     between successive negative/positive zero crossings and peaks/dips;
  3. a band's candidate is the mean of the four, its score the relative
     deviation; the best-scoring band wins per frame;
  4. contour fixing: frames whose score is poor, whose F0 jumps more than
     ``allowed_range`` relative to the previous frame, or that sit in very
     short voiced runs are marked unvoiced.

StoneMask (WORLD's stonemask.cpp): each voiced frame is refined by the
amplitude-weighted mean of instantaneous frequencies at the first six
harmonics, where the instantaneous frequency is computed from the spectra
of a Blackman-windowed segment and its derivative-windowed counterpart.

Differences from pyworld (documented): there is no decimation before
filtering (pyworld's decimation is a speed optimization), and contour
fixing implements the jump-removal and short-run-removal steps but not
FixF0Contour's multi-pass section extension (steps 3-4) — on the
ground-truth accuracy suite (tests/test_dio_accuracy.py: glides, vibrato,
noise at 5-20 dB SNR, fades) voicing recall is already ~100% and voiced
p95 error ~1% at 5 dB SNR without it.  Interval tracks ARE linearly
interpolated between interval temporal midpoints, matching dio.cpp
GetF0CandidateContour's interp1 semantics.  Output contract is identical
to the reference path: one F0 value (Hz) per mel frame, 0.0 where
unvoiced.

Everything is vectorized with static shapes: event lookup uses
cumulative-max scans instead of event lists, StoneMask windows are padded
to the f0_floor-determined maximum length and masked.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp


def _nuttall(n, length):
    """Nuttall window value at integer position ``n`` of ``length`` points
    (WORLD's matlabfunctions.cpp NuttallWindow)."""
    t = 2.0 * jnp.pi * n / (length - 1)
    return (0.355768 - 0.487396 * jnp.cos(t)
            + 0.144232 * jnp.cos(2 * t) - 0.012604 * jnp.cos(3 * t))


def _lowpass(spec_y, fft_len, fs, cutoff):
    """Low-pass ``y`` (given as its rfft) with a Nuttall-window FIR whose
    support is 4 periods of the cutoff frequency (dio.cpp GetFilteredSignal)."""
    half = int(round(fs / cutoff * 2.0))
    length = 2 * half + 1
    n = jnp.arange(length, dtype=jnp.float32)
    w = _nuttall(n, length)
    w = w / jnp.sum(w)  # unit DC gain
    # zero-phase: window is symmetric; apply centered via roll in freq domain
    fw = jnp.fft.rfft(w, n=fft_len)
    freq = jnp.arange(fft_len // 2 + 1, dtype=jnp.float32)
    # undo the linear phase of the centered tap (delay = half samples)
    phase = jnp.exp(1j * 2.0 * jnp.pi * freq * half / fft_len)
    return spec_y * fw * phase


def _event_f0(x, frame_pos, fs):
    """Four interval-based F0 tracks evaluated at ``frame_pos`` samples.

    x: [T] band-limited signal.  Returns [4, F] F0 estimates in Hz
    (0 where no enclosing event pair exists), from the intervals between
    negative-going zero crossings, positive-going zero crossings, peaks,
    and dips (dio.cpp GetFourZeroCrossingIntervals).
    """
    dx = jnp.diff(x, append=x[-1:])

    def track(sig):
        s0 = sig[:-1]
        s1 = sig[1:]
        n = s0.shape[0]
        cross = (s0 > 0) & (s1 <= 0)                    # negative-going
        # fractional crossing position between t and t+1
        denom = s0 - s1
        frac = jnp.where(jnp.abs(denom) > 1e-12, s0 / denom, 0.5)
        pos = jnp.arange(n, dtype=jnp.float32) + frac
        idx = jnp.arange(n)
        # last crossing at or before t / first crossing after t
        prev_idx = jax.lax.associative_scan(
            jnp.maximum, jnp.where(cross, idx, -1))
        next_idx = jax.lax.associative_scan(
            jnp.minimum, jnp.where(cross, idx, n), reverse=True)
        fp = jnp.clip(frame_pos, 0, n - 1)
        j_i = prev_idx[fp]                               # crossing j
        k_i = next_idx[jnp.minimum(fp + 1, n - 1)]       # crossing j+1
        valid = (j_i >= 0) & (k_i < n)
        # neighbors for midpoint interpolation: crossings j-1 and j+2
        jm1_i = prev_idx[jnp.clip(j_i - 1, 0, n - 1)]
        kp1_i = next_idx[jnp.clip(k_i + 1, 0, n - 1)]
        p_j = pos[jnp.clip(j_i, 0, n - 1)]
        p_k = pos[jnp.clip(k_i, 0, n - 1)]
        p_jm1 = pos[jnp.clip(jm1_i, 0, n - 1)]
        p_kp1 = pos[jnp.clip(kp1_i, 0, n - 1)]
        # interval values at their temporal midpoints (dio.cpp
        # GetF0CandidateContour: interp1 over (midpoint, fs/interval))
        v_mid = fs / jnp.maximum(p_k - p_j, 1.0)
        m_mid = 0.5 * (p_j + p_k)
        v_left = fs / jnp.maximum(p_j - p_jm1, 1.0)
        m_left = 0.5 * (p_jm1 + p_j)
        v_right = fs / jnp.maximum(p_kp1 - p_k, 1.0)
        m_right = 0.5 * (p_k + p_kp1)
        has_left = valid & (jm1_i >= 0) & (jm1_i < j_i)
        has_right = valid & (kp1_i < n) & (kp1_i > k_i)
        t = fp.astype(jnp.float32)

        def lerp(t0, v0, t1, v1):
            w = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-6), 0.0, 1.0)
            return v0 + w * (v1 - v0)

        right_val = jnp.where(has_right,
                              lerp(m_mid, v_mid, m_right, v_right), v_mid)
        left_val = jnp.where(has_left,
                             lerp(m_left, v_left, m_mid, v_mid), v_mid)
        f0 = jnp.where(t >= m_mid, right_val, left_val)
        return jnp.where(valid, f0, 0.0)

    return jnp.stack([track(x), track(-x), track(dx), track(-dx)])


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _dio_candidates(y, fs, hop_length, f0_floor, f0_ceil):
    T = y.shape[0]
    n_frames = 1 + T // hop_length
    frame_pos = jnp.arange(n_frames) * hop_length

    fft_len = 1
    while fft_len < T + int(round(fs / f0_floor * 4.0)):
        fft_len *= 2
    # 50 Hz low-cut (dio.cpp applies one before candidate search)
    spec = jnp.fft.rfft(y - jnp.mean(y), n=fft_len)
    freq = jnp.arange(fft_len // 2 + 1) * (fs / fft_len)
    lowcut = jnp.clip((freq - 25.0) / 25.0, 0.0, 1.0)
    spec = spec * lowcut

    n_bands = int(math.ceil(math.log2(f0_ceil / f0_floor) * 2.0))
    cands, scores = [], []
    for k in range(n_bands):
        boundary = f0_floor * (2.0 ** ((k + 1) / 2.0))
        xk = jnp.fft.irfft(_lowpass(spec, fft_len, fs, boundary),
                           n=fft_len)[:T]
        est = _event_f0(xk, frame_pos, fs)               # [4, F]
        ok = jnp.all(est > 0, axis=0)
        mean = jnp.mean(est, axis=0)
        dev = jnp.sqrt(jnp.sum((est - mean) ** 2, axis=0) / 3.0)
        in_range = (mean >= max(f0_floor, boundary / 4.0)) & \
                   (mean <= f0_ceil) & (mean <= boundary * 1.1)
        good = ok & in_range
        score = jnp.where(good, dev / jnp.maximum(mean, 1e-6), jnp.inf)
        cands.append(mean)
        scores.append(score)
    cand = jnp.stack(cands)                              # [K, F]
    score = jnp.stack(scores)
    best = jnp.argmin(score, axis=0)
    f0 = jnp.take_along_axis(cand, best[None, :], 0)[0]
    best_score = jnp.take_along_axis(score, best[None, :], 0)[0]
    return f0, best_score


def _fix_contour(f0, score, allowed_range=0.1, score_max=0.15,
                 min_run=4):
    """Contour cleaning (dio.cpp FixF0Contour steps 1-2, vectorized):
    unreliable scores -> 0; relative jumps > allowed_range -> 0; voiced
    runs shorter than ``min_run`` frames -> 0."""
    voiced = (f0 > 0) & (score < score_max) & jnp.isfinite(score)
    f0 = jnp.where(voiced, f0, 0.0)
    prev = jnp.concatenate([f0[:1], f0[:-1]])
    jump = (prev > 0) & (f0 > 0) & \
        (jnp.abs(f0 - prev) / jnp.maximum(f0, 1e-6) > allowed_range)
    f0 = jnp.where(jump, 0.0, f0)
    # run-length of consecutive voiced frames via two scans
    v = (f0 > 0).astype(jnp.int32)
    idx = jnp.arange(v.shape[0])
    last_unvoiced = jax.lax.associative_scan(
        jnp.maximum, jnp.where(v == 0, idx, -1))
    next_unvoiced = jax.lax.associative_scan(
        jnp.minimum, jnp.where(v == 0, idx, v.shape[0]), reverse=True)
    run = next_unvoiced - last_unvoiced - 1
    return jnp.where(run >= min_run, f0, 0.0)


@partial(jax.jit, static_argnums=(2, 3, 4))
def _stonemask(y, f0, fs, hop_length, f0_floor):
    """Refine each voiced frame's F0 by the amplitude-weighted mean of
    instantaneous frequencies at harmonics 1..6 (stonemask.cpp)."""
    T = y.shape[0]
    n_frames = f0.shape[0]
    frame_pos = jnp.arange(n_frames) * hop_length

    j_max = int(math.ceil(1.5 * fs / f0_floor)) + 1
    fft_size = 1
    while fft_size < 2 * (2 * j_max + 1):
        fft_size *= 2

    safe_f0 = jnp.maximum(f0, f0_floor)
    half = jnp.floor(1.5 * fs / safe_f0).astype(jnp.int32) + 1  # [F]
    j = jnp.arange(-j_max, j_max + 1)                            # [W]
    in_win = jnp.abs(j)[None, :] <= half[:, None]                # [F, W]
    base_t = j[None, :] / fs                                     # seconds
    # Blackman window over +-1.5 periods (stonemask.cpp GetBaseIndex/
    # main_window)
    arg = 2.0 * jnp.pi * base_t * safe_f0[:, None] / 3.0
    w = (0.42 + 0.5 * jnp.cos(arg) + 0.08 * jnp.cos(2 * arg)) * in_win
    dw = jnp.pad(-(w[:, 2:] - w[:, :-2]) / 2.0, ((0, 0), (1, 1)))

    gather = jnp.clip(frame_pos[:, None] + j[None, :], 0, T - 1)
    seg = y[gather] * in_win                                     # [F, W]

    spec = jnp.fft.rfft(seg * w, n=fft_size, axis=-1)
    dspec = jnp.fft.rfft(seg * dw, n=fft_size, axis=-1)
    power = jnp.maximum(spec.real ** 2 + spec.imag ** 2, 1e-12)
    bin_freq = jnp.arange(fft_size // 2 + 1) * (fs / fft_size)
    inst = bin_freq[None, :] + (
        spec.real * dspec.imag - spec.imag * dspec.real
    ) / power * fs / (2.0 * jnp.pi)

    num = jnp.zeros_like(safe_f0)
    den = jnp.zeros_like(safe_f0)
    for k in range(1, 7):
        b = jnp.clip(jnp.round(k * safe_f0 * fft_size / fs).astype(jnp.int32),
                     0, fft_size // 2)
        amp = jnp.sqrt(jnp.take_along_axis(power, b[:, None], 1)[:, 0])
        ifk = jnp.take_along_axis(inst, b[:, None], 1)[:, 0]
        num = num + amp * ifk / k
        den = den + amp
    refined = num / jnp.maximum(den, 1e-12)
    good = (f0 > 0) & (refined > f0_floor * 0.9) & \
        (jnp.abs(refined - f0) < 0.35 * f0)
    return jnp.where(good, refined, jnp.where(f0 > 0, f0, 0.0))


def dio_f0(y, sampling_rate, hop_length, f0_floor: float = 71.0,
           f0_ceil: float = 800.0):
    """y: [T] float waveform -> [1 + T//hop_length] F0 (Hz, 0 = unvoiced).

    DIO candidate search + contour fix + StoneMask refinement; same output
    contract as :func:`yin_f0` and the reference's pyworld call
    (preprocessor/preprocessor.py:182-191).
    """
    y = jnp.asarray(y, jnp.float32)
    f0, score = _dio_candidates(y, int(sampling_rate), int(hop_length),
                                float(f0_floor), float(f0_ceil))
    f0 = _fix_contour(f0, score)
    return _stonemask(y, f0, int(sampling_rate), int(hop_length),
                      float(f0_floor))
