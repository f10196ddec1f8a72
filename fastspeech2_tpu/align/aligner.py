"""Flat-start monophone forced aligner (Viterbi / segmental K-means).

The reference has no aligner: it requires users to run the external
Montreal Forced Aligner and drop TextGrids into preprocessed_data/
(reference README; preprocessor/preprocessor.py:163-167 then consumes
them).  This module closes that gap in-framework: given utterance audio
and its known phone sequence, it estimates per-phone durations in
training mel frames with no external tools or pretrained models.

Algorithm (the classic HTK flat-start recipe, hard-EM flavor):

1. Each tied phone type gets `n_states` left-to-right HMM states, each
   state a diagonal Gaussian over MFCC+delta features (features.py).
2. Flat start: frames are uniformly segmented across each utterance's
   state chain; Gaussians are estimated from that segmentation.
3. Iterate: batched Viterbi decode (one lax.scan over frames, max-plus
   transition matvec on the MXU) -> re-estimate Gaussians from the new
   hard alignment -> repeat until the total Viterbi log-likelihood
   stops improving.

State topology: the first state of every phone is mandatory (so every
phone gets >= 1 frame); the remaining states and *all* states of
optional-silence tokens are skippable.  Skips are encoded directly in a
per-utterance [M, M] log-transition mask, so the Viterbi inner loop is a
single `max(score[:, None] + trans, axis=0)` — compiler-friendly, no
data-dependent control flow.

Durations are exact partitions: per utterance they sum to the number of
mel frames, so downstream length regulation (ops/length_regulator.py)
needs no correction.
"""

import dataclasses
from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1.0e9          # "log zero" that stays NaN-free under arithmetic

SILENCES = ("sil", "sp", "spn", "")


def strip_stress(phone):
    """ARPAbet stress tie: IY0/IY1/IY2 share one set of Gaussians."""
    return phone.rstrip("0123456789")


@dataclasses.dataclass
class Utterance:
    """One alignment problem: features + known phone-token sequence."""

    feats: np.ndarray          # [T, D] CMVN'd features
    n_frames: int
    tokens: Sequence[str]      # phone strings, e.g. ["HH", "AH0", ...]
    optional: Sequence[bool]   # True = token may receive zero frames


@dataclasses.dataclass
class Alignment:
    durations: np.ndarray      # [n_tokens] int32 frames, sums to n_frames
    loglik: float              # Viterbi log-likelihood of the utterance


def _build_state_arrays(utts, type_of, key_of, n_states):
    """Pad per-utterance state chains to a common [B, M] layout."""
    b = len(utts)
    n_max = max(len(u.tokens) for u in utts)
    m = n_max * n_states
    state_type = np.zeros((b, m), np.int32)
    state_token = np.zeros((b, m), np.int32)
    state_skip = np.zeros((b, m), bool)
    state_valid = np.zeros((b, m), bool)
    for i, u in enumerate(utts):
        for j, tok in enumerate(u.tokens):
            for s in range(n_states):
                k = j * n_states + s
                state_type[i, k] = type_of[key_of(tok)] * n_states + s
                state_token[i, k] = j
                state_skip[i, k] = bool(u.optional[j]) or s > 0
                state_valid[i, k] = True
    return state_type, state_token, state_skip, state_valid


def _transition_masks(state_skip, state_valid):
    """[B, M, M] log-mask: 0 where i->j allowed (per frame), NEG otherwise.

    Allowed: self-loop j==i, or forward j>i with every valid state
    strictly between i and j skippable (this is what lets optional
    silences and surplus phone states take zero frames).
    """
    b, m = state_skip.shape
    mandatory = state_valid & ~state_skip
    # last_mand[j] = index of the last mandatory state < j (-1 if none)
    idx = np.arange(m)
    last_mand = np.full((b, m), -1, np.int64)
    for i in range(b):
        lm = -1
        for j in range(m):
            last_mand[i, j] = lm
            if mandatory[i, j]:
                lm = j
    i_idx = idx[None, :, None]
    j_idx = idx[None, None, :]
    # last_mand is indexed by j -> broadcast it over the i axis
    fwd = (i_idx < j_idx) & (i_idx >= last_mand[:, None, :])
    allowed = fwd | (i_idx == j_idx)
    allowed &= state_valid[:, :, None] & state_valid[:, None, :]
    trans = np.where(allowed, 0.0, NEG).astype(np.float32)

    # entry mask: states enterable at t=0 (nothing mandatory before them)
    init = state_valid & (last_mand == -1)
    # exit mask: nothing mandatory after them
    first_mand_after = np.full((b, m), m, np.int64)
    for i in range(b):
        fm = m
        for j in range(m - 1, -1, -1):
            first_mand_after[i, j] = fm
            if mandatory[i, j]:
                fm = j
    exit_ = state_valid & (first_mand_after == m)
    return trans, init, exit_


@partial(jax.jit, static_argnames=("var_floor",))
def _emissions(feats, state_type, means, variances, var_floor=0.01):
    """Diagonal-Gaussian log-likelihoods gathered per state.

    feats [B, T, D], state_type [B, M] -> [B, T, M].
    """
    var = jnp.maximum(variances, var_floor)
    # Quadratic expansion: ll = -0.5 x^2 . (1/var) + x . (mu/var) + const_k
    # -> two [B,T,D]x[D,K] matmuls (MXU) instead of a [B,T,K,D] broadcast.
    inv = 1.0 / var                                # [K, D]
    const = -0.5 * (means ** 2 * inv
                    + jnp.log(2.0 * jnp.pi * var)).sum(-1)   # [K]
    ll = (-0.5 * jnp.einsum("btd,kd->btk", feats ** 2, inv)
          + jnp.einsum("btd,kd->btk", feats, means * inv)
          + const[None, None])
    return jnp.take_along_axis(
        ll, state_type[:, None, :], axis=2)        # [B, T, M]


@jax.jit
def _viterbi_forward(emis, trans, init_mask, frame_mask):
    """Max-plus forward pass.

    emis [B, T, M], trans [B, M, M], init_mask [B, M] bool,
    frame_mask [B, T] bool.  Returns (final_scores [B, M],
    backptr [B, T, M] int32).
    """
    b, t_max, m = emis.shape
    score0 = jnp.where(init_mask, emis[:, 0], NEG)

    def step(score, inputs):
        e_t, live = inputs                          # [B, M], [B]
        cand = score[:, :, None] + trans            # [B, M(i), M(j)]
        best = cand.max(axis=1)
        bp = cand.argmax(axis=1).astype(jnp.int32)
        new = best + e_t
        # frames past the utterance end freeze the score (self bp)
        keep = live[:, None]
        new = jnp.where(keep, new, score)
        bp = jnp.where(keep, bp, jnp.arange(m, dtype=jnp.int32)[None, :])
        return new, bp

    final, bps = jax.lax.scan(
        step, score0,
        (emis.transpose(1, 0, 2)[1:], frame_mask.transpose(1, 0)[1:]))
    backptr = jnp.concatenate(
        [jnp.zeros((1, b, m), jnp.int32), bps], axis=0).transpose(1, 0, 2)
    return final, backptr


def _backtrack(final, backptr, exit_mask, n_frames):
    """Host-side path recovery (tiny: [T] ints per utterance)."""
    final = np.asarray(final)
    backptr = np.asarray(backptr)
    b, t_max, m = backptr.shape
    paths = np.zeros((b, t_max), np.int32)
    logliks = np.zeros((b,), np.float64)
    for i in range(b):
        t_end = int(n_frames[i]) - 1
        scores = np.where(exit_mask[i], final[i], NEG)
        j = int(scores.argmax())
        logliks[i] = scores[j]
        paths[i, t_end] = j
        for t in range(t_end, 0, -1):
            j = int(backptr[i, t, j])
            paths[i, t - 1] = j
    return paths, logliks


@partial(jax.jit, static_argnames=("n_gauss",))
def _accumulate(feats, paths, state_type, frame_mask, n_gauss):
    """Hard-EM sufficient statistics per tied Gaussian."""
    b, t_max, d = feats.shape
    gauss_id = jnp.take_along_axis(state_type, paths, axis=1)  # [B, T]
    gauss_id = jnp.where(frame_mask, gauss_id, n_gauss)        # pad bucket
    flat_id = gauss_id.reshape(-1)
    flat_x = feats.reshape(-1, d)
    counts = jax.ops.segment_sum(
        jnp.ones_like(flat_id, jnp.float32), flat_id, n_gauss + 1)
    sums = jax.ops.segment_sum(flat_x, flat_id, n_gauss + 1)
    sqsums = jax.ops.segment_sum(flat_x ** 2, flat_id, n_gauss + 1)
    return counts[:n_gauss], sums[:n_gauss], sqsums[:n_gauss]


def _update_gaussians(counts, sums, sqsums, var_floor):
    counts = np.asarray(counts)[:, None]
    sums, sqsums = np.asarray(sums), np.asarray(sqsums)
    seen = counts > 0
    means = np.where(seen, sums / np.maximum(counts, 1), 0.0)
    variances = np.where(
        seen, sqsums / np.maximum(counts, 1) - means ** 2, 1.0)
    return (means.astype(np.float32),
            np.maximum(variances, var_floor).astype(np.float32))


def _flat_start_paths(state_valid, n_frames):
    """Uniform frame->state segmentation for initialization."""
    b, m = state_valid.shape
    t_max = int(n_frames.max())
    paths = np.zeros((b, t_max), np.int32)
    for i in range(b):
        valid_idx = np.nonzero(state_valid[i])[0]
        t = int(n_frames[i])
        pos = np.minimum(
            (np.arange(t) * len(valid_idx)) // max(t, 1),
            len(valid_idx) - 1)
        paths[i, :t] = valid_idx[pos]
    return paths


class ForcedAligner:
    """Corpus-level flat-start aligner.

    >>> aligner = ForcedAligner(n_states=3)
    >>> results = aligner.align(utterances)   # list[Alignment]
    """

    def __init__(self, n_states=3, n_iters=10, var_floor=0.01,
                 tie_stress=True, tol=1e-3):
        self.n_states = n_states
        self.n_iters = n_iters
        self.var_floor = var_floor
        self.tie_stress = tie_stress
        self.tol = tol
        self.key_of = (strip_stress if tie_stress else (lambda p: p))
        self.type_of = None          # tied-phone-type -> index, after fit
        self.means = None            # [n_gauss, D], after fit
        self.variances = None

    # -- shared batch packing ------------------------------------------

    def _pack(self, utts):
        state_type, state_token, state_skip, state_valid = (
            _build_state_arrays(utts, self.type_of, self.key_of,
                                self.n_states))
        trans, init_mask, exit_mask = _transition_masks(
            state_skip, state_valid)
        n_frames = np.asarray([u.n_frames for u in utts], np.int32)
        t_max = int(n_frames.max())
        d = utts[0].feats.shape[-1]
        feats = np.zeros((len(utts), t_max, d), np.float32)
        for i, u in enumerate(utts):
            feats[i, : u.n_frames] = u.feats[: u.n_frames]
        frame_mask = np.arange(t_max)[None, :] < n_frames[:, None]
        return (jnp.asarray(feats), jnp.asarray(state_type), state_token,
                state_valid, jnp.asarray(trans), jnp.asarray(init_mask),
                exit_mask, jnp.asarray(frame_mask), n_frames)

    def _decode(self, feats_j, state_type_j, trans_j, init_j, exit_mask,
                mask_j, n_frames):
        emis = _emissions(feats_j, state_type_j, jnp.asarray(self.means),
                          jnp.asarray(self.variances),
                          var_floor=self.var_floor)
        final, backptr = _viterbi_forward(emis, trans_j, init_j, mask_j)
        return _backtrack(final, backptr, exit_mask, n_frames)

    # -- EM model fitting ----------------------------------------------

    def fit(self, utts: List[Utterance], phone_inventory=None,
            verbose=False):
        """Flat-start hard-EM on `utts`; stores the Gaussians.

        phone_inventory optionally predefines the tied-type table (so a
        model fitted on a corpus sample can later `transform` batches
        containing types absent from the sample — those keep the broad
        default Gaussian).  Returns the alignments of the fitted batch.
        """
        types = {self.key_of(t) for u in utts for t in u.tokens}
        if phone_inventory is not None:
            types |= {self.key_of(t) for t in phone_inventory}
        self.type_of = {p: i for i, p in enumerate(sorted(types))}
        n_gauss = len(self.type_of) * self.n_states

        (feats_j, state_type_j, state_token, state_valid, trans_j,
         init_j, exit_mask, mask_j, n_frames) = self._pack(utts)

        paths = _flat_start_paths(state_valid, n_frames)
        last_ll = -np.inf
        logliks = np.zeros(len(utts))
        for it in range(self.n_iters):
            counts, sums, sqsums = _accumulate(
                feats_j, jnp.asarray(paths), state_type_j, mask_j, n_gauss)
            self.means, self.variances = _update_gaussians(
                counts, sums, sqsums, self.var_floor)
            paths, logliks = self._decode(
                feats_j, state_type_j, trans_j, init_j, exit_mask, mask_j,
                n_frames)
            total = float(logliks.sum())
            if verbose:
                print(f"[align] iter {it}: loglik {total:.1f}")
            if total - last_ll < self.tol * max(abs(total), 1.0) and it > 1:
                break
            last_ll = total

        return self._paths_to_alignments(
            utts, paths, state_token, n_frames, logliks)

    def transform(self, utts: List[Utterance]):
        """Viterbi-align a batch with the already-fitted Gaussians."""
        if self.means is None:
            raise RuntimeError("call fit() before transform()")
        missing = {self.key_of(t) for u in utts for t in u.tokens} \
            - set(self.type_of)
        if missing:
            raise KeyError(
                f"phone types absent from the fitted model: {missing} "
                "(pass phone_inventory= to fit())")
        (feats_j, state_type_j, state_token, _, trans_j, init_j,
         exit_mask, mask_j, n_frames) = self._pack(utts)
        paths, logliks = self._decode(
            feats_j, state_type_j, trans_j, init_j, exit_mask, mask_j,
            n_frames)
        return self._paths_to_alignments(
            utts, paths, state_token, n_frames, logliks)

    def align(self, utts: List[Utterance], verbose=False):
        """One-shot fit+align (small-corpus convenience)."""
        return self.fit(utts, verbose=verbose)

    def _paths_to_alignments(self, utts, paths, state_token, n_frames,
                             logliks):
        out = []
        for i, u in enumerate(utts):
            tok_of_frame = state_token[i][paths[i, : n_frames[i]]]
            durations = np.bincount(
                tok_of_frame, minlength=len(u.tokens)).astype(np.int32)
            assert durations.sum() == u.n_frames
            out.append(Alignment(durations=durations,
                                 loglik=float(logliks[i])))
        return out
