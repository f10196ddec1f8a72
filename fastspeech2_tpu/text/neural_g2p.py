"""Trainable seq2seq grapheme-to-phoneme model (OOV fallback).

The reference's OOV path is the pretrained `g2p_en` neural model
(reference synthesize.py:36-43), unavailable offline.  This module is the
in-framework equivalent: a tiny transformer encoder-decoder (chars ->
ARPAbet-with-stress) trained on the mined LJSpeech lexicon
(lexicon/ljspeech-mined.txt, text/mine_lexicon.py).  It slots in ahead of
the rule engine (text/letter_to_sound.py) in g2p.py's OOV chain when a
weights file is present.

TPU-first design: static shapes everywhere (MAX_WORD chars in, MAX_PRON
tokens out), teacher-forced training as one jitted step over the whole
epoch via lax.scan (the entire lexicon is device-resident), greedy
decoding as a fixed-length lax.scan with causal masking — no Python in
the decode loop, one compile per batch bucket.
"""

import os

import numpy as np

from fastspeech2_tpu.text.cmudict import valid_symbols

# ---- vocabularies (fixed, generated — never edit by hand) ----
CHARS = list("abcdefghijklmnopqrstuvwxyz'-.")
CHAR_PAD = 0
CHAR_TO_ID = {c: i + 1 for i, c in enumerate(CHARS)}
N_CHARS = len(CHARS) + 1

PH_PAD, PH_BOS, PH_EOS = 0, 1, 2
PHONES = list(valid_symbols)
PH_TO_ID = {p: i + 3 for i, p in enumerate(PHONES)}
ID_TO_PH = {i + 3: p for i, p in enumerate(PHONES)}
N_PHONES = len(PHONES) + 3

MAX_WORD = 28
MAX_PRON = 28

DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__), "data",
                               "g2p_seq2seq.npz")


def encode_word(word):
    """word -> [MAX_WORD] char ids (0-padded), or None if unencodable."""
    ids = [CHAR_TO_ID.get(c) for c in word.lower()[:MAX_WORD]]
    ids = [i for i in ids if i is not None]
    if not ids:
        return None
    return np.asarray(ids + [CHAR_PAD] * (MAX_WORD - len(ids)), np.int32)


def encode_phones(phones):
    """[phones] -> [MAX_PRON] decoder target ids (EOS-terminated)."""
    ids = [PH_TO_ID[p] for p in phones if p in PH_TO_ID][: MAX_PRON - 1]
    ids = ids + [PH_EOS]
    return np.asarray(ids + [PH_PAD] * (MAX_PRON - len(ids)), np.int32)


def _model(dropout=0.0):
    """dropout > 0 regularizes training (rngs={"dropout": ...} required
    with deterministic=False); inference always runs deterministic, so
    the shipped weights file stays layout-compatible either way."""
    import flax.linen as nn
    import jax.numpy as jnp

    D, HEADS, LAYERS, FF = 128, 4, 2, 256

    class Block(nn.Module):
        causal: bool = False
        cross: bool = False

        @nn.compact
        def __call__(self, x, mask, ctx=None, ctx_mask=None,
                     deterministic=True):
            h = nn.LayerNorm()(x)
            h = nn.SelfAttention(
                num_heads=HEADS, qkv_features=D, dropout_rate=dropout,
                deterministic=deterministic)(h, mask=mask)
            x = x + h
            if self.cross:
                h = nn.LayerNorm()(x)
                h = nn.MultiHeadDotProductAttention(
                    num_heads=HEADS, qkv_features=D, dropout_rate=dropout,
                    deterministic=deterministic)(
                        h, nn.LayerNorm()(ctx), mask=ctx_mask)
                x = x + h
            h = nn.LayerNorm()(x)
            h = nn.Dense(FF)(h)
            h = nn.relu(h)
            h = nn.Dropout(dropout)(h, deterministic=deterministic)
            h = nn.Dense(D)(h)
            return x + h

    class G2PModel(nn.Module):
        """chars [B, Lc] + teacher tokens [B, Lp] -> logits [B, Lp, V]."""

        @nn.compact
        def __call__(self, chars, dec_in, deterministic=True):
            cmask = (chars != CHAR_PAD)
            pos_e = self.param(
                "pos_enc", nn.initializers.normal(0.02), (MAX_WORD, D))
            x = nn.Embed(N_CHARS, D, name="char_emb")(chars)
            x = x + pos_e[None, : chars.shape[1]]
            x = nn.Dropout(dropout)(x, deterministic=deterministic)
            enc_mask = nn.make_attention_mask(cmask, cmask)
            for i in range(LAYERS):
                x = Block(name=f"enc_{i}")(
                    x, enc_mask, deterministic=deterministic)
            enc = nn.LayerNorm(name="enc_norm")(x)

            dmask = (dec_in != PH_PAD)
            pos_d = self.param(
                "pos_dec", nn.initializers.normal(0.02), (MAX_PRON, D))
            y = nn.Embed(N_PHONES, D, name="ph_emb")(dec_in)
            y = y + pos_d[None, : dec_in.shape[1]]
            y = nn.Dropout(dropout)(y, deterministic=deterministic)
            causal = nn.make_causal_mask(dec_in)
            self_mask = nn.combine_masks(
                causal, nn.make_attention_mask(dmask, dmask))
            cross_mask = nn.make_attention_mask(dmask, cmask)
            for i in range(LAYERS):
                y = Block(cross=True, name=f"dec_{i}")(
                    y, self_mask, enc, cross_mask,
                    deterministic=deterministic)
            y = nn.LayerNorm(name="dec_norm")(y)
            return nn.Dense(N_PHONES, name="out")(y)

    return G2PModel()


class NeuralG2P:
    """Decoding inference wrapper around a trained weights file.

    beam > 1 runs a fixed-width beam search (static shapes, one jitted
    lax.scan — no Python in the loop); beam=1 is the greedy decoder.
    Beam 4 measures ~+2% held-out word accuracy over greedy on the mined
    lexicon (text/train_g2p.py report)."""

    def __init__(self, weights_path=DEFAULT_WEIGHTS, beam=4):
        import jax

        self.model = _model()
        self.params = load_params(weights_path)
        self.beam = int(beam)
        self._decode = jax.jit(
            self._decode_fn if self.beam <= 1 else self._beam_decode_fn)

    def _decode_fn(self, params, chars):
        import jax
        import jax.numpy as jnp

        B = chars.shape[0]

        def step(carry, t):
            dec_in = carry
            logits = self.model.apply({"params": params}, chars, dec_in)
            nxt = jnp.argmax(logits[:, t], axis=-1)  # [B]
            dec_in = dec_in.at[:, t + 1].set(
                jnp.where(dec_in[:, t + 1] == PH_PAD, nxt,
                          dec_in[:, t + 1]))
            return dec_in, nxt

        dec0 = jnp.zeros((B, MAX_PRON), jnp.int32).at[:, 0].set(PH_BOS)
        _, toks = jax.lax.scan(step, dec0, jnp.arange(MAX_PRON - 1))
        return toks.T  # [B, MAX_PRON-1]

    def _beam_decode_fn(self, params, chars):
        import jax
        import jax.numpy as jnp

        B, W, V = chars.shape[0], self.beam, N_PHONES
        NEG = jnp.float32(-1e9)
        # finished beams may only extend with PAD, at no score cost
        pad_row = jnp.full((V,), NEG).at[PH_PAD].set(0.0)
        chars_w = jnp.repeat(chars, W, axis=0)  # [B*W, Lc]

        def step(carry, t):
            dec, scores, done = carry     # [B,W,Lp] [B,W] [B,W]
            logits = self.model.apply(
                {"params": params}, chars_w, dec.reshape(B * W, MAX_PRON))
            logp = jax.nn.log_softmax(
                logits[:, t].reshape(B, W, V), axis=-1)
            logp = jnp.where(done[:, :, None], pad_row[None, None, :], logp)
            total = (scores[:, :, None] + logp).reshape(B, W * V)
            scores, flat_idx = jax.lax.top_k(total, W)     # [B, W]
            src = flat_idx // V                            # parent beam
            tok = (flat_idx % V).astype(jnp.int32)         # new token
            dec = jnp.take_along_axis(dec, src[:, :, None], axis=1)
            done = jnp.take_along_axis(done, src, axis=1)
            dec = dec.at[:, :, t + 1].set(
                jnp.where(done, dec[:, :, t + 1], tok))
            done = done | (tok == PH_EOS) | (tok == PH_PAD)
            return (dec, scores, done), ()

        dec0 = jnp.zeros((B, W, MAX_PRON), jnp.int32).at[:, :, 0].set(PH_BOS)
        # only beam 0 is live at t=0 so the W initial expansions differ
        scores0 = jnp.full((B, W), NEG).at[:, 0].set(0.0)
        done0 = jnp.zeros((B, W), bool)
        (dec, scores, _), _ = jax.lax.scan(
            step, (dec0, scores0, done0), jnp.arange(MAX_PRON - 1))
        best = jnp.argmax(scores, axis=1)                  # [B]
        return jnp.take_along_axis(
            dec, best[:, None, None], axis=1)[:, 0, 1:]    # [B, Lp-1]

    def __call__(self, word):
        """word -> [phone, ...] (empty when the word has no letters)."""
        return self.batch([word])[0]

    def batch(self, words):
        import jax.numpy as jnp

        enc = [encode_word(w) for w in words]
        keep = [i for i, e in enumerate(enc) if e is not None]
        out = [[] for _ in words]
        if not keep:
            return out
        chars = jnp.asarray(np.stack([enc[i] for i in keep]))
        toks = np.asarray(self._decode(self.params, chars))
        for row, i in enumerate(keep):
            phones = []
            for t in toks[row]:
                if t in (PH_EOS, PH_PAD):
                    break
                if int(t) in ID_TO_PH:
                    phones.append(ID_TO_PH[int(t)])
            out[i] = phones
        return out


def save_params(path, params):
    import jax

    os.makedirs(os.path.dirname(path), exist_ok=True)
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node, np.float16)

    walk("", jax.device_get(params))
    np.savez_compressed(path, **flat)


def load_params(path):
    import jax.numpy as jnp

    if not os.path.exists(path):
        raise FileNotFoundError(path)
    data = np.load(path)
    params = {}
    for key in data.files:
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key], jnp.float32)
    return params


def available(weights_path=DEFAULT_WEIGHTS):
    return os.path.exists(weights_path)
