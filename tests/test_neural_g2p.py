"""Seq2seq OOV G2P: vocab/codec invariants, model shapes, a tiny overfit
run proving the trainer learns, and the greedy decoder contract.

(The shipped weights' held-out accuracy vs the rule engine is reported by
text/train_g2p.py at training time and recorded in PARITY.md; tests here
stay weight-free so the suite does not depend on a binary artifact.)
"""

import numpy as np

from fastspeech2_tpu.text.neural_g2p import (
    MAX_PRON,
    MAX_WORD,
    N_CHARS,
    N_PHONES,
    PH_BOS,
    PH_EOS,
    PH_PAD,
    _model,
    encode_phones,
    encode_word,
)


def test_char_encoding():
    e = encode_word("hello")
    assert e.shape == (MAX_WORD,)
    assert (e[:5] > 0).all() and (e[5:] == 0).all()
    assert encode_word("12 34") is None          # no encodable letters
    # apostrophes and hyphens are first-class (o'brien, re-enter)
    assert encode_word("o'brien") is not None
    long = encode_word("a" * 100)
    assert long.shape == (MAX_WORD,) and (long > 0).all()


def test_phone_encoding_roundtrip():
    t = encode_phones(["HH", "AH0", "L", "OW1"])
    assert t.shape == (MAX_PRON,)
    assert t[4] == PH_EOS and (t[5:] == PH_PAD).all()
    assert (t[:4] > 2).all()


def test_model_shapes():
    import jax
    import jax.numpy as jnp

    model = _model()
    chars = jnp.asarray(np.stack([encode_word("cat"), encode_word("dog")]))
    dec_in = jnp.zeros((2, MAX_PRON), jnp.int32).at[:, 0].set(PH_BOS)
    params = model.init(jax.random.PRNGKey(0), chars, dec_in)["params"]
    logits = model.apply({"params": params}, chars, dec_in)
    assert logits.shape == (2, MAX_PRON, N_PHONES)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert n < 1_500_000  # stays a committable artifact


def test_overfit_and_greedy_decode(tmp_path):
    """Trainer memorizes a 32-word lexicon; NeuralG2P round-trips it."""
    from fastspeech2_tpu.text.g2p import read_lexicon
    from fastspeech2_tpu.text.neural_g2p import NeuralG2P
    from fastspeech2_tpu.text.train_g2p import train

    lex = read_lexicon("lexicon/ljspeech-mined.txt")
    words = sorted(lex)[100:132]
    path = tmp_path / "mini.txt"
    with open(path, "w") as f:
        for w in words:
            f.write(w + "\t" + " ".join(lex[w]) + "\n")
    out = str(tmp_path / "g2p.npz")
    train(str(path), out, heldout=0, epochs=120, batch_size=16,
          lr=2e-3, log=lambda *_: None)
    g2p = NeuralG2P(out)
    hyps = g2p.batch(words)
    acc = np.mean([h == lex[w] for w, h in zip(words, hyps)])
    assert acc >= 0.9, (acc, list(zip(words, hyps))[:5])
    # single-word __call__ agrees with batch
    assert g2p(words[0]) == hyps[0]
    # unencodable input -> empty, not a crash
    assert g2p("123") == []
