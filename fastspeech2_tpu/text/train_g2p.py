"""Train the seq2seq OOV G2P on the mined lexicon.

    python -m fastspeech2_tpu.text.train_g2p \
        --lexicon lexicon/ljspeech-mined.txt \
        --out fastspeech2_tpu/text/data/g2p_seq2seq.npz

Holds out `--heldout` words (deterministic split) as a proxy-OOV eval
set, trains teacher-forced with label smoothing, reports word accuracy
and phone error rate on the held-out set for both this model and the
rule engine (text/letter_to_sound.py) it backs up, then writes float16
weights.  The whole dataset is device-resident; each dispatch runs one
epoch of optimizer steps via lax.scan (same relay-overhead fix as
training/loop.py scan mode).
"""

import argparse
import time

import numpy as np

from fastspeech2_tpu.text.neural_g2p import (
    MAX_PRON,
    PH_BOS,
    PH_PAD,
    N_PHONES,
    _model,
    encode_phones,
    encode_word,
    save_params,
)


def load_pairs(lexicon_path):
    pairs = []
    with open(lexicon_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            word, phones = parts[0], parts[1:]
            c = encode_word(word)
            if c is None or len(word) > 28 or len(phones) > MAX_PRON - 1:
                continue
            pairs.append((word, phones, c, encode_phones(phones)))
    return pairs


def split_pairs(pairs, heldout, seed=0):
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(pairs))
    held = [pairs[i] for i in order[:heldout]]
    train = [pairs[i] for i in order[heldout:]]
    return train, held


# English suffix phonology for data augmentation (conservative subset:
# only spellings formed by plain concatenation / silent-e handling, no
# consonant doubling).  Segment classes by final phone (stress stripped).
_VOICELESS = {"P", "T", "K", "F", "TH"}
_SIBILANT = {"S", "Z", "SH", "CH", "JH", "ZH"}


def augment_pairs(train_pairs, exclude_words):
    """Derive suffixed forms (plural/3rd-person -s/-es, -ing, -ed, -ly)
    from TRAIN-split bases with rule-derived pronunciations.  Surface
    forms already in the lexicon or in the held-out set are excluded, so
    augmentation can neither duplicate supervised entries nor leak
    held-out answers.  The stress pattern of the base carries over
    unchanged (these suffixes are stress-neutral in English)."""
    out = []
    for word, phones, _, _ in train_pairs:
        if not word.isalpha() or len(word) < 3 or not phones:
            continue
        last = phones[-1].rstrip("012")
        cands = []
        if last in _SIBILANT:
            cands.append((word + "es", phones + ["IH0", "Z"]))
        elif last in _VOICELESS:
            cands.append((word + "s", phones + ["S"]))
        elif not word.endswith("s"):
            cands.append((word + "s", phones + ["Z"]))
        ed = (["IH0", "D"] if last in {"T", "D"}
              else ["T"] if last in _VOICELESS else ["D"])
        if word[-1] == "e":
            # silent-e concatenation: bake -> baking / baked
            cands.append((word[:-1] + "ing", phones + ["IH0", "NG"]))
            cands.append((word + "d", phones + ed))
        elif word[-1] not in "aeiouy":
            # skip CVC endings (consonant doubling: stop -> stopped)
            cvc = (len(word) >= 3 and word[-2] in "aeiou"
                   and word[-3] not in "aeiou")
            if not cvc:
                cands.append((word + "ing", phones + ["IH0", "NG"]))
                cands.append((word + "ed", phones + ed))
        if word[-1] not in "aeiou" and last != "L" and not word.endswith(
                "ly"):
            cands.append((word + "ly", phones + ["L", "IY0"]))
        for w, ph in cands:
            if w in exclude_words or len(w) > 28 or len(ph) > MAX_PRON - 1:
                continue
            c = encode_word(w)
            if c is None:
                continue
            out.append((w, ph, c, encode_phones(ph)))
    return out


def phone_error_rate(ref, hyp):
    """Levenshtein distance over phone tokens / len(ref)."""
    m, n = len(ref), len(hyp)
    d = np.arange(n + 1, dtype=np.int32).copy()
    for i in range(1, m + 1):
        prev = d.copy()
        d[0] = i
        for j in range(1, n + 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1,
                       prev[j - 1] + (ref[i - 1] != hyp[j - 1]))
    return d[n] / max(m, 1)


def evaluate(decode_fn, held, label):
    refs = [phones for _, phones, _, _ in held]
    hyps = decode_fn([w for w, _, _, _ in held])
    pers = [phone_error_rate(r, h) for r, h in zip(refs, hyps)]
    acc = float(np.mean([r == h for r, h in zip(refs, hyps)]))
    per = float(np.mean(pers))
    # stress-blind scores: segmental correctness matters most for
    # intelligibility
    strip = lambda seq: [p.rstrip("012") for p in seq]  # noqa: E731
    acc_nostress = float(np.mean(
        [strip(r) == strip(h) for r, h in zip(refs, hyps)]))
    per_nostress = float(np.mean(
        [phone_error_rate(strip(r), strip(h))
         for r, h in zip(refs, hyps)]))
    print(f"[{label}] heldout n={len(held)}  word_acc={acc:.3f}  "
          f"PER={per:.3f}  (stress-blind acc={acc_nostress:.3f} "
          f"PER={per_nostress:.3f})")
    return {"word_acc": acc, "per": per, "word_acc_nostress": acc_nostress,
            "per_nostress": per_nostress}


def train(lexicon_path, out_path, *, heldout=500, epochs=300,
          batch_size=512, lr=1e-3, seed=0, dropout=0.0, augment=False,
          avg_frac=0.0, train_size=0, log=print):
    import jax
    import jax.numpy as jnp
    import optax

    pairs = load_pairs(lexicon_path)
    train_pairs, held = split_pairs(pairs, heldout, seed)
    if train_size and train_size < len(train_pairs):
        # learning-curve ablation: subsample the train set with a split
        # INDEPENDENT of `seed` so every size sees the same held-out set
        sub = np.random.RandomState(12345).permutation(
            len(train_pairs))[:train_size]
        train_pairs = [train_pairs[i] for i in sub]
    log(f"lexicon: {len(pairs)} usable entries "
        f"({len(train_pairs)} train / {len(held)} held out)")
    if augment:
        exclude = ({w for w, _, _, _ in pairs}
                   | {w for w, _, _, _ in held})
        aug = augment_pairs(train_pairs, exclude)
        log(f"augmentation: +{len(aug)} rule-derived suffixed forms")
        train_pairs = train_pairs + aug

    chars = jnp.asarray(np.stack([c for _, _, c, _ in train_pairs]))
    targets = np.stack([t for _, _, _, t in train_pairs])
    dec_in = np.zeros_like(targets)
    dec_in[:, 0] = PH_BOS
    dec_in[:, 1:] = targets[:, :-1]
    dec_in = jnp.asarray(dec_in)
    targets = jnp.asarray(targets)
    N = len(train_pairs)
    steps_per_epoch = N // batch_size

    model = _model(dropout=dropout)
    params = model.init(
        {"params": jax.random.PRNGKey(seed),
         "dropout": jax.random.PRNGKey(seed + 1)},
        chars[:2], dec_in[:2])["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log(f"G2P params: {n_params}")

    total_steps = epochs * steps_per_epoch
    opt = optax.adamw(optax.cosine_decay_schedule(lr, total_steps),
                      weight_decay=1e-4)
    opt_state = opt.init(params)

    def loss_fn(params, c, di, tg, drng):
        logits = model.apply({"params": params}, c, di,
                             deterministic=dropout == 0.0,
                             rngs={"dropout": drng})
        mask = (tg != PH_PAD)
        ls = optax.softmax_cross_entropy(
            logits, optax.smooth_labels(
                jax.nn.one_hot(tg, N_PHONES), 0.05))
        return (ls * mask).sum() / mask.sum()

    @jax.jit
    def epoch_fn(params, opt_state, order, drng):
        """One epoch: scan over [steps, batch] index schedule in-graph."""

        def body(carry, xs):
            params, opt_state = carry
            idx, i = xs
            c = jnp.take(chars, idx, axis=0)
            di = jnp.take(dec_in, idx, axis=0)
            tg = jnp.take(targets, idx, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, c, di, tg, jax.random.fold_in(drng, i))
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            (order, jnp.arange(order.shape[0])))
        return params, opt_state, losses.mean()

    rng = np.random.RandomState(seed)
    t0 = time.time()
    # Polyak averaging over the tail of training: running mean of
    # epoch-end params across the final avg_frac of epochs
    avg_start = epochs - int(epochs * avg_frac)
    avg_params, avg_n = None, 0
    for ep in range(1, epochs + 1):
        order = rng.permutation(N)[: steps_per_epoch * batch_size]
        order = jnp.asarray(
            order.reshape(steps_per_epoch, batch_size).astype(np.int32))
        params, opt_state, mean_loss = epoch_fn(
            params, opt_state, order,
            jax.random.fold_in(jax.random.PRNGKey(seed + 2), ep))
        if avg_frac > 0 and ep > avg_start:
            avg_n += 1
            if avg_params is None:
                avg_params = params
            else:
                w = 1.0 / avg_n
                avg_params = jax.tree_util.tree_map(
                    lambda a, p: a + w * (p - a), avg_params, params)
        if ep % 25 == 0 or ep == epochs:
            log(f"epoch {ep}/{epochs}: loss={float(mean_loss):.4f} "
                f"({time.time() - t0:.1f}s)")

    if avg_params is not None:
        params = avg_params
        log(f"Polyak-averaged the last {avg_n} epoch-end params")
    save_params(out_path, params)
    log(f"weights -> {out_path}")

    if not held:
        return None

    # ---- held-out evaluation: neural (greedy + beam) vs rule engine ----
    from fastspeech2_tpu.text.neural_g2p import NeuralG2P

    greedy = NeuralG2P(out_path, beam=1)
    evaluate(greedy.batch, held, "neural greedy")
    beam = NeuralG2P(out_path, beam=4)
    scores = evaluate(beam.batch, held, "neural beam4")

    from fastspeech2_tpu.text.letter_to_sound import letter_to_sound

    evaluate(lambda ws: [letter_to_sound(w) for w in ws], held, "rules")
    return scores


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lexicon", default="lexicon/ljspeech-mined.txt")
    p.add_argument("--out",
                   default="fastspeech2_tpu/text/data/g2p_seq2seq.npz")
    p.add_argument("--heldout", type=int, default=500)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--augment", action="store_true",
                   help="add rule-derived suffixed forms to training")
    p.add_argument("--avg_frac", type=float, default=0.0,
                   help="Polyak-average epoch-end params over this final "
                        "fraction of epochs")
    p.add_argument("--train_size", type=int, default=0,
                   help="subsample the train set to N entries (0 = all): "
                        "learning-curve ablation, same held-out split")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX platform in-process (the environment "
                        "overrides JAX_PLATFORMS; cpu lets curve runs "
                        "proceed while the chip is busy)")
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    train(args.lexicon, args.out, heldout=args.heldout, epochs=args.epochs,
          batch_size=args.batch_size, lr=args.lr, seed=args.seed,
          dropout=args.dropout, augment=args.augment,
          avg_frac=args.avg_frac, train_size=args.train_size)


if __name__ == "__main__":
    main()
