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
          batch_size=512, lr=1e-3, seed=0, log=print):
    import jax
    import jax.numpy as jnp
    import optax

    pairs = load_pairs(lexicon_path)
    train_pairs, held = split_pairs(pairs, heldout, seed)
    log(f"lexicon: {len(pairs)} usable entries "
        f"({len(train_pairs)} train / {len(held)} held out)")

    chars = jnp.asarray(np.stack([c for _, _, c, _ in train_pairs]))
    targets = np.stack([t for _, _, _, t in train_pairs])
    dec_in = np.zeros_like(targets)
    dec_in[:, 0] = PH_BOS
    dec_in[:, 1:] = targets[:, :-1]
    dec_in = jnp.asarray(dec_in)
    targets = jnp.asarray(targets)
    N = len(train_pairs)
    steps_per_epoch = N // batch_size

    model = _model()
    params = model.init(jax.random.PRNGKey(seed), chars[:2], dec_in[:2])[
        "params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log(f"G2P params: {n_params}")

    total_steps = epochs * steps_per_epoch
    opt = optax.adamw(optax.cosine_decay_schedule(lr, total_steps),
                      weight_decay=1e-4)
    opt_state = opt.init(params)

    def loss_fn(params, c, di, tg):
        logits = model.apply({"params": params}, c, di)
        mask = (tg != PH_PAD)
        ls = optax.softmax_cross_entropy(
            logits, optax.smooth_labels(
                jax.nn.one_hot(tg, N_PHONES), 0.05))
        return (ls * mask).sum() / mask.sum()

    @jax.jit
    def epoch_fn(params, opt_state, order):
        """One epoch: scan over [steps, batch] index schedule in-graph."""

        def body(carry, idx):
            params, opt_state = carry
            c = jnp.take(chars, idx, axis=0)
            di = jnp.take(dec_in, idx, axis=0)
            tg = jnp.take(targets, idx, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(params, c, di, tg)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), order)
        return params, opt_state, losses.mean()

    rng = np.random.RandomState(seed)
    t0 = time.time()
    for ep in range(1, epochs + 1):
        order = rng.permutation(N)[: steps_per_epoch * batch_size]
        order = jnp.asarray(
            order.reshape(steps_per_epoch, batch_size).astype(np.int32))
        params, opt_state, mean_loss = epoch_fn(params, opt_state, order)
        if ep % 25 == 0 or ep == epochs:
            log(f"epoch {ep}/{epochs}: loss={float(mean_loss):.4f} "
                f"({time.time() - t0:.1f}s)")

    save_params(out_path, params)
    log(f"weights -> {out_path}")

    if not held:
        return None

    # ---- held-out evaluation: neural vs rule engine ----
    from fastspeech2_tpu.text.neural_g2p import NeuralG2P

    neural = NeuralG2P(out_path)
    scores = evaluate(neural.batch, held, "neural")

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
    args = p.parse_args(argv)
    train(args.lexicon, args.out, heldout=args.heldout, epochs=args.epochs,
          batch_size=args.batch_size, lr=args.lr, seed=args.seed)


if __name__ == "__main__":
    main()
