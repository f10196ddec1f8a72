"""Shared test helpers: tiny model config + synthetic batches."""

import numpy as np

from fastspeech2_tpu.configs.config import FastSpeech2Config


def tiny_config(**overrides):
    kw = dict(
        encoder_layer=1,
        decoder_layer=1,
        encoder_head=2,
        decoder_head=2,
        encoder_hidden=16,
        decoder_hidden=16,
        conv_filter_size=32,
        conv_kernel_size=(9, 1),
        vp_filter_size=16,
        n_bins=16,
        postnet_embedding_dim=16,
        postnet_n_convolutions=3,
        n_mel_channels=8,
        max_seq_len=64,
        pitch_min=-2.0,
        pitch_max=9.0,
        energy_min=-1.5,
        energy_max=8.0,
    )
    kw.update(overrides)
    return FastSpeech2Config(**kw)


def synthetic_batch(cfg, B=4, P=10, T=40, seed=0):
    """A teacher-forced training batch with consistent lengths/durations."""
    rng = np.random.RandomState(seed)
    src_lens = rng.randint(P // 2, P + 1, size=B)
    texts = rng.randint(1, cfg.vocab_size - 1, size=(B, P))
    durations = rng.randint(1, 4, size=(B, P))
    for b in range(B):
        texts[b, src_lens[b]:] = 0
        durations[b, src_lens[b]:] = 0
        # keep total within T
        while durations[b].sum() > T:
            durations[b, durations[b].argmax()] -= 1
    mel_lens = durations.sum(1)
    mels = rng.randn(B, T, cfg.n_mel_channels).astype(np.float32)
    for b in range(B):
        mels[b, mel_lens[b]:] = 0.0
    var_len = P if cfg.pitch_feature_level == "phoneme_level" else T
    pitches = rng.uniform(cfg.pitch_min, cfg.pitch_max,
                          size=(B, var_len)).astype(np.float32)
    energies = rng.uniform(cfg.energy_min, cfg.energy_max,
                           size=(B, var_len)).astype(np.float32)
    return {
        "speakers": np.zeros(B, np.int32),
        "texts": texts.astype(np.int32),
        "src_lens": src_lens.astype(np.int32),
        "mels": mels,
        "mel_lens": mel_lens.astype(np.int32),
        "pitches": pitches,
        "energies": energies,
        "durations": durations.astype(np.int32),
    }


_INIT_CACHE = {}


def init_variables(model, batch, seed=0):
    """Jitted + memoized FastSpeech2 init.

    An UNJITTED model.init costs ~10 s on this single-core CPU (per-op
    dispatch overhead — measured vs 0.12 s for 29 jitted train steps),
    which silently dominated the suite's wall time.  jit makes it ~1-2 s
    via the persistent compile cache; memoization makes repeats free
    (jax arrays are immutable, so sharing the pytree across tests is
    safe).
    """
    import jax
    import jax.numpy as jnp

    key = (repr(model.config), str(model.dtype), seed,
           tuple((k, v.shape) for k, v in sorted(batch.items())))
    if key not in _INIT_CACHE:
        rng = jax.random.PRNGKey(seed)
        _INIT_CACHE[key] = jax.jit(
            model.init, static_argnames=("max_mel_len", "train"))(
            {"params": rng, "dropout": rng},
            jnp.asarray(batch["speakers"]),
            jnp.asarray(batch["texts"]),
            jnp.asarray(batch["src_lens"]),
            mels=jnp.asarray(batch["mels"]),
            mel_lens=jnp.asarray(batch["mel_lens"]),
            max_mel_len=batch["mels"].shape[1],
            p_targets=jnp.asarray(batch["pitches"]),
            e_targets=jnp.asarray(batch["energies"]),
            d_targets=jnp.asarray(batch["durations"]),
            train=True,
        )
    return _INIT_CACHE[key]
