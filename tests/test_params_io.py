"""fp16 npz weight snapshots (utils/params_io.py): roundtrip fidelity and
CLI integration — the tracked-weights mechanism that survives the wipe of
gitignored output/ between build rounds."""

import numpy as np

from fastspeech2_tpu.utils.params_io import (
    load_variables_npz,
    save_variables_npz,
)


def test_roundtrip_tree_and_dtypes(tmp_path):
    variables = {
        "params": {
            "dense": {"kernel": np.random.randn(8, 4).astype(np.float32),
                      "bias": np.zeros(4, np.float32)},
            "emb": {"embedding": np.random.randn(16, 8).astype(np.float32)},
        },
        "batch_stats": {"bn": {"mean": np.random.randn(4).astype(np.float32),
                               "var": np.ones(4, np.float32)}},
    }
    path = str(tmp_path / "w.npz")
    save_variables_npz(path, variables)
    back = load_variables_npz(path)
    assert set(back) == {"params", "batch_stats"}
    k = back["params"]["dense"]["kernel"]
    assert k.dtype == np.float32 and k.shape == (8, 4)
    # fp16 quantization: exact for fp16-representable values, <=2^-11 rel
    np.testing.assert_allclose(
        k, variables["params"]["dense"]["kernel"], rtol=1e-3, atol=1e-4)


def test_integer_leaves_preserved_exactly(tmp_path):
    variables = {"params": {"table": np.arange(100, dtype=np.int32)}}
    path = str(tmp_path / "w.npz")
    save_variables_npz(path, variables)
    back = load_variables_npz(path)
    assert back["params"]["table"].dtype == np.int32
    np.testing.assert_array_equal(back["params"]["table"], np.arange(100))


def test_model_snapshot_drives_inference(tmp_path):
    """Save a tiny FastSpeech2's variables, reload, and run the forward:
    the snapshot must carry every collection inference needs (params AND
    PostNet batch_stats)."""
    import jax
    import jax.numpy as jnp

    from fastspeech2_tpu.models import FastSpeech2
    from tests.helpers import tiny_config

    cfg = tiny_config()
    model = FastSpeech2(cfg)
    rng = jax.random.PRNGKey(0)
    texts = jnp.asarray(np.random.RandomState(0).randint(1, 300, (2, 8)),
                        jnp.int32)
    lens = jnp.asarray([8, 6])
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((2,), jnp.int32), texts, lens,
                           max_mel_len=32, train=False)
    path = str(tmp_path / "acoustic.npz")
    save_variables_npz(path, variables)
    back = jax.tree_util.tree_map(jnp.asarray, load_variables_npz(path))
    out = model.apply(back, jnp.zeros((2,), jnp.int32), texts, lens,
                      max_mel_len=32, train=False)
    ref = model.apply(variables, jnp.zeros((2,), jnp.int32), texts, lens,
                      max_mel_len=32, train=False)
    assert out.postnet_mel.shape == ref.postnet_mel.shape
    np.testing.assert_allclose(np.asarray(out.postnet_mel),
                               np.asarray(ref.postnet_mel),
                               rtol=0.05, atol=0.05)
