"""Corpus-scale readiness of the data path (VERDICT r2 item 7).

The bundled corpora are tiny; real LJSpeech is ~13k utterances
(/root/reference preprocessed metadata: 12,588 train + 512 val lines).
These tests pin that the bucketed loader handles that scale — census,
coverage, throughput — and that scan mode's HBM-budget fallback policy
(training/loop.py::_train_scanned) actually triggers and the per-step
path completes training.
"""

import os

import numpy as np
import pytest
import yaml

from fastspeech2_tpu.data import generate_corpus, synthetic_preprocess_config
from fastspeech2_tpu.data.dataset import BucketedLoader, FeatureDataset

N_UTTS = 13_000  # real-LJSpeech scale
VAL = 512


@pytest.fixture(scope="module")
def big_corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scale"))
    corpus = os.path.join(root, "corpus")
    generate_corpus(corpus, n_utterances=N_UTTS, n_speakers=1, seed=11,
                    val_size=VAL, n_mels=8)
    pre = synthetic_preprocess_config(corpus, n_mels=8)
    return root, corpus, pre


def test_loader_census_and_coverage_at_ljspeech_scale(big_corpus):
    """One epoch over 13k utterances: every utterance exactly once, every
    batch bucket-rounded, batch count matching the reference's grouped
    collate arithmetic (train.py:31-38, dataset.py:127-146)."""
    _, _, pre = big_corpus
    ds = FeatureDataset("train.txt", pre)
    assert len(ds) == N_UTTS - VAL

    batch_size, group_size = 16, 4
    loader = BucketedLoader(ds, batch_size=batch_size,
                            group_size=group_size, shuffle=True,
                            drop_last=True, text_bucket=8, mel_bucket=32)
    seen = []
    bucket_census = {}
    import time

    t0 = time.time()
    for batch in loader.epoch(0):
        texts = batch["texts"]
        mels = batch["mels"]
        assert texts.shape[0] == batch_size
        assert texts.shape[1] % 8 == 0, "text not bucket-rounded"
        assert mels.shape[1] % 32 == 0, "mel not bucket-rounded"
        bucket_census[(texts.shape[1], mels.shape[1])] = (
            bucket_census.get((texts.shape[1], mels.shape[1]), 0) + 1)
        seen.extend(batch["ids"][: batch.get("valid_count",
                                             len(batch["ids"]))])
    wall = time.time() - t0

    # drop_last drops only the final partial batch of each sorted group
    n = len(ds)
    group = batch_size * group_size
    expect = sum(min(group, n - s) // batch_size
                 for s in range(0, n, group))
    total_batches = sum(bucket_census.values())
    assert total_batches == expect
    assert len(seen) == total_batches * batch_size
    assert len(set(seen)) == len(seen), "an utterance appeared twice"
    # static-shape discipline: the bucket census must be small enough that
    # XLA compiles a handful of executables, not hundreds
    assert len(bucket_census) <= 40, bucket_census
    # throughput floor: loading+bucketing 12.5k utterances must not be the
    # bottleneck next to a ~13 ms train step (conservative CI bound)
    assert total_batches / wall > 20, (
        f"{total_batches} batches in {wall:.1f}s")


def test_loader_epoch_memory_stays_bounded(big_corpus):
    """The streaming path must hold O(batch) feature arrays, not the whole
    corpus: FeatureDataset caches phone IDs (tiny) but never features."""
    _, _, pre = big_corpus
    ds = FeatureDataset("train.txt", pre)
    loader = BucketedLoader(ds, batch_size=16, group_size=4, shuffle=False,
                            drop_last=True, text_bucket=8, mel_bucket=32)
    import tracemalloc

    tracemalloc.start()
    peak_batch = 0
    for i, batch in enumerate(loader.epoch(0)):
        peak_batch = max(peak_batch,
                         sum(np.asarray(v).nbytes
                             for v in batch.values()
                             if isinstance(v, np.ndarray)))
        if i >= 200:
            break
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # peak python-allocation must be a small multiple of one batch, not
    # corpus-sized (12.5k utts x ~20 KiB features ~ 250 MiB)
    assert peak < 50 * peak_batch + 32 * 2**20, (peak, peak_batch)


def _scan_workspace(tmp_path, budget_mb):
    root = str(tmp_path)
    corpus = os.path.join(root, "corpus")
    generate_corpus(corpus, n_utterances=24, n_speakers=1, seed=3,
                    val_size=4, n_mels=8)
    pre = synthetic_preprocess_config(corpus, n_mels=8)
    model = {
        "transformer": {
            "encoder_layer": 1, "encoder_head": 2, "encoder_hidden": 16,
            "decoder_layer": 1, "decoder_head": 2, "decoder_hidden": 16,
            "conv_filter_size": 32, "conv_kernel_size": [9, 1],
            "encoder_dropout": 0.2, "decoder_dropout": 0.2,
        },
        "variance_predictor": {"filter_size": 16, "kernel_size": 3,
                               "dropout": 0.5},
        "variance_embedding": {"pitch_quantization": "linear",
                               "energy_quantization": "linear",
                               "n_bins": 16},
        "postnet": {"embedding_dim": 16, "kernel_size": 5,
                    "n_convolutions": 3},
        "multi_speaker": False,
        "max_seq_len": 256,
        "vocoder": {"model": "none", "speaker": "LJSpeech"},
    }
    train = {
        "bucket": {"text": 24, "mel": 192},
        "path": {
            "ckpt_path": os.path.join(root, "ckpt"),
            "log_path": os.path.join(root, "log"),
            "result_path": os.path.join(root, "result"),
        },
        "optimizer": {
            "batch_size": 4, "betas": [0.9, 0.98], "eps": 1.0e-9,
            "weight_decay": 0.0, "grad_clip_thresh": 1.0,
            "grad_acc_step": 1, "warm_up_step": 10,
            "anneal_steps": [], "anneal_rate": 1.0,
        },
        "step": {
            "total_step": 8, "log_step": 4, "synth_step": 1000,
            "val_step": 1000, "save_step": 8, "scan_step": 4,
            "scan_hbm_budget_mb": budget_mb,
        },
    }
    return pre, model, train


def test_scan_mode_hbm_fallback_policy(tmp_path):
    """With a budget the stacked epoch cannot fit, scan mode must disable
    itself with a logged decision and the per-step path must finish."""
    import jax.numpy as jnp

    from fastspeech2_tpu.training.loop import train

    pre, model, train_cfg = _scan_workspace(tmp_path, budget_mb=0.05)
    logs = []
    state = train(pre, model, train_cfg, dtype=jnp.float32,
                  log=lambda m, *a, **k: logs.append(str(m)))
    assert int(state.step) == 8
    joined = "\n".join(logs)
    assert "scan mode disabled" in joined
    assert "falling back" in joined


def test_scan_mode_runs_within_budget(tmp_path):
    """Control: with a sufficient budget the scanned path engages."""
    import jax.numpy as jnp

    from fastspeech2_tpu.training.loop import train

    pre, model, train_cfg = _scan_workspace(tmp_path, budget_mb=512)
    logs = []
    state = train(pre, model, train_cfg, dtype=jnp.float32,
                  log=lambda m, *a, **k: logs.append(str(m)))
    joined = "\n".join(logs)
    # the full log goes into the assertion message: a one-off full-suite
    # failure once stopped at step 4 with no cause visible — if the loop
    # ever exits early again (e.g. a stray SIGTERM flipping the
    # preemption event), the "Received signal" log line will say so
    assert int(state.step) == 8, f"stopped early; train log:\n{joined}"
    assert "scan mode:" in joined and "device-resident" in joined, joined
    assert "scan mode disabled" not in joined, joined
