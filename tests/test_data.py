"""Data pipeline tests: synthetic corpus round-trip, bucketed batching."""

import numpy as np
import pytest

from fastspeech2_tpu.data import (
    BucketedLoader,
    FeatureDataset,
    generate_corpus,
    synthetic_preprocess_config,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus"))
    generate_corpus(out, n_utterances=40, n_speakers=2, seed=1)
    return out


def test_dataset_loads(corpus):
    cfg = synthetic_preprocess_config(corpus)
    ds = FeatureDataset("train.txt", cfg)
    assert len(ds) == 32
    s = ds[0]
    assert s["mel"].shape[0] == s["duration"].sum()
    assert len(s["pitch"]) == len(s["duration"])
    assert (s["text"] > 0).all()
    assert len(s["text"]) == len(s["duration"])


def test_bucketed_loader_static_shapes(corpus):
    cfg = synthetic_preprocess_config(corpus)
    ds = FeatureDataset("train.txt", cfg)
    loader = BucketedLoader(ds, batch_size=8, group_size=2, shuffle=True,
                            drop_last=True, text_bucket=8, mel_bucket=32)
    shapes = set()
    n = 0
    for batch in loader.epoch(0):
        assert batch["texts"].shape[0] == 8
        assert batch["texts"].shape[1] % 8 == 0
        assert batch["mels"].shape[1] % 32 == 0
        assert batch["mels"].shape[1] >= batch["mel_lens"].max()
        assert (batch["mel_lens"]
                == batch["durations"].sum(1)).all()
        shapes.add((batch["texts"].shape, batch["mels"].shape))
        n += 1
    assert n == 4
    # bucketing should keep the number of distinct compile shapes bounded
    assert len(shapes) <= 4


def test_group_sorting_reduces_padding(corpus):
    cfg = synthetic_preprocess_config(corpus)
    ds = FeatureDataset("train.txt", cfg)
    loader = BucketedLoader(ds, batch_size=4, group_size=4, shuffle=True,
                            drop_last=True)
    for batch in loader.epoch(0):
        lens = batch["src_lens"]
        # within a group-sorted batch lengths are close together
        assert lens.max() - lens.min() <= lens.max()
        break


def test_partial_batch_padding(corpus):
    cfg = synthetic_preprocess_config(corpus)
    ds = FeatureDataset("val.txt", cfg)
    assert len(ds) == 8
    loader = BucketedLoader(ds, batch_size=3, group_size=1, shuffle=False,
                            drop_last=False)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    assert batches[-1]["valid_count"] == 2
    assert batches[-1]["texts"].shape[0] == 3  # padded to full batch


def test_multi_host_sharding(corpus):
    cfg = synthetic_preprocess_config(corpus)
    ds = FeatureDataset("train.txt", cfg)
    full = list(BucketedLoader(ds, batch_size=4, group_size=2, shuffle=True,
                               drop_last=True).epoch(0))
    shards = [
        list(BucketedLoader(ds, batch_size=4, group_size=2, shuffle=True,
                            drop_last=True, shard_id=i,
                            num_shards=2).epoch(0))
        for i in range(2)
    ]
    # equal-length, disjoint, and together covering the stream prefix
    assert len(shards[0]) == len(shards[1]) == len(full) // 2
    ids0 = {tuple(b["ids"]) for b in shards[0]}
    ids1 = {tuple(b["ids"]) for b in shards[1]}
    assert ids0.isdisjoint(ids1)
    all_full = [tuple(b["ids"]) for b in full]
    assert all(i in all_full for i in ids0 | ids1)


def test_prefetch_iterator_orders_transforms_and_propagates_errors():
    from fastspeech2_tpu.data.prefetch import PrefetchIterator

    # order + transform
    out = list(PrefetchIterator(iter(range(6)), depth=2,
                                transform=lambda x: x * 10))
    assert out == [0, 10, 20, 30, 40, 50]

    # a worker exception surfaces on the consumer side, after any items
    # already prefetched
    def gen():
        yield 1
        raise ValueError("boom")

    it = PrefetchIterator(gen(), depth=2)
    assert next(it) == 1
    import pytest

    with pytest.raises(ValueError, match="boom"):
        next(it)
