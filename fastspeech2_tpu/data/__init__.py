from fastspeech2_tpu.data.dataset import (
    BucketedLoader,
    FeatureDataset,
    collate_batch,
    round_up,
)
from fastspeech2_tpu.data.synthetic import (
    generate_corpus,
    synthetic_preprocess_config,
)

__all__ = [
    "BucketedLoader",
    "FeatureDataset",
    "collate_batch",
    "round_up",
    "generate_corpus",
    "synthetic_preprocess_config",
]
