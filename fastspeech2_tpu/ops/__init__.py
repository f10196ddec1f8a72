from fastspeech2_tpu.ops.attention import multi_head_attention
from fastspeech2_tpu.ops.length_regulator import (
    gather_index_from_durations,
    length_regulate,
)
from fastspeech2_tpu.ops.masking import (
    fill_masked,
    masked_mean,
    pad_mask_from_lengths,
)
from fastspeech2_tpu.ops.positional import sinusoid_position_encoding

__all__ = [
    "multi_head_attention",
    "gather_index_from_durations",
    "length_regulate",
    "fill_masked",
    "masked_mean",
    "pad_mask_from_lengths",
    "sinusoid_position_encoding",
]
