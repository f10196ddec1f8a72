from fastspeech2_tpu.preprocessing.corpora import (
    PREPARE_ALIGN,
    prepare_align_aishell3,
    prepare_align_ljspeech,
    prepare_align_libritts,
)
from fastspeech2_tpu.preprocessing.preprocessor import Preprocessor
from fastspeech2_tpu.preprocessing.textgrid import (
    Interval,
    IntervalTier,
    TextGrid,
    read_textgrid,
)

__all__ = [
    "PREPARE_ALIGN",
    "prepare_align_aishell3",
    "prepare_align_ljspeech",
    "prepare_align_libritts",
    "Preprocessor",
    "Interval",
    "IntervalTier",
    "TextGrid",
    "read_textgrid",
]
