from fastspeech2_tpu.align.aligner import (
    Alignment,
    ForcedAligner,
    SILENCES,
    Utterance,
    strip_stress,
)
from fastspeech2_tpu.align.features import alignment_features
from fastspeech2_tpu.align.textgrid_writer import write_textgrid

__all__ = [
    "Alignment", "ForcedAligner", "SILENCES", "Utterance",
    "strip_stress", "alignment_features", "write_textgrid",
]
