from fastspeech2_tpu.synthesis.pipeline import Synthesizer
from fastspeech2_tpu.synthesis.plotting import expand_by_duration, plot_mel
from fastspeech2_tpu.synthesis.vocoder import (
    GriffinLimVocoder,
    HiFiGANVocoder,
    get_vocoder,
    vocoder_infer,
)

__all__ = [
    "Synthesizer",
    "expand_by_duration",
    "plot_mel",
    "GriffinLimVocoder",
    "HiFiGANVocoder",
    "get_vocoder",
    "vocoder_infer",
]
