from fastspeech2_tpu.audio.dio import dio_f0
from fastspeech2_tpu.audio.f0 import interpolate_unvoiced, yin_f0
from fastspeech2_tpu.audio.mel import mel_filterbank
from fastspeech2_tpu.audio.stft import (
    MelSpectrogram,
    dynamic_range_compression,
    dynamic_range_decompression,
    griffin_lim,
    istft,
    stft_magnitude,
)
from fastspeech2_tpu.audio.wav import load_wav, save_wav

__all__ = [
    "dio_f0",
    "interpolate_unvoiced",
    "yin_f0",
    "mel_filterbank",
    "MelSpectrogram",
    "dynamic_range_compression",
    "dynamic_range_decompression",
    "griffin_lim",
    "istft",
    "stft_magnitude",
    "load_wav",
    "save_wav",
]
