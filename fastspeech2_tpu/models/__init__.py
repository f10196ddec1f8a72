from fastspeech2_tpu.models.fastspeech2 import FastSpeech2, FastSpeech2Output
from fastspeech2_tpu.models.loss import LossOutput, fastspeech2_loss
from fastspeech2_tpu.models.postnet import PostNet
from fastspeech2_tpu.models.transformer import Decoder, Encoder, FFTBlock
from fastspeech2_tpu.models.variance import VarianceAdaptor, VariancePredictor

__all__ = [
    "FastSpeech2",
    "FastSpeech2Output",
    "LossOutput",
    "fastspeech2_loss",
    "PostNet",
    "Decoder",
    "Encoder",
    "FFTBlock",
    "VarianceAdaptor",
    "VariancePredictor",
]
