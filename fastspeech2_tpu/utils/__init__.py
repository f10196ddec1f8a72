from fastspeech2_tpu.utils.logging import TrainLogger

__all__ = ["TrainLogger"]
