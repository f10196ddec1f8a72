from fastspeech2_tpu.serving.server import BatchingSynthesizer, TTSServer

__all__ = ["BatchingSynthesizer", "TTSServer"]
