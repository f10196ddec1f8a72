"""fastspeech2_tpu: a TPU-native FastSpeech 2 text-to-speech framework.

Built on JAX/XLA/Pallas with static shapes throughout, pjit/mesh sharding for
multi-chip scale, and a pure-Python text frontend compatible with
ming024/FastSpeech2 phone-ID sequences and config schema.
"""

__version__ = "0.1.0"
