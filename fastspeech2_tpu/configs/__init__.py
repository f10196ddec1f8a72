from fastspeech2_tpu.configs.config import (
    FastSpeech2Config,
    OptimConfig,
    StepConfig,
    load_dataset_configs,
    load_yaml_configs,
)

__all__ = [
    "FastSpeech2Config",
    "OptimConfig",
    "StepConfig",
    "load_dataset_configs",
    "load_yaml_configs",
]
