from fastspeech2_tpu.evaluation.metrics import (  # noqa: F401
    f0_metrics,
    mcd,
    mel_cepstra,
)
