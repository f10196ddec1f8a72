#!/usr/bin/env python
"""Training entry point. Usage mirrors the upstream CLI:
    python train.py -p config/LJSpeech/preprocess.yaml \
        -m config/LJSpeech/model.yaml -t config/LJSpeech/train.yaml
"""
from fastspeech2_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
