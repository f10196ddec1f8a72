#!/usr/bin/env python
"""HiFi-GAN vocoder training entry point (superset of the reference, which
vendors only a pretrained generator).  See
fastspeech2_tpu/cli/train_vocoder_cli.py for flags."""
from fastspeech2_tpu.cli.train_vocoder_cli import main

if __name__ == "__main__":
    main()
