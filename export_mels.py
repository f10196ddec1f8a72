#!/usr/bin/env python
"""Teacher-forced predicted-mel export for vocoder fine-tuning.
See fastspeech2_tpu/cli/export_mels_cli.py."""
from fastspeech2_tpu.cli.export_mels_cli import main

if __name__ == "__main__":
    main()
