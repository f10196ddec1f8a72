#!/usr/bin/env python
"""Corpus preprocessing entry point: TextGrids + wavs -> training features."""
from fastspeech2_tpu.cli.preprocess_cli import preprocess_main

if __name__ == "__main__":
    preprocess_main()
