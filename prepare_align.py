#!/usr/bin/env python
"""Corpus normalization entry point: raw corpus -> raw_data wavs + labs."""
from fastspeech2_tpu.cli.preprocess_cli import prepare_align_main

if __name__ == "__main__":
    prepare_align_main()
