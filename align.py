#!/usr/bin/env python
"""Forced alignment entry point: raw_data wavs+labs -> TextGrids.
(Capability superset: the reference requires external MFA here.)"""
from fastspeech2_tpu.cli.align_cli import main

if __name__ == "__main__":
    main()
