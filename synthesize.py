#!/usr/bin/env python
"""Synthesis entry point (single/batch modes, p/e/d control ratios)."""
from fastspeech2_tpu.cli.synthesize_cli import main

if __name__ == "__main__":
    main()
