#!/usr/bin/env python
"""Validation-set evaluation entry point."""
from fastspeech2_tpu.cli.evaluate_cli import main

if __name__ == "__main__":
    main()
