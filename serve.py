#!/usr/bin/env python
"""Batched TTS HTTP serving entry point (superset of the reference).
See fastspeech2_tpu/cli/serve_cli.py for flags and the HTTP API."""
from fastspeech2_tpu.cli.serve_cli import main

if __name__ == "__main__":
    main()
