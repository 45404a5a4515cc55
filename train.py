#!/usr/bin/env python
"""Thin shim: `python train.py ...` == reference CLI (gs_tpu.cli.train)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gs_tpu.cli.train import main

if __name__ == "__main__":
    main()
