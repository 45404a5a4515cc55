#!/usr/bin/env python
"""Thin shim: `python convert.py ...` == reference CLI (gs_tpu.cli.convert)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gs_tpu.cli.convert import main

if __name__ == "__main__":
    main()
