#!/usr/bin/env python
"""Thin shim: `python full_eval.py ...` == reference CLI (gs_tpu.cli.full_eval)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gs_tpu.cli.full_eval import main

if __name__ == "__main__":
    main()
