#!/usr/bin/env python
"""Evaluate pointmap regression metrics (reference eval.py equivalent)."""
from must3r_tpu.cli.eval_cli import main

if __name__ == "__main__":
    main()
