#!/usr/bin/env python
"""Train MUSt3R-TPU (reference train.py CLI equivalent)."""
from must3r_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
