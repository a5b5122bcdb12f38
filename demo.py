#!/usr/bin/env python
"""Reconstruction demo entry point (reference demo.py).

The gradio/viser web UI stack is not available in this environment; this
runs the same pipeline headless (identical flags to get_reconstruction.py)
and writes GLB/PLY artifacts you can open in any viewer.
"""
from must3r_tpu.cli.reconstruct import main

if __name__ == "__main__":
    main()
