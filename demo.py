#!/usr/bin/env python
"""Reconstruction demo entry point (reference demo.py).

Headless by default (identical flags to get_reconstruction.py, writes
GLB/PLY artifacts). With --web it serves the interactive browser demo —
upload images, reconstruct, tune the confidence threshold live, download
GLB/PLY — the reference gradio app's workflow on a zero-dependency
stdlib HTTP stack (gradio/viser are not available in this environment).
"""
from must3r_tpu.cli.reconstruct import main

if __name__ == "__main__":
    main()
