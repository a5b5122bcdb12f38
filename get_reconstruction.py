#!/usr/bin/env python
"""Headless reconstruction -> GLB/PLY + SceneState
(reference get_reconstruction.py equivalent)."""
from must3r_tpu.cli.reconstruct import main

if __name__ == "__main__":
    main()
