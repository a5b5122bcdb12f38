#!/usr/bin/env python
"""Online SLAM / visual odometry (reference slam.py equivalent, headless)."""
from must3r_tpu.cli.slam_cli import main

if __name__ == "__main__":
    main()
