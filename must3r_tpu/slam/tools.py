"""SLAM host utilities: quadrant quantization, trajectory smoothing.

Parity target: reference `must3r/slam/tools.py`.
"""

from __future__ import annotations

import numpy as np


def get_quadrant_id(rays: np.ndarray, quadrant_divider: int = 4,
                    eps: float = 1e-5) -> np.ndarray:
    """Quantize ray directions into 2N^2 spherical quadrants: theta (acos z)
    into N bins, phi (atan2 y,x) into 2N bins, raveled to one index."""
    rays = np.nan_to_num(rays, nan=0.0, posinf=0.0, neginf=0.0)
    rays = rays / np.clip(np.linalg.norm(rays, axis=-1, keepdims=True), eps,
                          None)
    thetas = np.arccos(np.clip(rays[:, -1], -1.0, 1.0)) / np.pi
    phis = np.arctan2(rays[:, 1], rays[:, 0]) / np.pi
    thetas = thetas.clip(eps, 1 - eps)
    phis = phis.clip(-1 + eps, 1 - eps)
    theta_idx = np.floor(thetas * quadrant_divider).astype(int)
    phis_idx = np.floor(phis * quadrant_divider).astype(int) \
        + quadrant_divider
    idx = (theta_idx + phis_idx * quadrant_divider).astype(int)
    return np.clip(idx, 0, 2 * quadrant_divider * quadrant_divider - 1)


def laplacian_smoothing(trajectory: np.ndarray, alpha: float = 0.5,
                        iterations: int = 10) -> np.ndarray:
    """In-place (Gauss-Seidel) Laplacian smoothing of [N, 3] positions,
    endpoints fixed -- matches the reference's sequential update order."""
    out = trajectory.copy()
    n = len(out)
    for _ in range(iterations):
        for i in range(1, n - 1):
            out[i] = (1 - alpha) * out[i] + (alpha / 2) * (out[i - 1]
                                                           + out[i + 1])
    return out


def laplacian_smoothing_with_confidence(trajectory: np.ndarray,
                                        confidence: np.ndarray,
                                        alpha: float = 0.5,
                                        iterations: int = 10) -> np.ndarray:
    """Confidence-weighted variant: confident poses move less."""
    out = trajectory.copy()
    n = len(out)
    for _ in range(iterations):
        for i in range(1, n - 1):
            w_self = (1 - alpha) * confidence[i]
            w_prev = alpha * (1 - confidence[i - 1]) / 2
            w_next = alpha * (1 - confidence[i + 1]) / 2
            s = w_self + w_prev + w_next
            out[i] = (w_self * out[i] + w_prev * out[i - 1]
                      + w_next * out[i + 1]) / s
    return out
