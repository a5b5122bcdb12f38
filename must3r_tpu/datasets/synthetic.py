"""Procedural multi-view dataset with exact ground truth.

No public 3D dataset ships in this environment, so this provides the test /
toy-training substrate the reference gets from Co3d/ScanNetpp: scenes of
random textured planes rendered analytically (ray-plane intersection gives
exact depth; world-coordinate sinusoid textures give multi-view-consistent
color), cameras on a jittered arc looking at the scene center. Every view
carries exact depth, intrinsics and pose -- so losses, pose recovery and
eval metrics can be validated end-to-end.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from must3r_tpu.datasets.base import MultiViewDataset, make_view


def _look_at(eye, target, up=(0.0, -1.0, 0.0)):
    """c2w with +z forward (OpenCV convention)."""
    fwd = np.asarray(target, np.float64) - np.asarray(eye, np.float64)
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = down
    c2w[:3, 2] = fwd
    c2w[:3, 3] = eye
    return c2w


def _texture(pts: np.ndarray, freqs: np.ndarray, phases: np.ndarray
             ) -> np.ndarray:
    """World-coordinate procedural RGB in [0, 255]."""
    c = 0.5 + 0.5 * np.sin(pts @ freqs.T + phases)
    return (np.clip(c, 0, 1) * 255).astype(np.uint8)


class SyntheticScenes(MultiViewDataset):
    """Scenes of `n_planes` random planes; one scene per `idx // num_views`.

    Sky: rays missing every plane get depth -1 (undefined), matching the
    reference's sky_mask convention (depth < 0)."""

    def __init__(self, num_views: int = 4, resolutions=((64, 48),),
                 epoch_size: int = 100, n_planes: int = 4,
                 render_hw: Tuple[int, int] = (96, 128),
                 is_metric_scale: bool = False, seed: int = 0, **kw):
        super().__init__(num_views, resolutions, epoch_size, seed=seed, **kw)
        self.n_planes = n_planes
        self.render_hw = render_hw
        self.is_metric_scale = is_metric_scale

    def _scene(self, scene_id: int):
        rng = np.random.default_rng(10_000 + scene_id)
        normals = rng.standard_normal((self.n_planes, 3))
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
        points = rng.standard_normal((self.n_planes, 3)) * 1.5
        freqs = rng.uniform(0.5, 3.0, (3, 3)) * rng.choice(
            [-1, 1], (3, 3))
        phases = rng.uniform(0, 2 * np.pi, 3)
        return normals, points, freqs, phases

    def _render(self, scene, c2w, intrinsics, hw):
        normals, points, freqs, phases = scene
        h, w = hw
        u, v = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
        kinv = np.linalg.inv(intrinsics)
        rays_cam = np.stack([u, v, np.ones_like(u)], -1) @ kinv.T
        rays = rays_cam @ c2w[:3, :3].T                  # world directions
        origin = c2w[:3, 3]

        t_best = np.full((h, w), np.inf)
        for n, p0 in zip(normals, points):
            denom = rays @ n
            t = ((p0 - origin) @ n) / np.where(np.abs(denom) < 1e-9,
                                               np.inf, denom)
            t = np.where(t > 0.2, t, np.inf)
            t_best = np.minimum(t_best, t)

        hit = np.isfinite(t_best)
        # depth = z in camera frame = t * rays_cam_z (rays_cam z == 1)
        depth = np.where(hit, t_best, -1.0).astype(np.float32)
        world = origin + rays * t_best[..., None]
        world = np.where(hit[..., None], world, 0.0)
        img = _texture(world.reshape(-1, 3), freqs, phases).reshape(h, w, 3)
        img[~hit] = (135, 206, 235)                       # sky color
        return img, depth

    def _get_views(self, idx, resolution, memory_num_views, rng):
        scene_id = idx % max(1, self.epoch_size // 4)
        scene = self._scene(scene_id)
        h, w = self.render_hw
        focal = 0.9 * w
        k = np.asarray([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                       np.float32)
        views = []
        radius = 4.0
        base = rng.uniform(0, 2 * np.pi)
        for i in range(self.num_views):
            ang = base + 0.25 * i + rng.normal(0, 0.05)
            eye = np.asarray([radius * np.sin(ang),
                              0.5 * np.sin(2 * ang),
                              -radius * np.cos(ang)], np.float32)
            c2w = _look_at(eye, (0.0, 0.0, 0.0))
            img, depth = self._render(scene, c2w, k, (h, w))
            views.append(make_view(img, depth, k, c2w, resolution,
                                   is_metric_scale=self.is_metric_scale,
                                   label=f"scene{scene_id}",
                                   instance=f"v{i}",
                                   transform=self.transform, rng=rng))
        return views
