"""Camera recovery from pointmaps: Weiszfeld focal + weighted Kabsch.

Replaces the reference's external native deps on the pose path
(`dust3r.post_process.estimate_focal_knowing_depth` and
`roma.rigid_points_registration`, used in
`/root/reference/must3r/engine/inference.py:28-46` and
`/root/reference/must3r/slam/model.py:147-172`) with jitted jnp:
the Weiszfeld IRLS runs as a fori_loop, the Procrustes via
`jnp.linalg.svd` on a 3x3 -- both batched and differentiable.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_EPS = 1e-8


def xy_pixel_grid(h: int, w: int, dtype=jnp.float32):
    """[H*W, 2] (x, y) pixel coordinates, row-major over the image."""
    ys = jnp.arange(h, dtype=dtype)
    xs = jnp.arange(w, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([gx, gy], axis=-1).reshape(h * w, 2)


def estimate_focal_weiszfeld(pts3d_local, n_iters: int = 10,
                             min_focal: float = 0.0,
                             max_focal: float = jnp.inf):
    """Robust focal estimate from a camera-frame pointmap.

    Solves min_f sum_i || pix_i - f * (x_i/z_i, y_i/z_i) || by IRLS
    (Weiszfeld), principal point at the image center -- behavioral parity
    with dust3r's `estimate_focal_knowing_depth(..., 'weiszfeld')`.

    Args:
      pts3d_local: [..., H, W, 3] camera-frame points.
    Returns:
      focal: [...] scalar per batch element (pixels).
    """
    *lead, h, w, _ = pts3d_local.shape
    pts = pts3d_local.reshape(-1, h * w, 3).astype(jnp.float32)
    pp = jnp.asarray([w / 2.0, h / 2.0], jnp.float32)
    pixels = xy_pixel_grid(h, w)[None] - pp              # [1, HW, 2]

    z = pts[..., 2:3]
    xy_over_z = pts[..., :2] / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    xy_over_z = jnp.nan_to_num(xy_over_z, posinf=0.0, neginf=0.0)
    dot_xy_px = jnp.sum(xy_over_z * pixels, axis=-1)     # [B, HW]
    dot_xy_xy = jnp.sum(jnp.square(xy_over_z), axis=-1)

    focal = (jnp.mean(dot_xy_px, axis=1)
             / jnp.clip(jnp.mean(dot_xy_xy, axis=1), _EPS))

    # unrolled IRLS: short dependency chain of fused elementwise kernels
    # (fori_loop would force one dispatch round-trip per iteration)
    for _ in range(n_iters):
        dis = jnp.linalg.norm(pixels - focal[:, None, None] * xy_over_z,
                              axis=-1)
        wgt = 1.0 / jnp.clip(dis, _EPS)
        focal = (jnp.mean(wgt * dot_xy_px, axis=1)
                 / jnp.clip(jnp.mean(wgt * dot_xy_xy, axis=1), _EPS))
    focal = jnp.clip(focal, min_focal, max_focal)
    return focal.reshape(lead)


def _quat_to_rotmat(q):
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return r.reshape(*q.shape[:-1], 3, 3)


def rigid_points_registration(x, y, weights=None, n_power_iters: int = 64):
    """Weighted Procrustes: find R, T minimizing sum_i w_i ||R x_i + T - y_i||^2.

    Behavioral parity with `roma.rigid_points_registration`
    (compute_scaling=False): returns (R [..., 3, 3], T [..., 3]),
    det(R) = +1 always.

    TPU-first solver: instead of a 3x3 SVD (slow to compile and serialize
    on TPU), the optimal rotation comes from Horn's quaternion method --
    the dominant eigenvector of the 4x4 symmetric matrix K built from the
    weighted correlation, found by shifted power iteration. Fully fused
    elementwise/matmul ops: microsecond runtime, instant compile, and the
    proper-rotation constraint is automatic.

    Args:
      x: [..., N, 3] source points (local frame).
      y: [..., N, 3] target points (global frame).
      weights: optional [..., N] nonnegative weights.
    """
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    if weights is None:
        weights = jnp.ones(xf.shape[:-1], jnp.float32)
    wf = jnp.clip(weights.astype(jnp.float32), 0.0)
    wsum = jnp.clip(jnp.sum(wf, axis=-1, keepdims=True), _EPS)
    wn = wf / wsum                                        # [..., N]

    cx = jnp.sum(wn[..., None] * xf, axis=-2)             # [..., 3]
    cy = jnp.sum(wn[..., None] * yf, axis=-2)
    xc = xf - cx[..., None, :]
    yc = yf - cy[..., None, :]
    # correlation S[i, j] = sum w * xc_i * yc_j  -> [..., 3, 3]
    s = jnp.einsum("...n,...ni,...nj->...ij", wn, xc, yc)

    sxx, sxy, sxz = s[..., 0, 0], s[..., 0, 1], s[..., 0, 2]
    syx, syy, syz = s[..., 1, 0], s[..., 1, 1], s[..., 1, 2]
    szx, szy, szz = s[..., 2, 0], s[..., 2, 1], s[..., 2, 2]
    # Horn's K matrix (dominant eigenvector = optimal quaternion)
    k = jnp.stack([
        sxx + syy + szz, syz - szy,       szx - sxz,       sxy - syx,
        syz - szy,       sxx - syy - szz, sxy + syx,       szx + sxz,
        szx - sxz,       sxy + syx,       syy - sxx - szz, syz + szy,
        sxy - syx,       szx + sxz,       syz + szy,       szz - sxx - syy,
    ], axis=-1).reshape(*s.shape[:-2], 4, 4)

    # shift by ||K||_F: guarantees positive-definiteness (lambda_min >=
    # -||K||_F) with the smallest generic over-shift, keeping the power
    # iteration's convergence ratio favorable
    shift = jnp.linalg.norm(k, axis=(-2, -1), keepdims=True) + _EPS
    k_sh = k + shift * jnp.eye(4, dtype=k.dtype)
    # power iteration by repeated matrix squaring: K^(2^r) applied to an
    # asymmetric seed -- log2(n) 4x4 matmuls instead of n matvecs (each
    # tiny op costs fixed launch overhead on TPU), Frobenius-normalized
    # between squarings to stay in range
    n_sq = max(1, int(math.ceil(math.log2(max(n_power_iters, 2)))))
    m_pow = k_sh / jnp.clip(
        jnp.linalg.norm(k_sh, axis=(-2, -1), keepdims=True), _EPS)
    for _ in range(n_sq):
        m_pow = jnp.einsum("...ij,...jk->...ik", m_pow, m_pow)
        m_pow = m_pow / jnp.clip(
            jnp.linalg.norm(m_pow, axis=(-2, -1), keepdims=True), _EPS)
    seed = jnp.asarray([1.0, 0.011, 0.017, 0.023], k.dtype)  # asymmetric
    q = jnp.einsum("...ij,...j->...i", m_pow,
                   jnp.broadcast_to(seed, (*k.shape[:-2], 4)))
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    r = _quat_to_rotmat(q)
    t = cy - jnp.einsum("...ij,...j->...i", r, cx)
    return r, t


def geotrf(trf, pts):
    """Apply a [..., 4, 4] (or [..., 3, 4]) rigid transform to [..., N, 3]
    points (parity with dust3r `utils.geometry.geotrf` for the pointmap
    use-case)."""
    r = trf[..., :3, :3]
    t = trf[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", r, pts) + t[..., None, :]


def inv_se3(trf):
    """Invert a [..., 4, 4] rigid transform."""
    r = trf[..., :3, :3]
    t = trf[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", rt, t)
    out = jnp.zeros_like(trf)
    out = out.at[..., :3, :3].set(rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


def make_c2w(r, t):
    """Assemble [..., 4, 4] camera-to-world from R, T."""
    lead = r.shape[:-2]
    c2w = jnp.zeros((*lead, 4, 4), jnp.float32)
    c2w = c2w.at[..., :3, :3].set(r)
    c2w = c2w.at[..., :3, 3].set(t)
    c2w = c2w.at[..., 3, 3].set(1.0)
    return c2w
