"""Rectified-stereo midpoint triangulation.

Computes the same quantity as the reference TriangulatorRigidStereo
(reference srrg2_proslam/src/srrg2_proslam/mapping/triangulator_rigid_stereo.cpp:59-85):
    z = baseline_px / (uL - uR)
    x = (uL - cx) z / fx
    y = ((vL + vR)/2 - cy) z / fy
but over the whole fixed-capacity measurement array at once, with a validity
mask in place of the reference's Invalid-status placeholder points
(triangulator_rigid_stereo.cpp:39-45 keeps indexing by emplacing invalids).
"""
from __future__ import annotations

import jax.numpy as jnp

from .pinhole import Camera


def triangulate_rectified(
    cam: Camera,
    points4: jnp.ndarray,
    valid: jnp.ndarray,
    minimum_disparity_px: float = 1.0,
    infinity_depth_m: float = 1000.0,
):
    """Triangulate stereo measurements [N, 4] = (uL, vL, uR, vR).

    Returns (pts_cam [N, 3], valid_out [N]) — points with disparity below
    ``minimum_disparity_px`` are masked out (they stay at infinity depth).
    """
    u_l, v_l, u_r, v_r = points4[..., 0], points4[..., 1], points4[..., 2], points4[..., 3]
    disparity = u_l - u_r
    ok = valid & (disparity >= minimum_disparity_px)
    z = jnp.where(disparity > 0, cam.baseline_px / jnp.maximum(disparity, 1e-6), infinity_depth_m)
    x = (u_l - cam.cx) / cam.fx * z
    y = ((v_l + v_r) * 0.5 - cam.cy) / cam.fy * z
    return jnp.stack([x, y, z], axis=-1), ok
