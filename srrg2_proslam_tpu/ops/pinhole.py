"""Pinhole projection / unprojection with frustum masks.

Capability parity with srrg2_core's PointProjectorPinhole_/
PointUnprojectorPinhole_ as used by the reference scene clipper
(reference srrg2_proslam/src/srrg2_proslam/mapping/scene_clipper_projective_3d.cpp:46-53)
and the RGB-D preprocessor — redesigned as pure vectorized jnp functions that
return validity masks instead of compacting point vectors.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Static pinhole camera intrinsics.

    K rows/cols follow the usual convention; image size is (rows, cols).
    ``baseline_px`` = fx * b_x (the x component of K @ t_right_in_left), the
    rectified-stereo baseline in pixel-meters as cached by the reference
    triangulator (triangulator_rigid_stereo.cpp:87-109).
    """

    fx: float
    fy: float
    cx: float
    cy: float
    rows: int
    cols: int
    baseline_px: float = 0.0  # fx * baseline_meters (for stereo rigs)
    range_min: float = 0.1
    range_max: float = 1000.0

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def baseline_m(self) -> float:
        return self.baseline_px / self.fx


def project(cam: Camera, pts_cam: jnp.ndarray):
    """Project camera-frame points [..., N, 3] -> pixel coords [..., N, 2] (u, v).

    Returns (uv, in_view) where in_view masks points inside the image bounds
    and the [range_min, range_max] depth interval.
    """
    x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * x / z_safe + cam.cx
    v = cam.fy * y / z_safe + cam.cy
    in_view = (
        (z > cam.range_min)
        & (z < cam.range_max)
        & (u >= 0.0)
        & (u < cam.cols)
        & (v >= 0.0)
        & (v < cam.rows)
    )
    return jnp.stack([u, v], axis=-1), in_view


def project_stereo(cam: Camera, pts_cam: jnp.ndarray):
    """Project to rectified stereo coords [..., N, 3] = (uL, vL, uR).

    uR = uL - baseline_px / z  (vR == vL under perfect rectification).
    in_view additionally requires the right projection inside the image.
    """
    uv, in_view = project(cam, pts_cam)
    z = pts_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u_r = uv[..., 0] - cam.baseline_px / z_safe
    in_view = in_view & (u_r >= 0.0)
    return jnp.concatenate([uv, u_r[..., None]], axis=-1), in_view


def unproject(cam: Camera, uvd: jnp.ndarray):
    """Unproject [..., N, 3] = (u, v, depth_m) -> camera-frame 3D points.

    Mirrors the RGB-D unprojection used by the depth merger
    (merger_projective_depth_ekf_impl.cpp:55-73). Returns (pts, valid) with
    valid = depth within range.
    """
    u, v, d = uvd[..., 0], uvd[..., 1], uvd[..., 2]
    x = (u - cam.cx) / cam.fx * d
    y = (v - cam.cy) / cam.fy * d
    valid = (d > cam.range_min) & (d < cam.range_max)
    return jnp.stack([x, y, d], axis=-1), valid
