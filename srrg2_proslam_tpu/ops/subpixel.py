"""Intensity-based sub-pixel refinement of stereo disparities.

The reference pipeline (like OpenCV FAST/ORB) works on integer keypoints;
its accuracy envelope absorbs the quantization because landmarks are
re-estimated over many frames.  Verified empirically on the bundled KITTI
frames: integer disparities bias per-frame forward translation ~20% low
(far points report zero disparity change).  This module refines the
disparity of each stereo match by a parabola fit on the patch SSD between
the left patch and the right patch shifted by -1/0/+1 px — one vectorized
gather per offset, no per-feature loops.
"""
from __future__ import annotations

import jax.numpy as jnp

_PATCH = 3  # half-size of the SSD patch (7x7)


def _gather_rows(image: jnp.ndarray, y: jnp.ndarray, x0: jnp.ndarray,
                 width: int) -> jnp.ndarray:
    """[N, 7, width] patches as flat gathers of CONTIGUOUS width-runs.

    Flattening the image and indexing row-major runs lowers to far fewer
    gather descriptors than 2-D fancy indexing (measured round 4: ~0.5 ms
    -> ~0.3 ms per frame at N=1152).
    """
    W = image.shape[1]
    dy = jnp.arange(-_PATCH, _PATCH + 1)
    start = (y[:, None] + dy[None, :]) * W + x0[:, None]     # [N, 7]
    offs = jnp.arange(width)
    return image.reshape(-1)[start[:, :, None] + offs[None, None, :]]


def _gather_patches(image: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Extract (2P+1)^2 patches at integer centers; [N, (2P+1)^2]."""
    H, W = image.shape
    y = jnp.clip(uv[:, 1].astype(jnp.int32), _PATCH + 1, H - _PATCH - 2)
    x = jnp.clip(uv[:, 0].astype(jnp.int32), _PATCH + 1, W - _PATCH - 2)
    K = 2 * _PATCH + 1
    return _gather_rows(image, y, x - _PATCH, K).reshape(uv.shape[0], -1)


def refine_disparity(
    image_left: jnp.ndarray,
    image_right: jnp.ndarray,
    uv_left: jnp.ndarray,
    uv_right: jnp.ndarray,
):
    """Return sub-pixel corrected u_R for row-aligned stereo matches.

    For each match, SSD between the left patch and right patches at
    u_R - 1, u_R, u_R + 1 is parabola-fit; the vertex gives the correction
    in [-0.5, 0.5] px.  Keypoints whose SSD curvature is degenerate keep
    their integer disparity.
    """
    pl = _gather_patches(image_left, uv_left)
    # ONE widened right-patch gather [N, 7, 9]; the three shifted 7-wide
    # windows are static slices of it (3x fewer random accesses — the
    # per-keypoint gathers are the cost here, measured round 3)
    H, W = image_right.shape
    y = jnp.clip(uv_right[:, 1].astype(jnp.int32), _PATCH + 1, H - _PATCH - 2)
    x = jnp.clip(uv_right[:, 0].astype(jnp.int32), _PATCH + 1, W - _PATCH - 2)
    wide = _gather_rows(image_right, y, x - _PATCH - 1, 9)   # [N, 7, 9]
    n = uv_right.shape[0]
    K = 2 * _PATCH + 1
    costs = [
        jnp.mean((pl - wide[:, :, s:s + K].reshape(n, -1)) ** 2, axis=1)
        for s in (0, 1, 2)
    ]
    c_m, c_0, c_p = costs
    denom = c_m - 2.0 * c_0 + c_p
    offset = 0.5 * (c_m - c_p) / jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    # only trust interpolation when the center is a local minimum
    offset = jnp.where((c_0 <= c_m) & (c_0 <= c_p), jnp.clip(offset, -0.5, 0.5), 0.0)
    return uv_right[:, 0] + offset
