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


def _gather_rows(images: jnp.ndarray, y: jnp.ndarray, x0: jnp.ndarray,
                 width: int) -> jnp.ndarray:
    """[B, N, 7, width] patches as flat gathers of CONTIGUOUS width-runs.

    images [B, H, W]; y/x0 [B, N].  Flattening each image and indexing
    row-major runs through ``take_along_axis`` lowers to far fewer gather
    descriptors than 2-D fancy indexing — and stays flat under batching,
    where a vmapped per-image gather costs ~1.5x more (measured round 4:
    0.41 -> 0.62 ms/frame at B=16).
    """
    B, H, W = images.shape
    N = y.shape[1]
    dy = jnp.arange(-_PATCH, _PATCH + 1)
    start = (y[:, :, None] + dy[None, None, :]) * W + x0[:, :, None]
    offs = jnp.arange(width)
    lin = start[:, :, :, None] + offs[None, None, None, :]   # [B, N, 7, w]
    flat = images.reshape(B, H * W)
    out = jnp.take_along_axis(flat, lin.reshape(B, -1), axis=1)
    return out.reshape(B, N, 2 * _PATCH + 1, width)


def _gather_patches(images: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Extract (2P+1)^2 patches at integer centers; [B, N, (2P+1)^2]."""
    B, H, W = images.shape
    y = jnp.clip(uv[..., 1].astype(jnp.int32), _PATCH + 1, H - _PATCH - 2)
    x = jnp.clip(uv[..., 0].astype(jnp.int32), _PATCH + 1, W - _PATCH - 2)
    K = 2 * _PATCH + 1
    return _gather_rows(images, y, x - _PATCH, K).reshape(B, uv.shape[1], -1)


def refine_disparity_batch(
    images_left: jnp.ndarray,    # [B, H, W]
    images_right: jnp.ndarray,   # [B, H, W]
    uv_left: jnp.ndarray,        # [B, N, 2]
    uv_right: jnp.ndarray,       # [B, N, 2]
):
    """Natively batched sub-pixel u_R correction (see refine_disparity)."""
    pl = _gather_patches(images_left, uv_left)
    # ONE widened right-patch gather [B, N, 7, 9]; the three shifted 7-wide
    # windows are static slices of it (3x fewer random accesses — the
    # per-keypoint gathers are the cost here, measured round 3)
    B, H, W = images_right.shape
    y = jnp.clip(uv_right[..., 1].astype(jnp.int32), _PATCH + 1, H - _PATCH - 2)
    x = jnp.clip(uv_right[..., 0].astype(jnp.int32), _PATCH + 1, W - _PATCH - 2)
    wide = _gather_rows(images_right, y, x - _PATCH - 1, 9)  # [B, N, 7, 9]
    n = uv_right.shape[1]
    K = 2 * _PATCH + 1
    costs = [
        jnp.mean((pl - wide[:, :, :, s:s + K].reshape(B, n, -1)) ** 2,
                 axis=-1)
        for s in (0, 1, 2)
    ]
    c_m, c_0, c_p = costs
    denom = c_m - 2.0 * c_0 + c_p
    offset = 0.5 * (c_m - c_p) / jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    # only trust interpolation when the center is a local minimum
    offset = jnp.where((c_0 <= c_m) & (c_0 <= c_p), jnp.clip(offset, -0.5, 0.5), 0.0)
    return uv_right[..., 0] + offset


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
    return refine_disparity_batch(
        image_left[None], image_right[None], uv_left[None], uv_right[None]
    )[0]
