"""Measurement adaptors: raw images -> typed fixed-capacity measurements.

Capability parity with the reference raw-data preprocessors:
  * stereo (RawDataPreprocessorStereoProjective, reference srrg2_proslam/src/
    srrg2_proslam/sensor_processing/raw_data_preprocessor_stereo_projective.cpp:46-134):
    extract L/R features, stereo-match along epipolar lines, emit 4-D points
    [uL vL uR vR] carrying the left descriptor, negative disparities dropped.
  * RGB-D (RawDataPreprocessorMonocularDepth, .../raw_data_preprocessor_
    monocular_depth.cpp:46-182): extract on intensity, per-keypoint depth
    lookup, emit 3-D points [u v depth_m], zero-depth dropped.

Redesigned TPU-first: both cameras' frontends run as one batched jit (the
reference runs them serially, seeding the right detector with left features
— a CPU work-saving device subsumed here by dense detection), and the
variable-length OpenCV keypoint vectors become fixed-capacity arrays with
validity masks.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import config as cfg
from ..ops.features import (
    FeatureExtractorConfig, extract_features, extract_features_batch,
)
from ..ops.matching import EpipolarMatcherConfig, match_epipolar
from ..ops.subpixel import refine_disparity, refine_disparity_batch


class StereoMeasurement(NamedTuple):
    """Fixed-capacity stereo measurement set for one frame.

    points[N, 4] = (uL, vL, uR, vR) with vR == vL's matched row; desc is the
    left-image descriptor (signed int8 bits); valid masks live rows.
    """

    points: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray

    @property
    def count(self):
        return jnp.sum(self.valid)


class DepthMeasurement(NamedTuple):
    """Fixed-capacity RGB-D measurement set: points[N, 3] = (u, v, depth_m)."""

    points: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray

    @property
    def count(self):
        return jnp.sum(self.valid)


@cfg.register
class StereoAdaptorConfig:
    extractor: FeatureExtractorConfig = FeatureExtractorConfig()
    matcher: EpipolarMatcherConfig = EpipolarMatcherConfig()
    minimum_disparity_px: float = 1.0  # kitti.conf:43 minimum_disparity_pixels
    # SSD-parabola disparity refinement on top of the detector's own
    # FAST-score sub-pixel parabola.  OFF by default since round 4: with
    # the detector parabola in place it is redundant — A/B-measured
    # (5-frame KITTI gate PASS both ways within 5 mm; rendered e2e gates
    # PASS; scene-flow disparity inliers@1px 74.8% vs 74.3%) — and its
    # per-keypoint patch gathers cost ~0.64 ms/frame at chunk batch sizes
    subpixel_refinement: bool = False


@cfg.register
class DepthAdaptorConfig:
    extractor: FeatureExtractorConfig = FeatureExtractorConfig()
    # 16UC1 raw -> meters.  The reference pins 0.001 (millimeter depth) for
    # both its RGB-D configs (tum.conf/icl.conf "depth_scaling_factor_to_
    # meters": 0.001) and its bundled ICL PGMs are mm (fixtures.hpp:740
    # converts with 1e-3); raw TUM PNG exports need 1/5000 instead.
    depth_scale: float = 1.0e-3
    minimum_depth_m: float = 0.1
    maximum_depth_m: float = 50.0


def _stereo_tail(
    image_left, image_right, uv_l, desc_l, valid_l, uv_r, desc_r, valid_r,
    config: StereoAdaptorConfig,
) -> StereoMeasurement:
    """Epipolar matching + sub-pixel + measurement assembly for one pair."""
    matches = match_epipolar(
        uv_l, desc_l, valid_l, uv_r, desc_r, valid_r, config.matcher
    )
    idx = jnp.maximum(matches.idx, 0)
    uv_r_matched = uv_r[idx]
    u_r = uv_r_matched[:, 0]
    if config.subpixel_refinement:
        u_r = refine_disparity(image_left, image_right, uv_l, uv_r_matched)
    disparity = uv_l[:, 0] - u_r
    ok = matches.mask & (disparity >= config.minimum_disparity_px)
    # v = epipolar row mean: under rectification vL and vR measure the same
    # quantity with independent noise; emitting the mean makes the
    # measurement EXACTLY consistent with the rectified projection model
    # (triangulation already uses the mean, triangulator_rigid_stereo.cpp:
    # 59-85).  Keeping raw vL leaves a systematic +-(vL-vR)/2 residual at
    # the true pose that biases GN and random-walks the landmark/pose gauge
    # on re-observation (root cause of the round-1 idempotence drift).
    v_mean = 0.5 * (uv_l[:, 1] + uv_r_matched[:, 1])
    points = jnp.stack([uv_l[:, 0], v_mean, u_r, v_mean], axis=-1)
    return StereoMeasurement(
        points=jnp.where(ok[:, None], points, 0.0),
        desc=jnp.where(ok[:, None], desc_l, jnp.int8(-1)),
        valid=ok,
    )


@partial(jax.jit, static_argnames="config")
def adapt_stereo(
    image_left: jnp.ndarray,
    image_right: jnp.ndarray,
    config: StereoAdaptorConfig,
) -> StereoMeasurement:
    """Stereo frame -> 4-D measurements. Images: [H, W] float32 (0..255)."""
    # batched L/R frontend: one batched trace fills the chip with both images
    images = jnp.stack([image_left, image_right])
    feats = extract_features_batch(images, config.extractor)
    return _stereo_tail(
        image_left, image_right,
        feats.uv[0], feats.desc[0], feats.valid[0],
        feats.uv[1], feats.desc[1], feats.valid[1], config,
    )


@partial(jax.jit, static_argnames="config")
def adapt_stereo_batch(
    lefts: jnp.ndarray,     # [B, H, W]
    rights: jnp.ndarray,    # [B, H, W]
    config: StereoAdaptorConfig,
) -> StereoMeasurement:
    """Batched stereo adaptor for B frames (chunked stepping mode).

    All 2B images run through ONE batched frontend (the dense Pallas BRIEF
    kernel batches through its grid — it must not be wrapped in vmap, see
    ops/features.extract_features_batch); the epipolar matching is vmapped
    (its batched matmuls are native) while the sub-pixel refinement and
    assembly run NATIVELY batched — a vmapped per-image patch gather costs
    ~1.5x more (ops/subpixel.refine_disparity_batch).  Returns
    StereoMeasurement with leading axis B.
    """
    B = lefts.shape[0]
    feats = extract_features_batch(
        jnp.concatenate([lefts, rights]), config.extractor)
    uv_l, desc_l, valid_l = feats.uv[:B], feats.desc[:B], feats.valid[:B]
    uv_r_all, desc_r, valid_r = feats.uv[B:], feats.desc[B:], feats.valid[B:]
    matches = jax.vmap(
        lambda ul, dl, vl, ur, dr, vr: match_epipolar(
            ul, dl, vl, ur, dr, vr, config.matcher)
    )(uv_l, desc_l, valid_l, uv_r_all, desc_r, valid_r)
    idx = jnp.maximum(matches.idx, 0)
    uv_r = jnp.take_along_axis(
        uv_r_all, idx[..., None], axis=1)                   # [B, N, 2]
    u_r = uv_r[..., 0]
    if config.subpixel_refinement:
        u_r = refine_disparity_batch(lefts, rights, uv_l, uv_r)
    disparity = uv_l[..., 0] - u_r
    ok = matches.mask & (disparity >= config.minimum_disparity_px)
    v_mean = 0.5 * (uv_l[..., 1] + uv_r[..., 1])
    points = jnp.stack([uv_l[..., 0], v_mean, u_r, v_mean], axis=-1)
    return StereoMeasurement(
        points=jnp.where(ok[..., None], points, 0.0),
        desc=jnp.where(ok[..., None], desc_l, jnp.int8(-1)),
        valid=ok,
    )


def _rgbd_tail(feats, depth_raw, config: DepthAdaptorConfig):
    H, W = depth_raw.shape
    y = jnp.clip(feats.uv[:, 1].astype(jnp.int32), 0, H - 1)
    x = jnp.clip(feats.uv[:, 0].astype(jnp.int32), 0, W - 1)
    depth = depth_raw[y, x] * config.depth_scale
    ok = (feats.valid & (depth > config.minimum_depth_m)
          & (depth < config.maximum_depth_m))
    points = jnp.concatenate([feats.uv, depth[:, None]], axis=-1)
    return DepthMeasurement(
        points=jnp.where(ok[:, None], points, 0.0),
        desc=jnp.where(ok[:, None], feats.desc, jnp.int8(-1)),
        valid=ok,
    )


@partial(jax.jit, static_argnames="config")
def adapt_rgbd(
    intensity: jnp.ndarray,
    depth_raw: jnp.ndarray,
    config: DepthAdaptorConfig,
) -> DepthMeasurement:
    """RGB-D frame -> 3-D (u, v, depth_m) measurements.

    intensity: [H, W] float32; depth_raw: [H, W] float32 raw depth units
    (scaled by ``depth_scale``, mirroring the reference's 16UC1 handling at
    raw_data_preprocessor_monocular_depth.cpp:121-134).
    """
    feats = extract_features(intensity, config.extractor)
    return _rgbd_tail(feats, depth_raw, config)


@partial(jax.jit, static_argnames="config")
def adapt_rgbd_batch(
    intensities: jnp.ndarray,   # [B, H, W]
    depths_raw: jnp.ndarray,    # [B, H, W]
    config: DepthAdaptorConfig,
) -> DepthMeasurement:
    """Batched RGB-D adaptor for B frames (chunked stepping mode)."""
    feats = extract_features_batch(intensities, config.extractor)
    return jax.vmap(lambda f, d: _rgbd_tail(f, d, config))(feats, depths_raw)
