"""Dense Pallas BRIEF bitplanes == gather-based descriptors, bit for bit.

ops/brief_pallas.py computes every pixel's BRIEF-256 via 256 shifted
comparisons packed into 8 int32 planes (a dense VMEM sweep), replacing the
~590k random per-keypoint gathers of the reference-style path.  The bits
must match the gather path exactly for BORDER-clipped keypoints (outside
the border the rolls wrap — never sampled).
"""
import numpy as np
import jax.numpy as jnp

from srrg2_proslam_tpu.ops import features as F
from srrg2_proslam_tpu.ops.brief_pallas import (
    brief_bitplanes, descriptors_from_planes,
)


def test_dense_bitplanes_match_gather_path(rng):
    H, W = 96, 160
    image = rng.uniform(0, 255, (H, W)).astype(np.float32)
    cfg = F.FeatureExtractorConfig(max_keypoints=63, grid_rows=3,
                                   grid_cols=3, dense_brief=False)
    smooth = F._boxfilter(jnp.asarray(image), cfg.smoothing_window)

    # keypoints anywhere inside the BORDER margin
    n = 40
    y = rng.randint(F.BORDER, H - F.BORDER, n)
    x = rng.randint(F.BORDER, W - F.BORDER, n)
    uv = jnp.asarray(np.stack([x, y], axis=1).astype(np.float32))
    valid = jnp.ones(n, bool)

    ref = np.asarray(F.compute_descriptors(jnp.asarray(image), uv, valid,
                                           cfg))
    planes = brief_bitplanes(smooth, interpret=True)
    got = np.asarray(descriptors_from_planes(
        planes, jnp.asarray(y), jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


def test_dense_brief_invalid_rows_masked(rng):
    H, W = 64, 128
    image = rng.uniform(0, 255, (H, W)).astype(np.float32)
    smooth = F._boxfilter(jnp.asarray(image), 5)
    planes = brief_bitplanes(smooth, interpret=True)
    y = jnp.asarray([H // 2, H // 2])
    x = jnp.asarray([W // 2, W // 2 + 3])
    d = np.asarray(descriptors_from_planes(planes, y, x))
    assert d.shape == (2, 256)
    assert set(np.unique(d)) <= {-1, 1}
