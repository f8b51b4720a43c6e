"""Pallas FAST kernel must be bit-identical to the XLA reference path."""
import numpy as np
import jax.numpy as jnp

from srrg2_proslam_tpu.ops.features import fast_scores
from srrg2_proslam_tpu.ops.fast_pallas import fast_scores_pallas


def test_pallas_fast_matches_xla(rng):
    img = jnp.asarray(rng.uniform(0, 255, (120, 200)).astype(np.float32))
    a = np.asarray(fast_scores(img, 15.0))
    b = np.asarray(fast_scores_pallas(img, 15.0, interpret=True))
    # interior only: the zero-padded borders differ from roll wrap-around,
    # and both regions are masked by the detector's BORDER margin
    np.testing.assert_array_equal(a[8:-8, 8:-8], b[8:-8, 8:-8])
    assert (a[8:-8, 8:-8] > 0).sum() > 50  # the image actually has corners


def test_pallas_fast_threshold(rng):
    img = jnp.asarray(rng.uniform(0, 255, (64, 160)).astype(np.float32))
    hi = np.asarray(fast_scores_pallas(img, 100.0, interpret=True))
    lo = np.asarray(fast_scores_pallas(img, 10.0, interpret=True))
    assert (hi > 0).sum() < (lo > 0).sum()
    # scores at surviving pixels are independent of the threshold
    m = hi > 0
    np.testing.assert_array_equal(hi[m], lo[m])
