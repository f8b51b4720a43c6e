"""Opt-in REAL-TPU smoke lane (VERDICT r3 item 5).

The CPU suite exercises every code path on the 8-virtual-device mesh; this
lane closes the gap between "suite green" and "works on the chip": the
compiled-TPU path of the Pallas kernels, the tracker step, and the fused
chunk op run on the actual device (platform "axon"/"tpu") with numeric
checks.  Mirrors the reference's CI running its gtest binaries on the
target platform (reference srrg2_proslam/tests/CMakeLists.txt:1-65).

Run:  TPU_SMOKE=1 python -m pytest -m tpu tests/test_tpu_smoke.py -v

Without TPU_SMOKE=1 every test here is skipped (tests/conftest.py forces
the virtual CPU mesh for the rest of the suite).
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_device():
    if os.environ.get("TPU_SMOKE") != "1":
        pytest.skip("TPU smoke lane is opt-in: TPU_SMOKE=1")
    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon"):
        pytest.skip(f"no TPU visible (platform {dev.platform!r})")
    # persistent compile cache: the chunk op takes minutes cold on the
    # tunneled device, seconds warm
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
    return dev


def test_tracker_step_on_device(tpu_device):
    """One tracker step on the chip: finite pose, inliers found."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    state, stats, X = jax.jit(fn)(*args)
    T = np.asarray(state.T_lm_robot)
    assert np.all(np.isfinite(T))
    assert int(stats.num_inliers) >= 6      # GraphSLAMConfig.min_track_inliers
    assert np.allclose(T[3], [0, 0, 0, 1], atol=1e-6)


def test_dense_brief_bit_equality_on_device(tpu_device, rng):
    """Dense Pallas BRIEF bitplanes == gather path on the COMPILED TPU
    kernel (the CPU suite only runs it in interpret mode)."""
    from srrg2_proslam_tpu.ops import features as F
    from srrg2_proslam_tpu.ops.brief_pallas import (
        brief_bitplanes, descriptors_from_planes,
    )

    H, W = 96, 160
    image = rng.uniform(0, 255, (H, W)).astype(np.float32)
    cfg = F.FeatureExtractorConfig(max_keypoints=63, grid_rows=3,
                                   grid_cols=3, dense_brief=False)
    smooth = F._boxfilter(jnp.asarray(image), cfg.smoothing_window)
    n = 40
    y = rng.randint(F.BORDER, H - F.BORDER, n)
    x = rng.randint(F.BORDER, W - F.BORDER, n)
    uv = jnp.asarray(np.stack([x, y], axis=1).astype(np.float32))
    ref = np.asarray(F.compute_descriptors(
        jnp.asarray(image), uv, jnp.ones(n, bool), cfg))
    planes = brief_bitplanes(smooth)        # compiled, NOT interpret
    got = np.asarray(descriptors_from_planes(
        planes, jnp.asarray(y), jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


def test_chunked_slam_on_device(tpu_device, rng):
    """Two fused chunks of the full SLAM pipeline on the chip: correct
    frame accounting, splits fire, trajectory advances and stays finite."""
    from srrg2_proslam_tpu.models.loop_closure import LoopDetectorConfig
    from srrg2_proslam_tpu.models.slam import (
        GraphSLAM, GraphSLAMConfig, SplittingConfig,
    )
    from tests.test_slam import CAM, _stereo_measurements

    n_pts = 512
    pts_w = np.stack([
        rng.uniform(-10, 10, n_pts),
        rng.uniform(-4, 4, n_pts),
        rng.uniform(-10, 10, n_pts),
    ], 1).astype(np.float32)
    desc = rng.choice(np.array([-1, 1], np.int8), size=(n_pts, 256))
    frames = []
    for i in range(8):
        T_wc = np.eye(4, dtype=np.float32)
        T_wc[2, 3] = -0.45 * i
        frames.append(_stereo_measurements(pts_w, desc, T_wc))
    config = GraphSLAMConfig(
        splitting=SplittingConfig(maximum_translation_m=1.2),
        loop=LoopDetectorConfig(minimum_age_difference=1),
        arena_capacity=1024,
        database_capacity=8192,
        max_db_descriptors_per_map=512,
        chunk_size=4,
    )
    slam = GraphSLAM(CAM, config)
    pts = jnp.stack([f[0] for f in frames])
    dsc = jnp.stack([f[1] for f in frames])
    val = jnp.stack([f[2] for f in frames])
    slam.process_meas_sequence(pts, dsc, val,
                               [0.1 * i for i in range(len(frames))])
    assert slam._frame_count == 8
    assert slam.num_maps >= 2               # the run split on device
    traj = slam.trajectory()
    assert len(traj) == 8
    assert all(np.all(np.isfinite(T)) for T in traj)
    # the robot advanced roughly 0.45 m/frame along -z of the camera
    adv = np.linalg.norm(traj[-1][:3, 3] - traj[0][:3, 3])
    assert 1.5 < adv < 6.0, adv
