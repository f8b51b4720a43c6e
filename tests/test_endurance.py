"""Endurance system test: a 192-frame square loop with right-angle turns.

Exercises the full stack at once — dozens of local-map splits, turning
motion near the matcher's radius budget, loss recovery, loop closure and
PGO — the class of integration failure the short fixtures cannot catch
(a stale-velocity dead-reckoning bug found by this scenario produced 54 m
of drift before the LOST path reset the motion model).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from srrg2_proslam_tpu.models.loop_closure import LoopDetectorConfig
from srrg2_proslam_tpu.models.slam import (
    GraphSLAM, GraphSLAMConfig, SplittingConfig,
)
from srrg2_proslam_tpu.metrics import trajectory as tm
from srrg2_proslam_tpu.ops import se3
from tests.test_slam import CAM, _stereo_measurements


@pytest.mark.slow
def test_square_loop_endurance(rng):
    pts_w = np.stack([
        rng.uniform(-15, 25, 1500),
        rng.uniform(-5, 5, 1500),
        rng.uniform(-15, 25, 1500),
    ], 1).astype(np.float32)
    desc = rng.choice(np.array([-1, 1], np.int8), size=(1500, 256))
    config = GraphSLAMConfig(
        splitting=SplittingConfig(maximum_translation_m=3.0,
                                  maximum_rotation_rad=0.5),
        loop=LoopDetectorConfig(minimum_age_difference=5, minimum_matches=25),
        arena_capacity=2048,
        database_capacity=65536,
        enable_loop_closing=True,
    )
    slam = GraphSLAM(CAM, config)
    T_wc = np.eye(4, dtype=np.float32)
    gt = []

    def advance(dz=0.0, dyaw=0.0):
        nonlocal T_wc
        M = np.asarray(se3.exp(jnp.asarray(
            np.array([0, 0, -dz, 0, dyaw, 0], np.float32))))
        T_wc = M @ T_wc

    frames = 0
    for _ in range(4):                       # 4 sides of a 10 m square
        for _ in range(25):
            p, d, ok = _stereo_measurements(pts_w, desc, T_wc)
            slam.process(p, d, ok, 0.1 * frames)
            frames += 1
            gt.append(np.linalg.inv(T_wc))
            advance(dz=0.4)
        for _ in range(23):                  # 90 deg turn, ~4 deg/frame
            p, d, ok = _stereo_measurements(pts_w, desc, T_wc)
            slam.process(p, d, ok, 0.1 * frames)
            frames += 1
            gt.append(np.linalg.inv(T_wc))
            advance(dyaw=np.pi / 2 / 23)

    traj = slam.trajectory()
    assert len(traj) == frames
    assert slam.num_maps > 10                # splits happened throughout
    errs = [np.linalg.norm(t[:3, 3] - g[:3, 3]) for t, g in zip(traj, gt)]
    # generous endurance bound: the stale-velocity bug produced ~23 m mean
    assert np.mean(errs) < 2.5, np.mean(errs)
    e = tm.evaluate(traj, gt)
    assert e.mean_rotation_deg < 15.0


@pytest.mark.slow
def test_capacity_lifecycle_grows_and_evicts(rng):
    """Tiny initial capacities on a long corridor: the pose graph must grow
    (double-and-copy) instead of crashing, the loop database must evict its
    oldest maps with closures still firing afterwards."""
    n_pts = 600
    pts_w = np.stack([
        rng.uniform(-15, 15, n_pts),
        rng.uniform(-5, 5, n_pts),
        rng.uniform(-5, 45, n_pts),      # corridor along +z
    ], 1).astype(np.float32)
    desc = rng.choice(np.array([-1, 1], np.int8), size=(n_pts, 256))
    config = GraphSLAMConfig(
        splitting=SplittingConfig(maximum_translation_m=0.5),
        loop=LoopDetectorConfig(minimum_age_difference=3, minimum_matches=25),
        arena_capacity=1024,
        max_local_maps=4,                # force growth: the run needs ~50
        max_edges=4,
        database_capacity=2048,          # force eviction
        max_db_descriptors_per_map=128,
        enable_loop_closing=True,
    )
    slam = GraphSLAM(CAM, config)
    # out 14 m and back: ~28 maps out (0.5 m splits), closures on the return
    zs = list(np.arange(0, 14.0, 0.25)) + list(np.arange(14.0, -0.01, -0.25))
    for i, z in enumerate(zs):
        T_wc = np.eye(4, dtype=np.float32)
        T_wc[2, 3] = -z
        p, d, ok = _stereo_measurements(pts_w, desc, T_wc)
        slam.process(p, d, ok, timestamp=0.1 * i)

    assert slam.num_maps > 20                  # grew far past max_local_maps=4
    assert slam.graph.capacity >= slam.num_maps
    assert slam.num_edges > 4                  # edge growth too
    assert slam.num_db_evictions > 0           # database eviction kicked in
    assert slam.num_closures >= 1              # closures still fire after it
    traj = slam.trajectory()
    assert len(traj) == len(zs)
    assert np.linalg.norm(traj[-1][:3, 3]) < 1.0
