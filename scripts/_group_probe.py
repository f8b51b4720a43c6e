import sys; sys.path.insert(0, "/root/repo")
import time, dataclasses, jax, jax.numpy as jnp
import bench
from srrg2_proslam_tpu.models.slam import GraphSLAM
from srrg2_proslam_tpu.models.frontend import StereoAdaptorConfig

cam, images = bench._render_sequence(253)
left_all = jnp.stack([l for l, r in images])
right_all = jnp.stack([r for l, r in images])
acfg = StereoAdaptorConfig()
n = int(left_all.shape[0])

base = None
for grp in (1, 2, 4, 8):
    best = 0.0
    for rep in range(3):
        cfg = dataclasses.replace(bench._slam_config(chunk_size=16), chunk_group=grp)
        slam = GraphSLAM(cam, cfg, model="stereo")
        t0 = time.perf_counter()
        slam.process_sequence(left_all, right_all, [0.1*i for i in range(n)], acfg)
        jax.block_until_ready(slam.tracker_state.T_lm_robot)
        dt = time.perf_counter() - t0
        best = max(best, n/dt)
    traj = [T[:3, 3].copy() for T in slam.trajectory()]
    if grp == 1:
        base = traj
    import numpy as np
    err = max(float(np.abs(a-b).max()) for a, b in zip(base, traj)) if base else 0.0
    print(f"group={grp}: {best:.1f} fps  maps={slam.num_maps} closures={slam.num_closures} "
          f"relocs={slam.num_relocalizations} traj_dev_vs_g1={err:.2e}")
