import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
import bench
from srrg2_proslam_tpu.models.slam import GraphSLAM
from srrg2_proslam_tpu.models.frontend import StereoAdaptorConfig

cam, images = bench._render_sequence(253)
left_all = jnp.stack([l for l, r in images])
right_all = jnp.stack([r for l, r in images])
acfg = StereoAdaptorConfig()
n = int(left_all.shape[0])

for lag in (2, 4, 8, 16, 32):
    best = 0.0
    for rep in range(3):
        cfg = bench._slam_config(chunk_size=16)
        import dataclasses; cfg = dataclasses.replace(cfg, chunk_lag=lag)
        slam = GraphSLAM(cam, cfg, model="stereo")
        t0 = time.perf_counter()
        slam.process_sequence(left_all, right_all, [0.1*i for i in range(n)], acfg)
        jax.block_until_ready(slam.tracker_state.T_lm_robot)
        dt = time.perf_counter() - t0
        best = max(best, n/dt)
    print(f"lag={lag}: {best:.1f} fps  maps={slam.num_maps} closures={slam.num_closures} relocs={slam.num_relocalizations}")
