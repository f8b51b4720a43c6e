import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp
import bench
from srrg2_proslam_tpu.models import chunk as C
from srrg2_proslam_tpu.models.slam import GraphSLAM
from srrg2_proslam_tpu.models.frontend import StereoAdaptorConfig

cam, images = bench._render_sequence(64)
left_all = jnp.stack([l for l, r in images])
right_all = jnp.stack([r for l, r in images])
acfg = StereoAdaptorConfig()
cfg = bench._slam_config(chunk_size=16)

# build a carry via the orchestrator's init
slam = GraphSLAM(cam, cfg, model="stereo")
slam._start_sequence(dict(kind="images", a=left_all, b=right_all, acfg=acfg),
                     [0.1*i for i in range(64)], 64)
carry = slam._carry
sp = cfg.splitting
common = (cfg.tracker, "stereo", 16, cfg.min_track_inliers,
          sp.maximum_translation_m, sp.maximum_rotation_rad,
          cfg.loop, cfg.pgo, cfg.max_db_descriptors_per_map, True)

def run_op(carry, grp, reps):
    for _ in range(reps):
        carry, ys = C.fused_image_chunk_op(
            carry, left_all, right_all, 0, 0, 16*grp, cam, acfg, *common,
            group_size=grp)
    import numpy as np
    np.asarray(ys.packet)  # force full readback
    return carry

for grp, reps in ((1, 16), (4, 4), (16, 1)):
    run_op(carry, grp, 1)  # compile
    t0 = time.perf_counter(); run_op(carry, grp, reps)
    dt = time.perf_counter() - t0
    frames = 16*grp*reps
    print(f"group={grp} x{reps} dispatches: {dt*1000:.1f} ms total, {dt*1000/frames:.2f} ms/frame")
