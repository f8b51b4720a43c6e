import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp, numpy as np
from concurrent.futures import ThreadPoolExecutor
import bench
from srrg2_proslam_tpu.models import chunk as C
from srrg2_proslam_tpu.models.slam import GraphSLAM
from srrg2_proslam_tpu.models.frontend import StereoAdaptorConfig

cam, images = bench._render_sequence(64)
left_all = jnp.stack([l for l, r in images])
right_all = jnp.stack([r for l, r in images])
acfg = StereoAdaptorConfig()
cfg = bench._slam_config(chunk_size=16)
slam = GraphSLAM(cam, cfg, model="stereo")
slam._start_sequence(dict(kind="images", a=left_all, b=right_all, acfg=acfg),
                     [0.1*i for i in range(64)], 64)
carry0 = slam._carry
sp = cfg.splitting
common = (cfg.tracker, "stereo", 16, cfg.min_track_inliers,
          sp.maximum_translation_m, sp.maximum_rotation_rad,
          cfg.loop, cfg.pgo, cfg.max_db_descriptors_per_map, True)
fetcher = ThreadPoolExecutor(max_workers=1)

def run(mode, reps=16, lag=2):
    carry = carry0
    futs = []
    for r in range(reps):
        carry, ys = C.fused_image_chunk_op(
            carry, left_all, right_all, 0, 0, 16, cam, acfg, *common)
        if mode == "per_chunk":
            ys.packet.copy_to_host_async()
            futs.append(fetcher.submit(np.asarray, ys.packet))
            while len(futs) > lag:
                futs.pop(0).result()
        elif mode == "tail_async":
            ys.packet.copy_to_host_async()
            futs.append(ys.packet)
    for f in futs:
        (f.result() if mode == "per_chunk" else np.asarray(f))
    np.asarray(ys.packet)
    return carry

for mode in ("none", "tail_async", "per_chunk"):
    run(mode, reps=2)  # warm
    t0 = time.perf_counter(); run(mode); dt = time.perf_counter() - t0
    print(f"{mode}: {dt*1000:.1f} ms for 256 frames = {dt*1000/256:.2f} ms/frame")
