import sys; sys.path.insert(0, "/root/repo")
import time, dataclasses, jax, jax.numpy as jnp
import bench
from srrg2_proslam_tpu.models import slam as S
from srrg2_proslam_tpu.models.slam import GraphSLAM
from srrg2_proslam_tpu.models.frontend import StereoAdaptorConfig

cam, images = bench._render_sequence(253)
left_all = jnp.stack([l for l, r in images])
right_all = jnp.stack([r for l, r in images])
acfg = StereoAdaptorConfig()
n = int(left_all.shape[0])

events = []
orig_dispatch = GraphSLAM._dispatch_chunk
orig_consume = GraphSLAM._consume_chunk
def dispatch(self, start, lo, hi):
    t0 = time.perf_counter(); orig_dispatch(self, start, lo, hi)
    events.append(("dispatch", start, t0, time.perf_counter()))
def consume(self, entry):
    t0 = time.perf_counter(); orig_consume(self, entry)
    events.append(("consume", entry.start, t0, time.perf_counter()))
GraphSLAM._dispatch_chunk = dispatch
GraphSLAM._consume_chunk = consume

cfg = bench._slam_config(chunk_size=16)
slam = GraphSLAM(cam, cfg, model="stereo")
t0 = time.perf_counter()
slam.process_sequence(left_all, right_all, [0.1*i for i in range(n)], acfg)
jax.block_until_ready(slam.tracker_state.T_lm_robot)
wall = time.perf_counter() - t0
# warm run
events.clear()
slam = GraphSLAM(cam, cfg, model="stereo")
t0 = time.perf_counter()
slam.process_sequence(left_all, right_all, [0.1*i for i in range(n)], acfg)
jax.block_until_ready(slam.tracker_state.T_lm_robot)
wall = time.perf_counter() - t0
print(f"wall {wall*1000:.0f} ms, {n/wall:.1f} fps")
for kind, start, a, b in events:
    print(f"{kind:9s} start={start:4d}  t={1000*(a-t0):7.1f}..{1000*(b-t0):7.1f}  ({1000*(b-a):6.1f} ms)")
