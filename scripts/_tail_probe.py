import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp, numpy as np
import bench
from srrg2_proslam_tpu.models.slam import GraphSLAM
from srrg2_proslam_tpu.models import slam as S, chunk as chunk_ops
from srrg2_proslam_tpu.models.frontend import StereoAdaptorConfig

cam, images = bench._render_sequence(253)
left_all = jnp.stack([l for l, r in images])
right_all = jnp.stack([r for l, r in images])
acfg = StereoAdaptorConfig()
n = int(left_all.shape[0])

orig_reloc = GraphSLAM._fused_relocalize
def reloc(self, entry, i, g, k, cand, T_k, row, sm):
    t0 = time.perf_counter()
    # inline the body with timing
    config = self.config
    P = chunk_ops
    self._cqueue.clear()
    carry_fin, ys_fin = self._invoke_chunk(entry.inputs, entry.start, entry.lo, i + 1)
    t1 = time.perf_counter()
    ref_arena = jax.tree_util.tree_map(jnp.asarray, self._get_map_arena(cand))
    t2 = time.perf_counter()
    query_arena = chunk_ops.take_frame(ys_fin.arenas, i)
    graph, state = chunk_ops.reloc_op(
        carry_fin.graph, ref_arena, query_arena,
        chunk_ops.take_frame(ys_fin.loop_T, i),
        chunk_ops.take_frame(ys_fin.loop_row, i),
        chunk_ops.take_frame(ys_fin.loop_mask, i), jnp.int32(k),
        jnp.asarray(np.eye(4, dtype=np.float32) if False else _Tsplit(row)), jnp.asarray(row[P.PKT_VEL:P.PKT_VEL+6].astype(np.float32)),
        int(sm[P.SM_NEW]), int(sm[P.SM_ODO]),
        config.closure_merge_max_insertions, config.tracker.landmark_estimator)
    t3 = time.perf_counter()
    print(f"  reloc: replay-dispatch {1000*(t1-t0):.1f} get_arena {1000*(t2-t1):.1f} reloc_op-dispatch {1000*(t3-t2):.1f}")
    # now do the bookkeeping like the original (duplicating tail of orig)
    self._carry = chunk_ops.ChunkCarry(state=state, frames_in_map=jnp.int32(1),
        graph=graph, edge_count=carry_fin.edge_count, db=carry_fin.db,
        current_map=jnp.int32(cand), num_maps=carry_fin.num_maps)
    self.tracker_state = state; self.graph = graph; self.db = carry_fin.db
    self._map_arenas[cand] = state.arena; self._note_device_arena(cand)
    self.current_map = cand; self._frames_in_current_map = 1
    self.num_relocalizations += 1
    T_split = _Tsplit(row)
    self.frames[-1] = S.FrameRecord(self._seq["ts"][g], cand, (T_k @ T_split).astype(np.float32))
    B = self._chunk_span
    gnext = g + 1
    self._seq_cursor = (gnext // B) * B
    self._seq_lo = gnext - self._seq_cursor

def _Tsplit(row):
    P = chunk_ops
    T = np.eye(4, dtype=np.float32)
    T[:3, :] = row[P.PKT_T:P.PKT_T+12].reshape(3, 4)
    return T
GraphSLAM._fused_relocalize = reloc

orig_consume = GraphSLAM._consume_chunk
import srrg2_proslam_tpu.utils.profiling as prof
def consume(self, entry):
    t0 = time.perf_counter()
    flatf = entry.packet
    flat = flatf.result()
    t1 = time.perf_counter()
    entry = entry._replace(packet=_Done(flat))
    orig_consume(self, entry)
    t2 = time.perf_counter()
    print(f"consume start={entry.start:3d}: pkt_wait {1000*(t1-t0):6.1f} rest {1000*(t2-t1):6.1f}")
class _Done:
    def __init__(self, v): self.v = v
    def result(self): return self.v
GraphSLAM._consume_chunk = consume

cfg = bench._slam_config(chunk_size=16)
for rep in range(2):
    slam = GraphSLAM(cam, cfg, model="stereo")
    t0 = time.perf_counter()
    slam.process_sequence(left_all, right_all, [0.1*i for i in range(n)], acfg)
    jax.block_until_ready(slam.tracker_state.T_lm_robot)
    wall = time.perf_counter() - t0
    if rep == 0: print("--- warm ---")
print(f"wall {wall*1000:.0f} ms, {n/wall:.1f} fps  relocs={slam.num_relocalizations}")
