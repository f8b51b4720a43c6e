"""Chunked SLAM stepping: B frames per device program, status machine on device.

Motivation (measured, round 3): on a tunneled TPU every executable
invocation and every host readback costs a ~25 ms round trip REGARDLESS of
compute size — the per-frame jit cadence (adaptor + tracker + readback =
3 round trips/frame) caps the whole system near 13-38 Hz even though the
actual device compute is ~0.05-2 ms/frame.  The fix is architectural, and
it is the right TPU shape even off the tunnel (launch overhead amortization,
SURVEY.md §7.3 hard parts 4/6):

  * ``image_chunk_op`` — ONE jit processes B frames: the batched
    stereo/RGB-D adaptor over the chunk's images (grid-batched dense
    BRIEF), then a ``lax.scan`` of the
    fused tracker step, WITH the reference's per-frame status machine
    (Initializing/Tracking/Lost, app_benchmark.cpp:123-178) and the
    viewpoint splitting criterion (kitti.conf:542-550) evaluated ON DEVICE:
    when a frame splits or loses tracking, the scan itself finishes the
    local map (its arena is emitted in the per-frame ys) and restarts
    tracking in a fresh arena — no host round trip, no speculation
    rollback.  The host gets one [B, 28] packet per chunk.
  * ``split_op`` — ONE jit per finished map runs everything the reference
    does at a split (app_benchmark.cpp:136-161): budget selection + closure
    database insert, the fused loop query + K-candidate validation,
    closure-factor insertion for every ACCEPTED candidate (acceptance
    gates evaluated on device), conditional global PGO, and the odometry
    edge + new pose of the next map.  Its decision packet streams back for
    deferred host consumption; only relocalization (rare) needs host
    intervention.
  * ``reloc_op`` — ONE jit rebuilds the tracker state inside a reloaded
    old map (closure-correspondence merge + graph fixups).

Frame-level math is IDENTICAL to models/tracker.track_step driven by the
synchronous orchestrator — pinned by tests/test_chunked.py equivalence.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import config as cfg
from ..ops import se3
from ..ops import pgo
from ..ops.pinhole import Camera
from . import landmarks as lm
from . import loop_closure
from .frontend import adapt_rgbd_batch, adapt_stereo_batch
from .tracker import TrackerConfig, TrackerState, initial_state, track_step

# ---------------------------------------------------------------------------
# per-frame packet layout ([PACKET_SIZE] f32, one row per frame)
# ---------------------------------------------------------------------------
PKT_INLIERS = 0
PKT_TRANS = 1
PKT_ROT = 2
PKT_MATCHES = 3
PKT_MERGES = 4
PKT_ADDITIONS = 5
PKT_CHI = 6
PKT_STAGE = 7
PKT_FINISH = 8        # 0 = none, 1 = split, 2 = lost
PKT_ACTIVE = 9        # 0 = frame outside the [lo, hi) active window
PKT_T = 10            # 10..21: pre-reset T_lm_robot[:3, :] row-major
PKT_VEL = 22          # 22..27: post-frame velocity twist
PACKET_SIZE = 28

FINISH_NONE = 0.0
FINISH_SPLIT = 1.0
FINISH_LOST = 2.0


class ChunkYs(NamedTuple):
    """Per-frame stacked outputs of one chunk (leading axis B)."""

    packets: jnp.ndarray       # [B, PACKET_SIZE] f32
    arenas: lm.LandmarkArena   # [B, ...] post-update (pre-reset) arenas
    match_idx: jnp.ndarray     # [B, N] int32 (local BA / diagnostics)
    match_mask: jnp.ndarray    # [B, N] bool


def _tree_select(pred, a, b):
    """Scalar-predicate select over two identical pytrees."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def _scan_body(state: TrackerState, frames_in_map, pts, desc, valid, active,
               cam: Camera, tcfg: TrackerConfig, model: str,
               min_track_inliers: int, max_translation: float,
               max_rotation: float):
    """One frame of the chunk: tracker step + on-device status machine."""
    new_state, stats, _X = track_step(state, pts, desc, valid, cam, tcfg,
                                      model)
    initializing = frames_in_map == 0
    lost = (~initializing) & (stats.num_inliers < min_track_inliers)
    split = ((~initializing) & (~lost)
             & ((stats.trans_in_map > max_translation)
                | (stats.rot_in_map > max_rotation)))
    finish = (lost | split) & active

    # reset on finish: fresh arena, identity pose; split keeps the velocity,
    # lost zeroes it (models/slam.py::_handle_lost / reference matcher
    # total-loss recovery)
    fresh = initial_state(state.arena.capacity,
                          estimator=tcfg.landmark_estimator)
    vel = jnp.where(lost, jnp.zeros(6, jnp.float32), new_state.velocity)
    reset_state = fresh._replace(velocity=vel)
    next_state = _tree_select(finish, reset_state, new_state)
    next_state = _tree_select(active, next_state, state)
    next_fim = jnp.where(
        active, jnp.where(finish, 0, frames_in_map + 1), frames_in_map)

    finish_code = jnp.where(
        finish, jnp.where(lost, FINISH_LOST, FINISH_SPLIT), FINISH_NONE)
    packet = jnp.concatenate([
        jnp.stack([
            stats.num_inliers.astype(jnp.float32),
            stats.trans_in_map,
            stats.rot_in_map,
            stats.num_matches.astype(jnp.float32),
            stats.num_merges.astype(jnp.float32),
            stats.num_additions.astype(jnp.float32),
            stats.chi_per_inlier,
            stats.matcher_stage.astype(jnp.float32),
            finish_code,
            active.astype(jnp.float32),
        ]),
        new_state.T_lm_robot[:3, :].reshape(12),
        new_state.velocity,
    ])
    ys = ChunkYs(
        packets=packet,
        arenas=new_state.arena,      # pre-reset: the finished map on finish
        match_idx=stats.match_idx,
        match_mask=stats.match_mask,
    )
    return next_state, next_fim, ys


@partial(jax.jit, static_argnames=(
    "cam", "acfg", "tcfg", "model", "chunk_size", "min_track_inliers",
    "max_translation", "max_rotation"))
def image_chunk_op(
    state: TrackerState,
    frames_in_map,          # [] int32 device scalar (carried across chunks)
    a_all: jnp.ndarray,     # [T, H, W] left / intensity image sequence
    b_all: jnp.ndarray,     # [T, H, W] right / raw-depth image sequence
    start,                  # [] int32: first frame of this chunk in a_all
    lo,                     # [] int32: first ACTIVE frame within the chunk
    hi,                     # [] int32: end of the active window (<= B)
    cam: Camera,
    acfg,                   # StereoAdaptorConfig | DepthAdaptorConfig
    tcfg: TrackerConfig,
    model: str,
    chunk_size: int,
    min_track_inliers: int,
    max_translation: float,
    max_rotation: float,
):
    """B frames in one device program: vmapped adaptor + scanned tracker.

    ``lo``/``hi`` implement replay (relocalization restart mid-chunk) and
    the padded final chunk without recompilation: frames outside [lo, hi)
    pass the carry through untouched and are flagged inactive in their
    packet.  Returns (state', frames_in_map', ChunkYs).
    """
    B = chunk_size
    a = jax.lax.dynamic_slice_in_dim(a_all, start, B, 0)
    b = jax.lax.dynamic_slice_in_dim(b_all, start, B, 0)
    # batched adaptors, NOT vmap(adapt_*): the dense BRIEF Pallas kernel
    # must batch through its grid (ops/features.extract_features_batch)
    if model == "stereo":
        meas = adapt_stereo_batch(a, b, acfg)
    else:
        meas = adapt_rgbd_batch(a, b, acfg)

    def body(carry, xs):
        st, fim, idx = carry
        pts, desc, valid = xs
        active = (idx >= lo) & (idx < hi)
        st2, fim2, ys = _scan_body(
            st, fim, pts, desc, valid, active, cam, tcfg, model,
            min_track_inliers, max_translation, max_rotation)
        return (st2, fim2, idx + 1), ys

    (state, frames_in_map, _), ys = jax.lax.scan(
        body, (state, frames_in_map, jnp.int32(0)),
        (meas.points, meas.desc, meas.valid),
    )
    return state, frames_in_map, ys


@partial(jax.jit, static_argnames=(
    "cam", "tcfg", "model", "chunk_size", "min_track_inliers",
    "max_translation", "max_rotation"))
def meas_chunk_op(
    state: TrackerState,
    frames_in_map,
    points_all: jnp.ndarray,    # [T, N, D] pre-adapted measurement sequence
    desc_all: jnp.ndarray,      # [T, N, 256]
    valid_all: jnp.ndarray,     # [T, N]
    start, lo, hi,
    cam: Camera,
    tcfg: TrackerConfig,
    model: str,
    chunk_size: int,
    min_track_inliers: int,
    max_translation: float,
    max_rotation: float,
):
    """Chunk over pre-adapted measurement sequences (synthetic / test path)."""
    B = chunk_size
    pts = jax.lax.dynamic_slice_in_dim(points_all, start, B, 0)
    desc = jax.lax.dynamic_slice_in_dim(desc_all, start, B, 0)
    valid = jax.lax.dynamic_slice_in_dim(valid_all, start, B, 0)

    def body(carry, xs):
        st, fim, idx = carry
        p, d, v = xs
        active = (idx >= lo) & (idx < hi)
        st2, fim2, ys = _scan_body(
            st, fim, p, d, v, active, cam, tcfg, model,
            min_track_inliers, max_translation, max_rotation)
        return (st2, fim2, idx + 1), ys

    (state, frames_in_map, _), ys = jax.lax.scan(
        body, (state, frames_in_map, jnp.int32(0)), (pts, desc, valid),
    )
    return state, frames_in_map, ys


# ---------------------------------------------------------------------------
# split op: everything the reference does when a local map finishes
# ---------------------------------------------------------------------------

class SplitResult(NamedTuple):
    graph: pgo.PoseGraph
    edge_count: jnp.ndarray      # [] int32 (device-threaded edge cursor)
    db: loop_closure.DescriptorDatabase
    packet: jnp.ndarray          # [2 + K*22] f32 decision packet
    finished_arena: lm.LandmarkArena   # the closed map (relocalizer store)
    query_arena: lm.LandmarkArena      # its budget-compacted db view
    db_rows: jnp.ndarray         # [budget] int32 compacted arena rows
    db_n: jnp.ndarray            # [] int32
    match_row: jnp.ndarray       # [K, Q] closure corresp. (reloc)
    match_mask: jnp.ndarray      # [K, Q]
    T_candidates: jnp.ndarray    # [K, 4, 4]


@partial(jax.jit, static_argnames=(
    "loop_cfg", "pgo_cfg", "budget", "num_maps_cap", "do_loop", "insert_db"))
def split_op(
    graph: pgo.PoseGraph,
    edge_count,                  # [] int32 device scalar
    arenas: lm.LandmarkArena,    # [B, ...] chunk ys arenas
    j,                           # [] int32 chunk-frame index of the finish
    T_finish: jnp.ndarray,       # [4, 4] robot-in-finished-map at the finish
    prev_map,                    # finished map id (int)
    new_map,                     # id of the map opened after it (int)
    db: loop_closure.DescriptorDatabase,
    loop_cfg: loop_closure.LoopDetectorConfig,
    pgo_cfg: pgo.PGOConfig,
    budget: int,
    num_maps_cap: int,
    do_loop: bool,
    insert_db: bool,
) -> SplitResult:
    """Close local map ``prev_map`` and open ``new_map`` — one dispatch.

    Mirrors the split block of the reference top loop
    (app_benchmark.cpp:136-161): database insert, loopDetect/loopValidate
    (K candidates, device-evaluated acceptance gates kitti.conf:970-977),
    closure factors for every accepted candidate, conditional global PGO,
    makeNewMap pose + odometry factor.  The host reads only ``packet``
    (deferred): [edge_count_after, db_rows_inserted, then per candidate
    the 22-float decision row of loop_closure.detect_and_validate].
    """
    arena = jax.tree_util.tree_map(lambda x: x[j], arenas)

    # makeNewMap: pose chain + odometry factor (Z == T_finish by def.)
    pose_new = graph.poses[prev_map] @ T_finish
    graph = pgo.add_pose(graph, new_map, pose_new)
    graph = pgo.add_edge(graph, edge_count, prev_map, new_map, T_finish)
    edge_count = edge_count + 1

    compact, rows_b, n_b = loop_closure.compact_arena(arena, budget)
    if insert_db:
        db = loop_closure.add_local_map(
            db, compact.desc, compact.pos, compact.valid, prev_map, rows_b)

    K = loop_cfg.max_candidates
    if do_loop:
        # query + validation run on the FULL arena (compaction only feeds
        # the db insert: budget-sized queries starve the vote count and
        # measured no speedup — the split op is not the pipeline's cost)
        result, closures, cpacket = loop_closure.detect_and_validate(
            arena.desc, arena.valid, arena.pos, prev_map, db,
            graph.poses, loop_cfg, num_maps_cap)
        accepted = closures.accepted & (result.candidate_maps >= 0)
        # closure factors for every accepted candidate, scattered after the
        # odometry edge (cand -> prev_map, Z = T_query_in_ref)
        offs = jnp.cumsum(accepted.astype(jnp.int32)) - 1
        slot = jnp.where(accepted, edge_count + offs, graph.edge_capacity)

        def pad(a):
            return jnp.concatenate(
                [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0)

        E = graph.edge_capacity
        graph = graph._replace(
            edge_i=pad(graph.edge_i).at[slot].set(
                result.candidate_maps)[:E],
            edge_j=pad(graph.edge_j).at[slot].set(jnp.int32(prev_map))[:E],
            edge_Z=pad(graph.edge_Z).at[slot].set(closures.T_query_in_ref)[:E],
            edge_weight=pad(graph.edge_weight).at[slot].set(1.0)[:E],
            edge_valid=pad(graph.edge_valid).at[slot].set(True)[:E],
        )
        edge_count = edge_count + jnp.sum(accepted)
        graph = jax.lax.cond(
            jnp.any(accepted),
            lambda g: pgo.optimize(g, pgo_cfg)[0],
            lambda g: g,
            graph,
        )
        match_row, match_mask = result.match_row, result.match_mask
        T_candidates = closures.T_query_in_ref
    else:
        Q = arena.capacity
        cpacket = jnp.zeros((K, 22), jnp.float32).at[:, 0].set(-1.0)
        match_row = jnp.full((K, Q), -1, jnp.int32)
        match_mask = jnp.zeros((K, Q), bool)
        T_candidates = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                        (K, 4, 4))

    packet = jnp.concatenate([
        jnp.stack([edge_count.astype(jnp.float32),
                   n_b.astype(jnp.float32)]),
        cpacket.reshape(-1),
    ])
    return SplitResult(
        graph=graph, edge_count=edge_count, db=db, packet=packet,
        finished_arena=arena, query_arena=compact,
        db_rows=rows_b, db_n=n_b, match_row=match_row,
        match_mask=match_mask, T_candidates=T_candidates,
    )


# ---------------------------------------------------------------------------
# relocalization op: reload an old local map through the closure
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_insertions", "estimator"))
def reloc_op(
    graph: pgo.PoseGraph,
    ref_arena: lm.LandmarkArena,     # the reloaded old map's arena
    query_arena: lm.LandmarkArena,   # the finished query map's arena
    T_candidates: jnp.ndarray,       # [K, 4, 4] validated closure transforms
    match_row: jnp.ndarray,          # [K, Q]
    match_mask: jnp.ndarray,         # [K, Q]
    k,                               # [] int32: accepted candidate index
    T_split: jnp.ndarray,            # [4, 4] robot in query map at the split
    velocity: jnp.ndarray,           # [6] post-split velocity twist
    dead_map,                        # speculatively-opened map to retire
    dead_edge_slot,                  # its odometry edge slot ([] int32)
    max_insertions: int,
    estimator: str,
):
    """Rebuild tracking inside a reloaded map (MultiRelocalizer3D analog).

    One dispatch: closure-correspondence merge of the query map into the
    reference arena (models/landmarks.merge_closure — the reference's
    tracker->setClosure flow), retirement of the speculatively-opened map's
    pose + odometry factor, and the new TrackerState.
    """
    T_qref = T_candidates[k]
    merged = lm.merge_closure(ref_arena, query_arena, T_qref, match_row[k],
                              match_mask[k], max_insertions)
    graph = graph._replace(
        pose_valid=graph.pose_valid.at[dead_map].set(False),
        edge_valid=graph.edge_valid.at[dead_edge_slot].set(False),
    )
    fresh = initial_state(ref_arena.capacity, estimator=estimator)
    state = fresh._replace(
        arena=merged,
        T_lm_robot=(T_qref @ T_split).astype(jnp.float32),
        velocity=velocity,
    )
    return graph, state
