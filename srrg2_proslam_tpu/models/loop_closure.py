"""Loop-closure detection: sharded Hamming descriptor database + SE3 validation.

Capability parity with the reference's loop-closing stack
(MultiLoopDetectorHBST3D + CorrespondenceFinderHBST_ + srrg_hbst BinaryTree256,
reference srrg2_proslam/src/srrg2_proslam/registration/correspondence_finders/
correspondence_finder_hbst.cpp:41-130 and configurations/kitti.conf:938-978) —
redesigned TPU-first: the HBST binary search tree is replaced by ONE dense
[D_total, 256] descriptor arena queried with an int8 MXU matmul (SURVEY.md
§7.2 step 7: on TPU brute-force popcount-matmul beats tree traversal), which
also queries ALL stored local maps in a single shot exactly like the
reference's one-call-to-tree design.

Flow (mirrors SURVEY.md §3.5):
  1. on local-map split, the map's landmark descriptors + positions (plus
     their arena rows, for closure-correspondence merging) are appended to
     the database with their map id;
  2. a query matches the new map's descriptors against the whole database,
     gated by descriptor distance, Lowe ratio, and the minimum age
     difference (correspondence_finder_hbst.cpp:75-91);
  3. per-reference-map vote counts select the TOP-K candidate maps, and for
     EACH candidate the per-query best match *within that map* is extracted
     (the analog of the reference's per-reference correspondence extraction
     at correspondence_finder_hbst.cpp:95-128 — every qualifying reference
     map gets its own correspondence set, not just the global-argmax one);
  4. every candidate is validated by a point-to-point SE3 GN alignment
     (the "loop_aligner" MultiAligner3DQR with AlignerSliceProcessor3D and
     RobustifierClamp, kitti.conf:649-677) under the acceptance gates
     inliers >= 25, chi/inlier <= 2, inlier ratio >= 0.5
     (kitti.conf:970-977); all K validations run vmapped in one jit.

The database layout ([D, 256] int8 + int32 metadata) is shardable along D
across a device mesh (parallel/spmd.py): each device matches its slice and
the top-candidate reduction is a psum — the multi-host extension of the
same kernel.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import config as cfg
from ..ops import se3
from ..ops.hamming import distance_matrix
from ..ops.gn import gn_iterate, point3_system

# per-map best-match encoding: key = distance * _ROW_SHIFT + db_row.  The
# Hamming distance is integer <= 256 (sentinel 300 for infeasible), db rows
# stay below 2^22 (4M descriptors), so keys peak at 300 * 2^22 + 2^22 - 1
# ≈ 1.26e9 — comfortably inside int32.
_ROW_SHIFT = 1 << 22
_DIST_SENTINEL = 300


@cfg.register
class LoopDetectorConfig:
    """Mirrors MultiLoopDetectorHBST3D params (kitti.conf:938-978)."""

    maximum_descriptor_distance: float = 25.0
    minimum_age_difference: int = 10
    minimum_matches: int = 25
    # within-map Lowe ratio: a query row's best match in a reference map
    # must beat the second best in the SAME map by this ratio
    lowe_ratio: float = 0.8
    # number of candidate reference maps validated per query (the reference
    # validates every qualifying reference map,
    # correspondence_finder_hbst.cpp:95-128; K is the fixed-shape budget)
    max_candidates: int = 4
    # validation aligner (kitti.conf:649-677 "loop_aligner")
    aligner_iterations: int = 30
    chi_threshold: float = 3.0          # RobustifierClamp (kitti.conf:380-408)
    damping: float = 1.0
    # acceptance gates (kitti.conf:970-977)
    relocalize_min_inliers: int = 25
    relocalize_max_chi_inliers: float = 2.0
    relocalize_min_inliers_ratio: float = 0.5
    # 0 = dense query (one [Q, D] cost matrix — fastest while it fits);
    # > 0 = scan the database in chunks of this many rows with running
    # two-best merging, bounding query memory at [Q, tile] for arbitrarily
    # large databases (identical results; must divide database capacity)
    query_tile: int = 0


class DescriptorDatabase(NamedTuple):
    """Fixed-capacity descriptor arena over ALL past local maps."""

    desc: jnp.ndarray       # [D, 256] int8 signed bits
    points: jnp.ndarray     # [D, 3] landmark position in its local-map frame
    map_id: jnp.ndarray     # [D] int32 owning local map
    arena_row: jnp.ndarray  # [D] int32 row in the owning map's landmark arena
    valid: jnp.ndarray      # [D] bool
    size: jnp.ndarray       # [] int32 next free row

    @property
    def capacity(self) -> int:
        return self.desc.shape[0]


def empty_database(capacity: int) -> DescriptorDatabase:
    return DescriptorDatabase(
        desc=jnp.full((capacity, 256), -1, jnp.int8),
        points=jnp.zeros((capacity, 3), jnp.float32),
        map_id=jnp.full((capacity,), -1, jnp.int32),
        arena_row=jnp.zeros((capacity,), jnp.int32),
        valid=jnp.zeros((capacity,), bool),
        size=jnp.int32(0),
    )


@jax.jit
def add_local_map(
    db: DescriptorDatabase,
    desc: jnp.ndarray,      # [M, 256] int8
    points: jnp.ndarray,    # [M, 3] local-map frame
    valid: jnp.ndarray,     # [M] bool
    map_id,
    rows: jnp.ndarray = None,  # [M] int32 arena rows (default: arange)
) -> DescriptorDatabase:
    """Append one local map's landmarks (contiguous scatter at ``size``).

    Mirrors the reference's addPreviousQuery tree insertion
    (correspondence_finder_hbst.cpp:110-128).  Rows beyond capacity drop —
    callers (models/slam.py) detect the would-overflow case beforehand and
    evict old maps instead of silently losing recall.  ``rows`` carries the
    landmark-arena row of each input when the input is a compacted
    (budget-selected) subset of the arena rather than the full arena.
    """
    D = db.capacity
    M = desc.shape[0]
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    dest = db.size + rank
    take = valid & (dest < D)
    dest = jnp.where(take, dest, D)  # overflow sink

    def pad(a):
        return jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0)

    if rows is None:
        rows = jnp.arange(M, dtype=jnp.int32)
    return DescriptorDatabase(
        desc=pad(db.desc).at[dest].set(desc)[:D],
        points=pad(db.points).at[dest].set(points)[:D],
        map_id=pad(db.map_id).at[dest].set(map_id)[:D],
        arena_row=pad(db.arena_row).at[dest].set(rows)[:D],
        valid=pad(db.valid).at[dest].set(True)[:D],
        size=jnp.minimum(db.size + jnp.sum(take), D),
    )


class LoopQueryResult(NamedTuple):
    """Top-K candidate reference maps + per-candidate correspondences.

    All leading-K arrays are ordered by decreasing vote count; rows with
    candidate_maps == -1 are inactive (below the minimum_matches gate).
    """

    candidate_maps: jnp.ndarray  # [K] int32 reference map ids (-1 inactive)
    votes: jnp.ndarray           # [K] int32 global-best matches per candidate
    match_idx: jnp.ndarray       # [K, Q] int32 db row per query row (-1)
    match_row: jnp.ndarray       # [K, Q] int32 arena row in the ref map (-1)
    match_mask: jnp.ndarray      # [K, Q] bool
    match_points: jnp.ndarray    # [K, Q, 3] matched landmark in ref frame


def query_terms(
    query_desc: jnp.ndarray,   # [Q, 256] int8
    query_valid: jnp.ndarray,  # [Q] bool
    query_map_id,              # current map id (age gating)
    db: DescriptorDatabase,
    config: LoopDetectorConfig,
    num_maps: int,
):
    """Shardable inner kernel: per-(query, map) best match + vote histogram.

    Per-reference extraction (the analog of
    correspondence_finder_hbst.cpp:95-128): for EVERY reference map, each
    query row's best and second-best match *within that map* are found by
    two scatter-min passes over encoded (distance, db_row) keys; a row
    votes for a map when its within-map best passes the distance gate and
    the within-map Lowe ratio.  A query row can therefore contribute
    correspondences to several overlapping maps — exactly the behavior the
    reference gets from merged HBST matchables.

    Returns (votes [num_maps], per_map_key [Q, num_maps], vote_ok
    [Q, num_maps]).  When the database is sharded along D, each shard runs
    this on its slice and the combination is an elementwise min over keys
    plus a vote psum (see parallel/spmd.py).
    """
    Q = query_desc.shape[0]
    cost = distance_matrix(query_desc, db.desc)  # [Q, D] int32
    age_ok = (query_map_id - db.map_id) >= config.minimum_age_difference
    feasible = query_valid[:, None] & db.valid[None, :] & age_ok[None, :]
    masked = jnp.where(feasible, cost, _DIST_SENTINEL)

    # best db row per (query, map) as encoded int32 keys
    rows = jnp.arange(db.capacity, dtype=jnp.int32)[None, :]
    key = masked * _ROW_SHIFT + rows                       # [Q, D] int32
    col = jnp.clip(db.map_id, 0, num_maps)                 # invalid rows -> sink
    sentinel = jnp.iinfo(jnp.int32).max
    full = jnp.full((Q, num_maps + 1), sentinel, jnp.int32)
    per_map_key = full.at[:, col].min(key)[:, :num_maps]   # [Q, num_maps]

    # second best within the same map (for the Lowe ratio)
    is_best = key == jnp.concatenate(
        [per_map_key, jnp.full((Q, 1), sentinel, jnp.int32)], axis=1
    )[:, col]
    key2 = jnp.where(is_best, sentinel, key)
    second_key = full.at[:, col].min(key2)[:, :num_maps]

    d1 = (per_map_key // _ROW_SHIFT).astype(jnp.float32)
    d2 = jnp.minimum(second_key // _ROW_SHIFT, _DIST_SENTINEL).astype(jnp.float32)
    vote_ok = (
        query_valid[:, None]
        & (d1 <= config.maximum_descriptor_distance)
        & (d1 <= config.lowe_ratio * d2)
    )
    votes = jnp.sum(vote_ok, axis=0).astype(jnp.int32)
    return votes, per_map_key, vote_ok


def query_terms_tiled(
    query_desc: jnp.ndarray,
    query_valid: jnp.ndarray,
    query_map_id,
    db: DescriptorDatabase,
    config: LoopDetectorConfig,
    num_maps: int,
    tile: int,
):
    """Constant-memory variant of ``query_terms`` (VERDICT r2 item 9).

    Scans the database in [tile]-row chunks with a running two-best merge
    per (query, map): each chunk contributes its within-chunk best and
    second-best encoded keys, and the cross-chunk merge
    ``b2' = min(b2, t2, max(b1, t1))`` is exact because every key is unique
    (the db row is encoded in the low bits).  Peak intermediate memory is
    [Q, tile] instead of [Q, D] — the query scales to arbitrarily large
    ``database_capacity`` with bit-identical results to the dense path.
    """
    Q = query_desc.shape[0]
    D = db.capacity
    if D % tile != 0:
        raise ValueError(f"query_tile {tile} must divide capacity {D}")
    n_tiles = D // tile
    sentinel = jnp.iinfo(jnp.int32).max
    desc_t = db.desc.reshape(n_tiles, tile, db.desc.shape[1])
    map_t = db.map_id.reshape(n_tiles, tile)
    valid_t = db.valid.reshape(n_tiles, tile)
    rows0 = jnp.arange(tile, dtype=jnp.int32)
    full = jnp.full((Q, num_maps + 1), sentinel, jnp.int32)

    def body(carry, inp):
        b1, b2 = carry
        desc, mid, val, t_idx = inp
        cost = distance_matrix(query_desc, desc)          # [Q, tile]
        age_ok = (query_map_id - mid) >= config.minimum_age_difference
        feasible = query_valid[:, None] & val[None, :] & age_ok[None, :]
        masked = jnp.where(feasible, cost, _DIST_SENTINEL)
        key = masked * _ROW_SHIFT + (t_idx * tile + rows0)[None, :]
        col = jnp.clip(mid, 0, num_maps)
        t1 = full.at[:, col].min(key)
        is_best = key == t1[:, col]
        t2 = full.at[:, col].min(jnp.where(is_best, sentinel, key))
        nb1 = jnp.minimum(b1, t1)
        nb2 = jnp.minimum(jnp.minimum(b2, t2), jnp.maximum(b1, t1))
        return (nb1, nb2), None

    (b1, b2), _ = jax.lax.scan(
        body, (full, full),
        (desc_t, map_t, valid_t, jnp.arange(n_tiles, dtype=jnp.int32)),
    )
    per_map_key = b1[:, :num_maps]
    second_key = b2[:, :num_maps]
    d1 = (per_map_key // _ROW_SHIFT).astype(jnp.float32)
    d2 = jnp.minimum(second_key // _ROW_SHIFT, _DIST_SENTINEL).astype(
        jnp.float32)
    vote_ok = (
        query_valid[:, None]
        & (d1 <= config.maximum_descriptor_distance)
        & (d1 <= config.lowe_ratio * d2)
    )
    votes = jnp.sum(vote_ok, axis=0).astype(jnp.int32)
    return votes, per_map_key, vote_ok


@partial(jax.jit, static_argnames=("config", "num_maps"))
def query(
    query_desc: jnp.ndarray,
    query_valid: jnp.ndarray,
    query_map_id,
    db: DescriptorDatabase,
    config: LoopDetectorConfig,
    num_maps: int,
) -> LoopQueryResult:
    """Match a local map against the whole database; return top-K candidates."""
    if config.query_tile > 0:
        votes, per_map_key, vote_ok = query_terms_tiled(
            query_desc, query_valid, query_map_id, db, config, num_maps,
            config.query_tile,
        )
    else:
        votes, per_map_key, vote_ok = query_terms(
            query_desc, query_valid, query_map_id, db, config, num_maps
        )
    K = min(config.max_candidates, num_maps)
    top_votes, top_maps = jax.lax.top_k(votes, K)
    found = top_votes >= config.minimum_matches
    cands = jnp.where(found, top_maps, -1).astype(jnp.int32)

    keys = per_map_key[:, jnp.maximum(top_maps, 0)].T      # [K, Q]
    idx = keys % _ROW_SHIFT
    mask = found[:, None] & vote_ok[:, jnp.maximum(top_maps, 0)].T
    return LoopQueryResult(
        candidate_maps=cands,
        votes=top_votes,
        match_idx=jnp.where(mask, idx, -1).astype(jnp.int32),
        match_row=jnp.where(mask, db.arena_row[jnp.clip(idx, 0, db.capacity - 1)], -1),
        match_mask=mask,
        match_points=db.points[jnp.clip(idx, 0, db.capacity - 1)],
    )


class ClosureResult(NamedTuple):
    """Per-candidate validation outputs (leading axis K when batched)."""

    T_query_in_ref: jnp.ndarray  # [.., 4, 4] transform of query map in ref frame
    num_inliers: jnp.ndarray
    chi_per_inlier: jnp.ndarray
    inlier_ratio: jnp.ndarray    # inliers / correspondences
    accepted: jnp.ndarray        # [..] bool — all gates passed


def _validate_one(query_points, match_points, match_mask, T_init,
                  config: LoopDetectorConfig) -> ClosureResult:
    weights = jnp.ones((query_points.shape[0],), jnp.float32)
    system = lambda X: point3_system(
        X, query_points, match_points, weights, match_mask,
        chi_threshold=config.chi_threshold,
    )
    X, stats = gn_iterate(
        system, T_init, config.aligner_iterations,
        damping=config.damping, min_inliers=config.relocalize_min_inliers,
    )
    n_corr = jnp.maximum(jnp.sum(match_mask), 1)
    chi_per_inlier = stats.chi_total / jnp.maximum(stats.num_inliers, 1)
    ratio = stats.num_inliers / n_corr
    accepted = (
        (stats.num_inliers >= config.relocalize_min_inliers)
        & (chi_per_inlier <= config.relocalize_max_chi_inliers)
        & (ratio >= config.relocalize_min_inliers_ratio)
    )
    return ClosureResult(
        T_query_in_ref=X,
        num_inliers=stats.num_inliers,
        chi_per_inlier=chi_per_inlier,
        inlier_ratio=ratio,
        accepted=accepted,
    )


@partial(jax.jit, static_argnames="config")
def validate(
    query_points: jnp.ndarray,   # [Q, 3] query-map frame
    match_points: jnp.ndarray,   # [Q, 3] ref-map frame
    match_mask: jnp.ndarray,     # [Q] bool
    T_init: jnp.ndarray,         # [4, 4] initial guess
    config: LoopDetectorConfig,
) -> ClosureResult:
    """Point-to-point SE3 validation of one closure candidate.

    The estimate maps query-map points into the reference-map frame
    (moving = query, fixed = reference), mirroring the loop_aligner slice
    (AlignerSliceProcessor3D, RobustifierClamp chi=3).
    """
    return _validate_one(query_points, match_points, match_mask, T_init, config)


@partial(jax.jit, static_argnames="budget")
def select_db_rows(arena_desc, arena_pos, arena_valid, arena_num_updates,
                   budget: int = 1024):
    """Compact the per-map database budget ON DEVICE (VERDICT r2 item 3).

    The most mature (highest num_updates) valid landmarks win; ties break
    by arena row (stable argsort) — identical selection to the former
    host-side ``_db_select_budget`` without the full-arena readback.
    Returns (desc [B,256], points [B,3], rows [B] int32, valid [B], n []).
    """
    key = jnp.where(arena_valid, -arena_num_updates, jnp.int32(1 << 30))
    order = jnp.argsort(key, stable=True)[:budget].astype(jnp.int32)
    sel_valid = arena_valid[order]
    return (arena_desc[order], arena_pos[order], order, sel_valid,
            jnp.sum(sel_valid).astype(jnp.int32))


def compact_arena(arena, budget: int):
    """Budget-compacted view of an arena + the selected rows.

    The compacted rows are a local map's REPRESENTATION in the closure
    subsystem: exactly the rows inserted into the database also form the
    query and closure-validation set — 4x less Hamming/GN work at the
    default budget vs querying the full arena, with the most mature (most
    re-observed, most reliable) landmarks doing the talking.  Returns
    (compacted LandmarkArena [budget], rows [budget] int32, n []).
    """
    from . import landmarks as lm

    desc_b, pts_b, rows_b, valid_b, n_b = select_db_rows(
        arena.desc, arena.pos, arena.valid, arena.num_updates,
        budget=budget)
    compact = lm.LandmarkArena(
        pos=pts_b,
        cov=arena.cov[rows_b],
        desc=desc_b,
        num_updates=arena.num_updates[rows_b],
        valid=valid_b,
    )
    return compact, rows_b, n_b


@partial(jax.jit, static_argnames=("config", "num_maps"))
def detect_and_validate(
    query_desc: jnp.ndarray,
    query_valid: jnp.ndarray,
    query_pos: jnp.ndarray,      # [Q, 3] query-map frame landmark positions
    query_map_id,
    db: DescriptorDatabase,
    poses: jnp.ndarray,          # [N, 4, 4] current graph estimates
    config: LoopDetectorConfig,
    num_maps: int,
):
    """Fused split-time loop detection: query + batched validation + packet.

    ONE dispatch producing everything the host decision needs in a single
    [K, 22] f32 ``packet`` (candidate id, accepted, num_inliers,
    chi_per_inlier, inlier_ratio, votes, T_query_in_ref.ravel()) so the
    orchestrator issues one async host copy and defers the closure /
    relocalization decision instead of blocking twice per split
    (VERDICT r2 items 1 and 3).  Returns (result, closures, packet).
    """
    result = query(query_desc, query_valid, query_map_id, db, config,
                   num_maps)
    T_init = jax.vmap(
        lambda c: se3.inverse(poses[jnp.maximum(c, 0)]) @ poses[query_map_id]
    )(result.candidate_maps)
    closures = validate_batch(query_pos, result, T_init, config)
    active = result.candidate_maps >= 0
    packet = jnp.concatenate([
        result.candidate_maps.astype(jnp.float32)[:, None],
        (closures.accepted & active).astype(jnp.float32)[:, None],
        closures.num_inliers.astype(jnp.float32)[:, None],
        closures.chi_per_inlier[:, None],
        closures.inlier_ratio[:, None],
        result.votes.astype(jnp.float32)[:, None],
        closures.T_query_in_ref.reshape(-1, 16),
    ], axis=1)
    return result, closures, packet


@partial(jax.jit, static_argnames="config")
def validate_batch(
    query_points: jnp.ndarray,   # [Q, 3] query-map frame
    result: LoopQueryResult,     # K candidates
    T_init: jnp.ndarray,         # [K, 4, 4] per-candidate initial guesses
    config: LoopDetectorConfig,
) -> ClosureResult:
    """Validate ALL top-K candidates in one vmapped jit.

    Mirrors the reference's loop over detected closures, each validated by
    the loop_aligner (app_benchmark.cpp:136-161) — here a single batched GN.
    """
    return jax.vmap(
        lambda mp, mm, Ti: _validate_one(query_points, mp, mm, Ti, config)
    )(result.match_points, result.match_mask, T_init)
