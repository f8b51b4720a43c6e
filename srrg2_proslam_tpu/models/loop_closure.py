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
  1. on local-map split, the map's landmark descriptors + positions are
     appended to the database with their map id;
  2. a query matches the new map's descriptors against the whole database,
     gated by descriptor distance, Lowe ratio, and the minimum age
     difference (correspondence_finder_hbst.cpp:75-91);
  3. per-reference-map vote counts select candidate maps
     (segment-sum over map ids — the analog of the per-reference
     correspondence extraction at :95-128);
  4. each candidate is validated by a point-to-point SE3 GN alignment
     (the "loop_aligner" MultiAligner3DQR with AlignerSliceProcessor3D and
     RobustifierClamp, kitti.conf:649-677) under the acceptance gates
     inliers >= 25, chi/inlier <= 2, inlier ratio >= 0.5
     (kitti.conf:970-977).

The database layout ([D, 256] int8 + int32 metadata) is shardable along D
across a device mesh (parallel/loops.py): each device matches its slice and
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


@cfg.register
class LoopDetectorConfig:
    """Mirrors MultiLoopDetectorHBST3D params (kitti.conf:938-978)."""

    maximum_descriptor_distance: float = 25.0
    minimum_age_difference: int = 10
    minimum_matches: int = 25
    lowe_ratio: float = 0.8
    # validation aligner (kitti.conf:649-677 "loop_aligner")
    aligner_iterations: int = 30
    chi_threshold: float = 3.0          # RobustifierClamp (kitti.conf:380-408)
    damping: float = 1.0
    # acceptance gates (kitti.conf:970-977)
    relocalize_min_inliers: int = 25
    relocalize_max_chi_inliers: float = 2.0
    relocalize_min_inliers_ratio: float = 0.5


class DescriptorDatabase(NamedTuple):
    """Fixed-capacity descriptor arena over ALL past local maps."""

    desc: jnp.ndarray      # [D, 256] int8 signed bits
    points: jnp.ndarray    # [D, 3] landmark position in its local-map frame
    map_id: jnp.ndarray    # [D] int32 owning local map
    valid: jnp.ndarray     # [D] bool
    size: jnp.ndarray      # [] int32 next free row

    @property
    def capacity(self) -> int:
        return self.desc.shape[0]


def empty_database(capacity: int) -> DescriptorDatabase:
    return DescriptorDatabase(
        desc=jnp.full((capacity, 256), -1, jnp.int8),
        points=jnp.zeros((capacity, 3), jnp.float32),
        map_id=jnp.full((capacity,), -1, jnp.int32),
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
) -> DescriptorDatabase:
    """Append one local map's landmarks (contiguous scatter at ``size``).

    Mirrors the reference's addPreviousQuery tree insertion
    (correspondence_finder_hbst.cpp:110-128); rows beyond capacity drop.
    """
    D = db.capacity
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    dest = db.size + rank
    take = valid & (dest < D)
    dest = jnp.where(take, dest, D)  # overflow sink

    def pad(a):
        return jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0)

    return DescriptorDatabase(
        desc=pad(db.desc).at[dest].set(desc)[:D],
        points=pad(db.points).at[dest].set(points)[:D],
        map_id=pad(db.map_id).at[dest].set(map_id)[:D],
        valid=pad(db.valid).at[dest].set(True)[:D],
        size=jnp.minimum(db.size + jnp.sum(take), D),
    )


class LoopQueryResult(NamedTuple):
    """Best candidate reference map + row-aligned correspondences into it."""

    candidate_map: jnp.ndarray   # [] int32 best reference map id (-1 if none)
    votes: jnp.ndarray           # [] int32 matches supporting the candidate
    match_idx: jnp.ndarray       # [Q] int32 db row per query row (-1 invalid)
    match_mask: jnp.ndarray      # [Q] bool — match belongs to candidate map
    match_points: jnp.ndarray    # [Q, 3] matched landmark in candidate frame


def query_terms(
    query_desc: jnp.ndarray,   # [Q, 256] int8
    query_valid: jnp.ndarray,  # [Q] bool
    query_map_id,              # current map id (age gating)
    db: DescriptorDatabase,
    config: LoopDetectorConfig,
    num_maps: int,
):
    """Shardable inner kernel: per-query best match + per-map vote histogram.

    Returns (best_dist, best_second, best_idx, votes[num_maps]).  When the
    database is sharded along D, each shard runs this on its slice and the
    combination is a min-reduction keyed on distance plus a vote psum
    (see parallel/loops.py).
    """
    cost = distance_matrix(query_desc, db.desc).astype(jnp.float32)
    age_ok = (query_map_id - db.map_id) >= config.minimum_age_difference
    feasible = query_valid[:, None] & db.valid[None, :] & age_ok[None, :]
    masked = jnp.where(feasible, cost, jnp.float32(1e9))
    best_idx = jnp.argmin(masked, axis=1)
    d1 = jnp.min(masked, axis=1)
    cols = jnp.arange(db.capacity)[None, :]
    d2 = jnp.min(jnp.where(cols == best_idx[:, None], 1e9, masked), axis=1)
    ok = (d1 <= config.maximum_descriptor_distance) & (d1 <= config.lowe_ratio * d2)
    match_map = jnp.where(ok, db.map_id[best_idx], num_maps)
    votes = jnp.zeros((num_maps + 1,), jnp.int32).at[match_map].add(1)[:num_maps]
    return d1, best_idx, ok, votes


@partial(jax.jit, static_argnames=("config", "num_maps"))
def query(
    query_desc: jnp.ndarray,
    query_valid: jnp.ndarray,
    query_map_id,
    db: DescriptorDatabase,
    config: LoopDetectorConfig,
    num_maps: int,
) -> LoopQueryResult:
    """Match a local map against the whole database, vote per reference map."""
    d1, best_idx, ok, votes = query_terms(
        query_desc, query_valid, query_map_id, db, config, num_maps
    )
    best_map = jnp.argmax(votes)
    best_votes = votes[best_map]
    found = best_votes >= config.minimum_matches
    cand = jnp.where(found, best_map, -1).astype(jnp.int32)
    mask = ok & (db.map_id[best_idx] == cand) & found
    return LoopQueryResult(
        candidate_map=cand,
        votes=best_votes,
        match_idx=jnp.where(mask, best_idx, -1).astype(jnp.int32),
        match_mask=mask,
        match_points=db.points[jnp.maximum(best_idx, 0)],
    )


class ClosureResult(NamedTuple):
    T_query_in_ref: jnp.ndarray  # [4, 4] transform of query map in ref frame
    num_inliers: jnp.ndarray
    chi_per_inlier: jnp.ndarray
    accepted: jnp.ndarray        # [] bool — all gates passed


@partial(jax.jit, static_argnames="config")
def validate(
    query_points: jnp.ndarray,   # [Q, 3] query-map frame
    result: LoopQueryResult,
    T_init: jnp.ndarray,         # [4, 4] initial guess (e.g. identity)
    config: LoopDetectorConfig,
) -> ClosureResult:
    """Point-to-point SE3 validation of a closure candidate.

    The estimate maps query-map points into the reference-map frame
    (moving = query, fixed = reference), mirroring the loop_aligner slice
    (AlignerSliceProcessor3D, RobustifierClamp chi=3).
    """
    weights = jnp.ones((query_points.shape[0],), jnp.float32)
    system = lambda X: point3_system(
        X, query_points, result.match_points, weights, result.match_mask,
        chi_threshold=config.chi_threshold,
    )
    X, stats = gn_iterate(
        system, T_init, config.aligner_iterations,
        damping=config.damping, min_inliers=config.relocalize_min_inliers,
    )
    n_corr = jnp.maximum(jnp.sum(result.match_mask), 1)
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
        accepted=accepted,
    )
