"""Fixed-capacity landmark arena (the device-resident local-map scene).

Capability parity with the reference's per-local-map
``PointIntensityDescriptor3fVectorCloud`` scene slices whose per-point
``statistics()`` carry state/covariance/update counts (reference
srrg2_proslam/src/srrg2_proslam/mapping/mergers/merger_projective_impl.cpp:310-328)
— redesigned as a struct-of-arrays arena of static capacity: insertion is a
scatter into free slots, deletion is mask-clearing, and "the scene" handed to
matching/alignment is always the full arena with its validity mask (the
reference's scene clipper compaction becomes an in-view mask, see
tracker.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

DESC_BITS = 256


class LandmarkArena(NamedTuple):
    """All landmarks of one local map, in the local-map frame."""

    pos: jnp.ndarray            # [M, 3] float32
    cov: jnp.ndarray            # [M, 3, 3] float32
    desc: jnp.ndarray           # [M, 256] int8 signed bits
    num_updates: jnp.ndarray    # [M] int32 — times merged (maturity)
    valid: jnp.ndarray          # [M] bool

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def count(self):
        return jnp.sum(self.valid)


def empty_arena(capacity: int) -> LandmarkArena:
    return LandmarkArena(
        pos=jnp.zeros((capacity, 3), jnp.float32),
        cov=jnp.zeros((capacity, 3, 3), jnp.float32),
        desc=jnp.full((capacity, DESC_BITS), -1, jnp.int8),
        num_updates=jnp.zeros((capacity,), jnp.int32),
        valid=jnp.zeros((capacity,), bool),
    )


def insert(
    arena: LandmarkArena,
    pos: jnp.ndarray,
    cov: jnp.ndarray,
    desc: jnp.ndarray,
    want: jnp.ndarray,
    max_insertions: int,
) -> LandmarkArena:
    """Scatter up to ``max_insertions`` candidate landmarks into free slots.

    pos/cov/desc: [N, ...] candidates; want: [N] bool selects candidates
    (already ranked by the caller — the first ``max_insertions`` True rows
    win).  Candidates beyond the arena's free capacity are dropped, mirroring
    the reference's soft insertion-budget behavior
    (merger_projective_impl.cpp:193-308).
    """
    M = arena.capacity
    # the r-th taken candidate goes to the r-th free slot (in index order);
    # the rank->slot map is a scattered iota over the free slots — the
    # same mapping a stable argsort of the validity mask produces, without
    # paying a capacity-wide sort per frame
    free_rank = jnp.cumsum(~arena.valid) - 1
    free_order = jnp.full((M + 1,), M, jnp.int32).at[
        jnp.where(~arena.valid, free_rank, M)
    ].set(jnp.arange(M, dtype=jnp.int32))[:M]
    num_free = M - jnp.sum(arena.valid)
    cand_rank = jnp.cumsum(want.astype(jnp.int32)) - 1
    take = want & (cand_rank < max_insertions) & (cand_rank < num_free)
    dest = free_order[jnp.clip(cand_rank, 0, M - 1)]
    # rows not taken scatter into a one-row overflow sink at index M
    dest = jnp.where(take, dest, M)

    def pad(a):
        return jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0)

    return LandmarkArena(
        pos=pad(arena.pos).at[dest].set(pos)[:M],
        cov=pad(arena.cov).at[dest].set(cov)[:M],
        desc=pad(arena.desc).at[dest].set(desc)[:M],
        num_updates=pad(arena.num_updates).at[dest].set(1)[:M],
        valid=pad(arena.valid).at[dest].set(True)[:M],
    )


def merge_closure(
    ref_arena: LandmarkArena,
    query_arena: LandmarkArena,
    T_query_in_ref: jnp.ndarray,  # [4, 4] maps query-map frame -> ref frame
    match_row: jnp.ndarray,       # [Q] int32 ref-arena row per query row (-1)
    match_mask: jnp.ndarray,      # [Q] bool accepted closure correspondences
    max_insertions: int,
) -> LandmarkArena:
    """Merge a query map's landmarks into a reloaded reference map's arena.

    The reference reloads an old local map through the tracker's closure
    path (tracker->setClosure(correspondences, ...) at reference
    apps/app_benchmark.cpp:150-161; the slice flow remaps closure
    correspondences through clipper indices into a merger pass,
    tracking/tracker_slice_processor_projective_depth.cpp:30-88).  Here:

      * matched pairs combine by update-count-weighted mean (the weighted-
        mean landmark estimator's rule) and the ref descriptor refreshes to
        the query's most recent observation;
      * unmatched query landmarks insert into the ref arena's free slots
        (ranked by maturity, capped by ``max_insertions``).
    """
    M = ref_arena.capacity
    q = transform(query_arena, T_query_in_ref)
    w_q = jnp.maximum(query_arena.num_updates, 1).astype(jnp.float32)
    ok = match_mask & query_arena.valid & (match_row >= 0)
    row = jnp.where(ok, match_row, M)  # overflow sink

    sum_pos = jnp.zeros((M + 1, 3), jnp.float32).at[row].add(
        jnp.where(ok, w_q, 0.0)[:, None] * q.pos)[:M]
    sum_w = jnp.zeros((M + 1,), jnp.float32).at[row].add(
        jnp.where(ok, w_q, 0.0))[:M]
    w_ref = ref_arena.num_updates.astype(jnp.float32)
    touched = sum_w > 0
    new_pos = jnp.where(
        (touched & ref_arena.valid)[:, None],
        (ref_arena.pos * w_ref[:, None] + sum_pos)
        / jnp.maximum(w_ref + sum_w, 1.0)[:, None],
        ref_arena.pos,
    )
    desc_pad = jnp.concatenate(
        [ref_arena.desc, jnp.zeros((1, ref_arena.desc.shape[1]), jnp.int8)], 0
    )
    new_desc = desc_pad.at[row].set(q.desc)[:M]
    new_desc = jnp.where((touched & ref_arena.valid)[:, None],
                         new_desc, ref_arena.desc)
    merged = ref_arena._replace(
        pos=new_pos,
        desc=new_desc,
        num_updates=ref_arena.num_updates
        + jnp.where(ref_arena.valid, sum_w.astype(jnp.int32), 0),
    )

    # insert unmatched query landmarks (most-mature first)
    unmatched = query_arena.valid & ~ok
    order = jnp.argsort(jnp.where(unmatched, -query_arena.num_updates, 1 << 30))
    want = unmatched[order]
    return insert(
        merged, q.pos[order], q.cov[order], q.desc[order], want, max_insertions
    )


def transform(arena: LandmarkArena, T: jnp.ndarray) -> LandmarkArena:
    """Rigidly move all landmarks (and covariances) by T (4x4)."""
    R = T[:3, :3]
    new_pos = arena.pos @ R.T + T[:3, 3]
    new_cov = jnp.einsum("ij,mjk,lk->mil", R, arena.cov, R)
    return arena._replace(pos=new_pos, cov=new_cov)
