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
    # the r-th taken candidate goes to the r-th free slot (stable argsort
    # of the validity mask lists free slots first, in index order)
    free_order = jnp.argsort(arena.valid, stable=True).astype(jnp.int32)
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


def transform(arena: LandmarkArena, T: jnp.ndarray) -> LandmarkArena:
    """Rigidly move all landmarks (and covariances) by T (4x4)."""
    R = T[:3, :3]
    new_pos = arena.pos @ R.T + T[:3, 3]
    new_cov = jnp.einsum("ij,mjk,lk->mil", R, arena.cov, R)
    return arena._replace(pos=new_pos, cov=new_cov)
