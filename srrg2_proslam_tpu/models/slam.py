"""Top-level graph SLAM orchestrator: local maps, loop closing, PGO, status.

Capability parity with the reference's (externally-defined) MultiGraphSLAM3D
control loop, whose complete flow is visible in the benchmark
re-implementation (reference srrg2_proslam/apps/app_benchmark.cpp:55-185):
initializer -> tracker preprocess/align -> status switch (Initializing/
Tracking/Lost) -> splitting criterion -> loopDetect/loopValidate/optimize/
relocalize -> makeNewMap -> merge.  Also covers
LocalMapSplittingCriterionViewpoint3D (kitti.conf:542-550: new local map
every 10 m / 0.25 rad) and MultiRelocalizer3D gates (kitti.conf:91-110).

TPU-first redesign: the per-frame hot path is ONE jitted tracker step
(models/tracker.py) and the host reads back a single small stats vector to
drive the status machine (SURVEY.md §7.3 hard part 6).  Split-time work
(descriptor-database insert, loop query, closure validation, PGO) are
separate jitted stages that run only every ~hundreds of frames.  Local-map
state is a fixed-capacity pose-graph (ops/pgo.py) plus the device-resident
descriptor database (models/loop_closure.py); the trajectory is unrolled
through optimized local-map estimates exactly like the reference benchmark
(app_benchmark.cpp:195-203).
"""
from __future__ import annotations

import os
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import config as cfg
from ..utils.profiling import profile_time
from ..ops import ba as ba_ops
from ..ops import se3
from ..ops import pgo
from ..ops.pinhole import Camera
from . import landmarks as lm
from . import loop_closure
from .tracker import TrackerConfig, TrackerState, initial_state, track_step
from . import chunk as chunk_ops


@cfg.register
class SplittingConfig:
    """LocalMapSplittingCriterionViewpoint3D (kitti.conf:542-550)."""

    maximum_translation_m: float = 10.0
    maximum_rotation_rad: float = 0.25


@cfg.register
class RelocalizerConfig:
    """MultiRelocalizer3D gates (kitti.conf:91-110)."""

    max_translation: float = 10.0
    relocalize_max_chi_inliers: float = 5.0
    relocalize_min_inliers: int = 25
    relocalize_min_inliers_ratio: float = 0.5


@cfg.register
class LocalBAConfig:
    """Split-time joint refinement of the finished local map (ops/ba.py).

    Capability beyond the reference (which refines structure only via the
    landmark estimators): keyframe poses + landmarks of the finished map are
    jointly optimized before the map enters the closure database.
    """

    enabled: bool = False
    max_keyframes: int = 8
    keyframe_stride: int = 2   # record every k-th frame as a BA keyframe
    ba: ba_ops.BAConfig = ba_ops.BAConfig()
    # only landmarks with num_updates <= this are refined (0 = all): the
    # EKF's covariance-weighted estimate of a many-times-re-observed
    # landmark already encodes more information than a max_keyframes-view
    # fit, so BA focuses on the young landmarks triangulated from few views
    max_refine_maturity: int = 0


@cfg.register
class GraphSLAMConfig:
    tracker: TrackerConfig = TrackerConfig()
    splitting: SplittingConfig = SplittingConfig()
    loop: loop_closure.LoopDetectorConfig = loop_closure.LoopDetectorConfig()
    relocalizer: RelocalizerConfig = RelocalizerConfig()
    pgo: pgo.PGOConfig = pgo.PGOConfig()
    local_ba: LocalBAConfig = LocalBAConfig()
    arena_capacity: int = 4096
    # initial capacities; the orchestrator grows them (double-and-copy)
    # instead of crashing when a long run exhausts them
    max_local_maps: int = 512
    max_edges: int = 1024
    database_capacity: int = 65536
    # per-map descriptor budget for the closure database: only the most
    # mature landmarks of a finalized map enter.  The database is a slotted
    # RING of ``database_capacity // max_db_descriptors_per_map`` maps
    # (here: 64) — when it wraps, the OLDEST map is evicted implicitly, so
    # this ratio bounds how far back loop closure can reach.  Size it above
    # the expected number of live maps between revisits.
    max_db_descriptors_per_map: int = 1024
    enable_loop_closing: bool = True
    min_track_inliers: int = 6          # below this the tracker is Lost
    # finalized-map arenas kept pinned on device (most recent first); older
    # maps spill to host numpy and reload at relocalization — on KITTI-
    # length runs hundreds of maps would otherwise exhaust HBM (the
    # reference keeps every local map in RAM, app_benchmark.cpp:136-169;
    # HBM needs the discipline RAM never did).  Each arena is ~1.3 MB at
    # the default capacity, so 64 keeps spills OFF the steady path of
    # ordinary runs while a day-long mapping session stays bounded
    max_device_map_arenas: int = 64
    # merged-landmark insertion budget when relocalizing into an old map
    closure_merge_max_insertions: int = 512
    # speculative frame pipeline depth (VERDICT r2 item 1): frames are
    # dispatched to the device without blocking, their status-machine
    # scalars arrive via async host copies, and the host consumes them
    # ``speculation_depth`` frames behind dispatch — hiding the full
    # device+transfer round trip.  When a consumed frame turns out to have
    # split/lost, the tracker state rolls back to that frame and the
    # in-flight frames replay (cheap: the tracker step is ~2 ms).  0 =
    # fully synchronous (one blocking readback per frame, the reference's
    # own cadence, app_benchmark.cpp:123-178).
    speculation_depth: int = 0
    # chunked stepping (models/chunk.py): > 0 processes this many frames
    # per device program via ``process_sequence`` — the adaptor, tracker,
    # status machine AND the split-time pipeline (db insert, loop query +
    # validation, closure factors, conditional PGO) run on device; the
    # host reads ONE packet per chunk.  The production mode for
    # high-latency links and the launch-overhead-optimal mode everywhere
    # (B=32 measured SLOWER than 16 on the bench: the dispatch link
    # overlaps the pipelined chain, so bigger chunks only add buffer
    # traffic and latency).  0 keeps the per-frame ``process`` path.
    chunk_size: int = 0
    # chunks in flight before the oldest chunk's packet is consumed
    chunk_lag: int = 2
    # B-frame chunks fused into ONE dispatch (a lax.scan over whole
    # chunks inside the chunk op), dividing the per-invocation launch
    # cost by chunk_group while keeping the inner B-frame program shape
    # identical.  Measured round 5 on the tunneled v5e: back-to-back
    # dispatches already overlap fully there (grouping was NET SLOWER —
    # XLA schedules the scan-of-chunks ~2x slower than the same chunks
    # as separate executables — and a relocalization replays a whole
    # group), so 1 is the right setting on that runtime; the knob exists
    # for links whose launches genuinely serialize.  Bit-equivalent to
    # ungrouped dispatch (tests/test_chunked.py).
    chunk_group: int = 1


# tracker status machine (app_benchmark.cpp:123-178)
INITIALIZING = "Initializing"
TRACKING = "Tracking"
LOST = "Lost"


class FrameRecord(NamedTuple):
    """Host-side per-frame bookkeeping for trajectory unrolling."""

    timestamp: float
    local_map_index: int
    T_lm_robot: np.ndarray  # robot in its local map at this frame


class _PendingFrame(NamedTuple):
    """A dispatched-but-unconsumed frame in the speculative pipeline.

    Everything is a device reference (no copies): ``state`` is the
    post-frame tracker state the orchestrator rolls back to when this frame
    turns out to have split/lost; ``meas`` re-dispatches the in-flight
    frames after a rollback; ``packet`` is the [20] f32 status vector whose
    async host copy was started at dispatch.
    """

    meas: tuple           # (points, desc, valid)
    timestamp: float
    state: object         # TrackerState after this frame
    stats: object         # TrackStats (match_idx/mask feed local BA)
    packet: object        # stats.host_packet


class _ClosureMarker:
    """Deferred split-time loop-closure decision in the pipeline queue.

    The split dispatches the fused query+validation
    (loop_closure.detect_and_validate) and speculatively opens a new local
    map; this marker holds the device refs and the async-copied decision
    packet.  It is consumed — in order, before any frame dispatched after
    the split — once the packet has arrived (or when forced), adding the
    accepted closure factors, running PGO, and rolling back into the old
    map when the relocalizer gates pass (the rare mispredict)."""

    __slots__ = (
        "packet", "match_row", "match_mask", "T_candidates", "query_state",
        "query_map", "timestamp", "T_split", "frame_record_index",
        "new_map", "odo_edge_slot",
    )


class _ChunkEntry(NamedTuple):
    """A dispatched-but-unconsumed chunk (chunked mode, models/chunk.py).

    ``inputs`` holds the immutable pre-chunk device carries: a
    relocalization decision (read from the chunk's own packet) replays the
    chunk from them with ``hi = finish + 1`` to recover the device state
    exactly at the split — the only rollback mechanism the fused design
    needs, since all host bookkeeping for the rolled-back frames is simply
    never performed."""

    ys: object        # chunk_ops.ChunkYs device refs
    inputs: object    # chunk_ops.ChunkCarry BEFORE this chunk
    outputs: object   # chunk_ops.ChunkCarry AFTER this chunk
    start: int        # first global frame of the chunk
    lo: int
    hi: int
    packet: object    # Future[np.ndarray]: threaded host fetch of ys.packet


class GraphSLAM:
    """Host orchestrator driving the jitted stages.

    Usage mirrors the reference public API (slam->setRawData/compute,
    example_slam_3d.cpp:106-124): call ``process(meas_points, desc, valid,
    timestamp)`` per frame; read ``robot_in_world()``, ``trajectory()``,
    ``status``.
    """

    def __init__(self, cam: Camera, config: GraphSLAMConfig = GraphSLAMConfig(),
                 model: str = "stereo", mesh=None):
        self.cam = cam
        if mesh is not None and config.tracker.gn_pallas:
            # the fused GN kernel is a single-device Mosaic program; under
            # the mesh-integrated orchestrator the tracker must stay on the
            # partitionable XLA path
            import dataclasses

            config = dataclasses.replace(
                config,
                tracker=dataclasses.replace(config.tracker,
                                            gn_pallas=False))
        self.config = config
        self.model = model
        self.mesh = mesh   # optional jax.sharding.Mesh (see _apply_mesh)
        self.status = INITIALIZING
        self.tracker_state: TrackerState = initial_state(
            config.arena_capacity, estimator=config.tracker.landmark_estimator)
        self.graph = pgo.empty_graph(config.max_local_maps, config.max_edges)
        self.db = loop_closure.empty_database(
            config.database_capacity, config.max_db_descriptors_per_map)
        self.num_maps = 0
        self.current_map = -1   # index of the active local map
        self.num_edges = 0
        self.num_closures = 0
        self.frames: List[FrameRecord] = []
        self._frame_count = 0
        self._frames_in_current_map = 0
        self.last_stats = None
        # speculative pipeline: dispatched frames + deferred closure
        # decisions, consumed ``speculation_depth`` behind dispatch
        self._queue = deque()
        # chunked pipeline (config.chunk_size > 0, models/chunk.py)
        self._cqueue = deque()
        self._chunks_consumed = 0
        self._seq = None          # active sequence: dict(kind, arrays, ts, T)
        self._seq_cursor = 0
        self._seq_lo = 0
        self._carry = None        # chunk_ops.ChunkCarry (sequence-scoped)
        # single-thread packet prefetcher: the tunneled runtime charges a
        # fixed ~13-26 ms link round trip per host read even of a tiny
        # landed buffer; fetching on a side thread (np.asarray releases
        # the GIL during transfer) overlaps that RTT with the next chunk's
        # device time instead of serializing it into the consume path
        self._fetcher = ThreadPoolExecutor(max_workers=1)
        # separate worker for arena/db spills: a spill blocks on the chunk
        # chain and must never delay a packet fetch
        self._spiller = ThreadPoolExecutor(max_workers=1)
        # references to finalized local-map arenas, indexed by map id — the
        # store the relocalizer reloads from.  The most recent
        # ``max_device_map_arenas`` stay device-resident (no readback,
        # VERDICT r2 item 3); older ones spill to host numpy on the fetcher
        # thread so chunked runs keep bounded HBM (VERDICT r4 item 2)
        self._map_arenas: dict = {}
        self._arena_lru = deque()
        # mirror of the closure database: map id -> budget-selected
        # (desc, points, rows) entries, insertion-ordered.  Entries start as
        # device refs with async host copies in flight and materialize to
        # numpy lazily (eviction/rebuild/checkpoint).  Enables eviction of
        # the oldest maps (with a rebuild) when the database would overflow.
        self._db_entries: "dict" = {}
        self.num_db_evictions = 0
        self.num_relocalizations = 0
        self.num_losses = 0
        # chunked-mode relocalization recovery path counters (observability
        # + tests): ``rollbacks`` undid later finishes on device,
        # ``replays`` re-invoked the chunk (closure-bearing later finish,
        # mesh mode, or a missing mirror)
        self.num_reloc_rollbacks = 0
        self.num_reloc_replays = 0
        # closures the geometric backstop rejected after passing the
        # reference gates (LoopDetectorConfig.backstop_max_edge_residual)
        self.num_backstop_rejections = 0
        # (reference_map, query_map) of every ACCEPTED closure, in order —
        # observability for multi-closure scenarios (tests, diagnostics)
        self.closure_events: list = []
        # local-BA keyframe records of the ACTIVE map: (T_lm_robot np,
        # match_idx np, gn_meas np, mask np)
        self._ba_keyframes: list = []
        if mesh is not None:
            self._apply_mesh()

    # ------------------------------------------------------------------
    # multi-device mesh (SURVEY.md §2.3 / §5.8 — new design)
    # ------------------------------------------------------------------

    def _apply_mesh(self):
        """Shard the device state over ``self.mesh`` (VERDICT r3 item 3).

        The closure ring shards along its BUDGET axis (every device holds
        a stripe of every stored map's descriptors — the query's [Q, D]
        Hamming matmul partitions along D and XLA reduces the per-slot
        two-best and votes across shards) and the pose-graph FACTOR arrays
        shard along edges (each device reduces its factors' normal-
        equation contributions; poses stay replicated).  With the carries
        sharded, every jitted stage — including the fused chunk op — runs
        SPMD with compiler-inserted collectives: the integrated-mode
        counterpart of the standalone parallel/spmd.py entry points,
        equivalence pinned by tests/test_mesh_orchestrator.py.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        axis = mesh.axis_names[0]
        n = mesh.devices.size
        if self.db.budget % n:
            raise ValueError(
                f"max_db_descriptors_per_map ({self.db.budget}) must be "
                f"divisible by the mesh size ({n})")
        if self.graph.edge_capacity % n:
            raise ValueError(
                f"max_edges ({self.graph.edge_capacity}) must be "
                f"divisible by the mesh size ({n})")

        def put(x, *spec):
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))

        # every OTHER carry leaf must be explicitly replicated over the
        # mesh: in multi-process (multi-controller) execution a jit cannot
        # mix global arrays with process-local committed ones, so the
        # tracker state joins the mesh as a fully-replicated global array
        # (a no-op relayout on a single host)
        self._replicated = NamedSharding(mesh, P())
        self.tracker_state = jax.device_put(self.tracker_state,
                                            self._replicated)

        db = self.db
        self.db = db._replace(
            desc=put(db.desc, None, axis, None),
            points=put(db.points, None, axis, None),
            arena_row=put(db.arena_row, None, axis),
            valid=put(db.valid, None, axis),
            map_id=put(db.map_id),
            next=put(db.next),
        )
        g = self.graph
        self.graph = g._replace(
            poses=put(g.poses),
            pose_valid=put(g.pose_valid),
            edge_i=put(g.edge_i, axis),
            edge_j=put(g.edge_j, axis),
            edge_Z=put(g.edge_Z, axis, None, None),
            edge_weight=put(g.edge_weight, axis),
            edge_valid=put(g.edge_valid, axis),
        )
        if self._carry is not None:
            self._carry = self._carry._replace(graph=self.graph, db=self.db)

    # ------------------------------------------------------------------
    # local-map management
    # ------------------------------------------------------------------

    def _make_new_map(self, T_world_new_lm: jnp.ndarray):
        """makeNewMap analog (app_benchmark.cpp:93-98,136-169)."""
        idx = self.num_maps
        if idx >= self.graph.capacity:
            # grow instead of crashing (capacity lifecycle)
            self.graph = pgo.grow(self.graph, 2 * self.graph.capacity,
                                  self.graph.edge_capacity)
            if self.mesh is not None:
                self._apply_mesh()
        self.graph = pgo.add_pose(self.graph, idx, T_world_new_lm)
        if self.current_map >= 0:
            # odometry factor from the previously active map (which after a
            # relocalization may be an OLD map, not idx - 1)
            prev = self.current_map
            Z = se3.inverse(self.graph.poses[prev]) @ T_world_new_lm
            self._add_graph_edge(prev, idx, Z)
        self.num_maps = idx + 1
        self.current_map = idx
        # fresh tracker state: empty arena, identity pose, keep velocity
        vel = self.tracker_state.velocity
        self.tracker_state = initial_state(
            self.config.arena_capacity,
            estimator=self.config.tracker.landmark_estimator)
        self.tracker_state = self.tracker_state._replace(velocity=vel)
        self._frames_in_current_map = 0
        self._ba_keyframes = []
        return idx

    def _add_graph_edge(self, i: int, j: int, Z, weight: float = 1.0):
        """Bounds-checked factor insertion with double-and-copy growth."""
        if self.num_edges >= self.graph.edge_capacity:
            self.graph = pgo.grow(self.graph, self.graph.capacity,
                                  2 * self.graph.edge_capacity)
            if self.mesh is not None:
                self._apply_mesh()
        self.graph = pgo.add_edge(self.graph, self.num_edges, i, j, Z,
                                  weight=weight)
        self.num_edges += 1

    def _entry_count(self, entry, exact: bool = False) -> int:
        """Row count of a db entry; non-blocking unless ``exact``.

        Device entries' counts are only read when ``exact`` (eviction /
        rebuild); otherwise the per-map budget serves as a conservative
        upper bound — may evict one map a split early, never overflows,
        and never touches a possibly-pending device value (a blocking read
        of one costs a full round trip and degrades the tunnel runtime).
        """
        n = entry.get("_n")
        if n is None:
            return entry["desc"].shape[0]  # materialized numpy entry
        if isinstance(n, int):
            return n                       # fused-chunk entry: count is free
        if exact:
            return int(np.asarray(n))
        return self.config.max_db_descriptors_per_map

    @staticmethod
    def _entry_np(entry) -> dict:
        """Materialize a db entry to compact numpy arrays (thread-safe:
        reads only the passed-in value)."""
        if "_stack" in entry:
            desc, points, rows, j = entry["_stack"]
            n = int(entry["_n"])
            return dict(
                desc=np.asarray(desc[j])[:n],
                points=np.asarray(points[j])[:n],
                rows=np.asarray(rows[j])[:n],
            )
        if "_n" not in entry:
            return entry
        n = int(np.asarray(entry["_n"]))
        return dict(
            desc=np.asarray(entry["desc"])[:n],
            points=np.asarray(entry["points"])[:n],
            rows=np.asarray(entry["rows"])[:n],
        )

    def _materialize_db_entries(self):
        for mid in list(self._db_entries):
            self._db_entries[mid] = self._entry_np(self._db_entries[mid])

    def _get_map_arena(self, mid: int):
        """Finalized-map arena by id as device arrays, resolving stack
        slices, pending host spills, and spilled numpy trees."""
        v = self._map_arenas[mid]
        if isinstance(v, tuple) and len(v) == 3 and v[0] == "stack":
            v = chunk_ops.take_frame(v[1], v[2])
        elif hasattr(v, "result"):          # pending host spill
            v = v.result()
        if isinstance(v.pos, np.ndarray):   # spilled: reload to device
            if self.mesh is not None:
                v = jax.device_put(v, self._replicated)
            else:
                v = jax.tree_util.tree_map(jnp.asarray, v)
        self._map_arenas[mid] = v
        self._note_device_arena(mid)
        return v

    def _materialize_map_arenas(self):
        """Resolve every finalized-map mirror to host numpy (checkpoint)."""
        for mid in list(self._map_arenas):
            v = self._map_arenas[mid]
            if isinstance(v, tuple) and len(v) == 3 and v[0] == "stack":
                v = chunk_ops.take_frame(v[1], v[2])
            elif hasattr(v, "result"):
                v = v.result()
            self._map_arenas[mid] = jax.tree_util.tree_map(np.asarray, v)

    def _note_device_arena(self, mid: int):
        """Register a device-resident finalized-map arena; spill the oldest
        beyond the cache bound to host numpy on the fetcher thread.

        The reference keeps every local map in process RAM for its whole
        run (app_benchmark.cpp:136-169); HBM needs the discipline RAM never
        did (VERDICT r4 item 2): only the ``max_device_map_arenas`` most
        recent maps stay pinned on device — older ones move to host and
        reload through ``_get_map_arena`` at relocalization time.
        """
        if mid in self._arena_lru:
            self._arena_lru.remove(mid)
        self._arena_lru.append(mid)
        keep = self.config.max_device_map_arenas
        while len(self._arena_lru) > keep:
            old = self._arena_lru.popleft()
            v = self._map_arenas.get(old)
            if v is None:
                continue
            if isinstance(v, tuple) and len(v) == 3 and v[0] == "stack":
                v = chunk_ops.take_frame(v[1], v[2])
            # start the DMA now (non-blocking even on pending values) and
            # convert on the DEDICATED spill thread: the packet-fetch
            # worker must never queue behind a spill's chain wait
            # (measured: spills on the fetcher thread cost ~150 ms/chunk
            # of readback latency on the tunneled runtime)
            for leaf in jax.tree_util.tree_leaves(v):
                leaf.copy_to_host_async()
            self._map_arenas[old] = self._spiller.submit(
                lambda t=v: jax.tree_util.tree_map(np.asarray, t))
            # the db mirror entry may pin the same chunk stack — compact it
            # to numpy alongside so the stack can free
            e = self._db_entries.get(old)
            if e is not None and ("_stack" in e or "_n" in e):
                def compact(mid=old, ee=e):
                    out = self._entry_np(ee)
                    if self._db_entries.get(mid) is ee:
                        self._db_entries[mid] = out
                self._spiller.submit(compact)

    def _mirror_ring_insert(self, map_id: int, entry: dict):
        """Mirror one ring insertion: the device slot write implicitly
        evicts the oldest stored map once the ring is full; the mirror
        (insertion-ordered, exactly one entry per occupied slot) drops the
        same map — no device read, no rebuild."""
        if len(self._db_entries) >= self.db.num_slots:
            oldest = next(iter(self._db_entries))
            del self._db_entries[oldest]
            self.num_db_evictions += 1
            print(f"[slam] loop database ring full: evicted map {oldest} "
                  f"({self.num_db_evictions} evictions total)")
        self._db_entries[map_id] = entry

    def _finalize_current_map(self):
        """Push the finished local map's landmarks into the closure database
        and keep its arena (device refs) for relocalization reloads.

        All device-side (VERDICT r2 item 3): the per-map budget (the most
        mature ``max_db_descriptors_per_map`` landmarks) is selected and
        compacted on device and written into the next ring slot with one
        jit; the selected rows stream to the host mirror asynchronously.
        Capacity lifecycle: the ring overwrites the OLDEST map when full
        (mirrored with a warning) — closures keep firing on long runs.
        """
        arena = self.tracker_state.arena
        self._map_arenas[self.current_map] = arena
        self._note_device_arena(self.current_map)
        if not self.config.enable_loop_closing:
            return
        if self.current_map in self._db_entries:
            return  # re-finalizing a reloaded map: descriptors already stored
        budget = self.config.max_db_descriptors_per_map
        desc_b, pts_b, rows_b, valid_b, n_b = loop_closure.select_db_rows(
            arena.desc, arena.pos, arena.valid, arena.num_updates,
            budget=budget,
        )
        for a in (desc_b, pts_b, rows_b, n_b):
            a.copy_to_host_async()
        self._mirror_ring_insert(self.current_map, dict(
            desc=desc_b, points=pts_b, rows=rows_b, _n=n_b,
        ))
        self.db = loop_closure.add_local_map(
            self.db, desc_b, pts_b, valid_b, self.current_map, rows_b,
        )

    def _dispatch_loop_query(self, entry: _PendingFrame, T_split: np.ndarray):
        """Dispatch the fused loop query+validation; return the marker.

        loopDetect/loopValidate (app_benchmark.cpp:136-161) as ONE device
        dispatch whose [K, 22] decision packet streams back asynchronously;
        the closure factors / PGO / relocalization happen at marker
        consumption (deferred, in order, before any post-split frame).
        """
        arena = entry.state.arena
        result, closures, packet = loop_closure.detect_and_validate(
            arena.desc, arena.valid, arena.pos, self.current_map,
            self.db, self.graph.poses, self.config.loop,
            self.graph.capacity,
        )
        packet.copy_to_host_async()
        m = _ClosureMarker()
        m.packet = packet
        m.match_row = result.match_row
        m.match_mask = result.match_mask
        m.T_candidates = closures.T_query_in_ref
        m.query_state = entry.state
        m.query_map = self.current_map
        m.timestamp = entry.timestamp
        m.T_split = T_split
        m.frame_record_index = len(self.frames)
        return m

    def _consume_marker(self, m: _ClosureMarker):
        """Apply a deferred closure decision: factors, PGO, relocalization."""
        with profile_time("closure_decision"):
            pkt = np.asarray(m.packet).reshape(-1, 22)
        accepted = [k for k in range(pkt.shape[0])
                    if pkt[k, 1] > 0.5 and pkt[k, 0] >= 0]
        if not accepted:
            return
        pre_graph, pre_edges = self.graph, self.num_edges

        def insert_and_optimize(ks):
            for k in ks:
                self._add_graph_edge(int(pkt[k, 0]), m.query_map, jnp.asarray(
                    pkt[k, 6:22].reshape(4, 4).astype(np.float32)))
            with profile_time("pgo"):
                self.graph, _ = pgo.optimize(self.graph, self.config.pgo)

        thr = self.config.loop.backstop_max_edge_residual
        tol = self.config.loop.backstop_agreement_tolerance
        n_pre_agree = len(accepted)
        if thr > 0 and tol > 0 and len(accepted) >= 2:
            # candidate-agreement gate (backstop part 1): implied query
            # positions must form a majority cluster; 1-vs-1 rejects both
            poses_np = np.asarray(self.graph.poses)
            t_impl = {k: (poses_np[int(pkt[k, 0])]
                          @ pkt[k, 6:22].reshape(4, 4))[:3, 3]
                      for k in accepted}
            score = {a: sum(1 for b in accepted
                            if np.linalg.norm(t_impl[a] - t_impl[b]) <= tol)
                     for a in accepted}
            mx = max(score.values())
            accepted = [k for k in accepted
                        if score[k] == mx and mx >= 2]
        if thr > 0:
            # geometric backstop (see LoopDetectorConfig): greedy outlier
            # pruning, identical to the fused chunk op's on-device loop —
            # while any closure edge's own post-PGO residual, or the
            # worsening of the held-out pre-existing factors' mean,
            # exceeds the bound, drop the worst offender and re-optimize
            # the mask must track the CURRENT capacity: inserting the
            # candidates can grow the edge arrays (double-and-copy)
            def held_out():
                return jnp.arange(self.graph.edge_capacity) < pre_edges

            base_chain = float(pgo.mean_edge_residual(self.graph,
                                                      held_out()))
            # drop order = pre-insertion closure-vs-odometry residual (see
            # the chunk op's identical loop for why post-PGO compromise
            # residuals cannot rank conflicting closures)
            poses_np = np.asarray(pre_graph.poses)
            pre_r = {}
            for k in accepted:
                Z = pkt[k, 6:22].reshape(4, 4).astype(np.float32)
                M = (np.linalg.inv(Z) @ np.linalg.inv(poses_np[int(pkt[k, 0])])
                     @ poses_np[m.query_map])
                pre_r[k] = float(np.linalg.norm(M[:3, 3]))
            n_initial = len(accepted)
            for _ in range(n_initial + 1):
                self.graph, self.num_edges = pre_graph, pre_edges
                if not accepted:
                    break
                insert_and_optimize(accepted)
                r_all = np.asarray(pgo.edge_t_residuals(self.graph))
                chain_bad = float(pgo.mean_edge_residual(
                    self.graph, held_out())) > base_chain + thr
                self_r = [r_all[pre_edges + j]
                          for j in range(len(accepted))]
                if os.environ.get("SLAM_DEBUG_BACKSTOP"):
                    print("[backstop]", [
                        (int(pkt[k, 0]), round(pre_r[k], 3),
                         round(float(self_r[j]), 3))
                        for j, k in enumerate(accepted)],
                        "chain_bad", chain_bad, flush=True)
                if not chain_bad and max(self_r) <= thr:
                    break
                accepted.remove(max(accepted, key=lambda k: pre_r[k]))
            else:
                accepted = []  # budget exhausted while still inconsistent
                self.graph, self.num_edges = pre_graph, pre_edges
            if n_pre_agree - len(accepted) > 0:
                n_rej = n_pre_agree - len(accepted)
                self.num_backstop_rejections += n_rej
                print(f"[slam] closure backstop: rejected {n_rej} "
                      f"candidate(s) into map {m.query_map}")
            if not accepted:
                return
        else:
            insert_and_optimize(accepted)
        best_k = max(accepted, key=lambda k: pkt[k, 2])
        for k in accepted:
            self.num_closures += 1
            self.closure_events.append((int(pkt[k, 0]), m.query_map))
        row = pkt[best_k]
        if self._reloc_gates(row):
            self._relocalize(m, best_k, int(row[0]),
                             row[6:22].reshape(4, 4).astype(np.float32))

    def _reloc_gates(self, row: np.ndarray) -> bool:
        """MultiRelocalizer3D gates (kitti.conf:91-110) on the host packet:
        small implied displacement + inliers/chi/ratio acceptance."""
        rc = self.config.relocalizer
        t = row[6:22].reshape(4, 4)[:3, 3]
        return bool(
            np.linalg.norm(t) <= rc.max_translation
            and row[2] >= rc.relocalize_min_inliers
            and row[3] <= rc.relocalize_max_chi_inliers
            and row[4] >= rc.relocalize_min_inliers_ratio
        )

    def _relocalize(self, m: _ClosureMarker, k: int, cand: int,
                    T_k: np.ndarray):
        """Jump back into the old local map ``cand`` (the rare mispredict).

        The reference reloads via closure geometry and merges the query
        map's landmarks through the closure correspondences
        (app_benchmark.cpp:150-161, tracker->setClosure flow); here the
        speculatively-opened map is retired (pose/edge invalidated), the
        finished query map merges into the reloaded arena, and the frames
        dispatched after the split replay against the reloaded state.
        """
        rest = [f for f in self._queue]
        self._queue.clear()
        # retire the speculative new map: no frames were recorded into it
        # (marker consumption precedes them in queue order)
        g = self.graph
        self.graph = g._replace(
            pose_valid=g.pose_valid.at[m.new_map].set(False),
            edge_valid=g.edge_valid.at[m.odo_edge_slot].set(False),
        )
        arena = jax.tree_util.tree_map(jnp.asarray,
                                       self._get_map_arena(cand))
        merged = lm.merge_closure(
            arena, m.query_state.arena, m.T_candidates[k],
            m.match_row[k], m.match_mask[k],
            self.config.closure_merge_max_insertions,
        )
        self._map_arenas[cand] = merged
        self._note_device_arena(cand)
        buf = m.query_state.meas_buf
        if buf is not None:
            # smoother buffers belong to the abandoned query map; the
            # reloaded map starts with empty observation history
            buf = jax.tree_util.tree_map(jnp.zeros_like, buf)
        T_new = (T_k @ m.T_split).astype(np.float32)
        self.tracker_state = TrackerState(
            arena=merged,
            T_lm_robot=jnp.asarray(T_new),
            velocity=m.query_state.velocity,
            meas_buf=buf,
        )
        self.num_relocalizations += 1
        self._frames_in_current_map = 1  # arena is populated
        self.current_map = cand
        # keyframes recorded in the abandoned map are in its frame and index
        # its arena — they must not feed the reloaded map's local BA
        self._ba_keyframes = []
        # the split frame's record belongs to the reloaded map
        self.frames[m.frame_record_index] = FrameRecord(
            m.timestamp, cand, T_new)
        for f in rest:
            self.process_dispatch(*f.meas, f.timestamp)

    # ------------------------------------------------------------------
    # per-frame processing
    # ------------------------------------------------------------------

    def process(self, meas_points, meas_desc, meas_valid, timestamp: float = 0.0):
        """One SLAM step on adapted measurements. Returns the frame stats.

        With ``speculation_depth == 0`` (default) the frame is fully
        processed before returning (the reference's synchronous cadence);
        with a positive depth the host logic runs that many frames behind
        dispatch and NOTHING in the hot path blocks on the device.
        """
        stats = self.process_dispatch(meas_points, meas_desc, meas_valid,
                                      timestamp)
        self.process_finalize()
        return stats

    def process_dispatch(self, meas_points, meas_desc, meas_valid,
                         timestamp: float = 0.0):
        """Dispatch the frame's device work without blocking on the result.

        Starts the async host copy of the frame's status packet and
        enqueues the frame for deferred consumption (SURVEY.md §7.3 hard
        parts 4 and 6).
        """
        if self.num_maps == 0:
            self._make_new_map(se3.identity())
            self.status = INITIALIZING

        with profile_time("tracker_dispatch"):
            state, stats, X = track_step(
                self.tracker_state, meas_points, meas_desc, meas_valid,
                self.cam, self.config.tracker, self.model,
            )
        stats.host_packet.copy_to_host_async()
        self.tracker_state = state
        self.last_stats = stats
        self._queue.append(_PendingFrame(
            meas=(meas_points, meas_desc, meas_valid),
            timestamp=timestamp, state=state, stats=stats,
            packet=stats.host_packet,
        ))
        return stats

    def process_finalize(self):
        """Consume pipeline entries down to the speculation depth."""
        self._drain(self.config.speculation_depth)

    def flush(self):
        """Consume ALL pending pipeline entries (blocking as needed)."""
        if getattr(self, "_draining", False):
            return  # re-entrant flush from inside a consume callback
        self._draining = True
        try:
            self._drain(0, force=True)
            self._drain_chunk_queue(0, force=True)
        finally:
            self._draining = False

    def _drain(self, depth: int, force: bool = False):
        force = force or depth <= 0
        # a closure marker may defer consumption until its packet lands —
        # the queue is allowed to run ahead up to this hard cap meanwhile
        hard = depth + max(depth, 4)
        while len(self._queue) > depth:
            head = self._queue[0]
            if isinstance(head, _ClosureMarker):
                if (not force and len(self._queue) <= hard
                        and not head.packet.is_ready()):
                    return
                self._queue.popleft()
                self._consume_marker(head)
            else:
                self._queue.popleft()
                self._consume_frame(head)

    def _consume_frame(self, e: _PendingFrame):
        """Run the host status machine on an arrived frame packet."""
        config = self.config
        # ONE small vector per frame, already copied to the host by the
        # async stream started at dispatch — this is a cache hit, not a
        # device round trip (the round-2 49.9 ms/frame readback)
        with profile_time("status_readback"):
            pkt = np.asarray(e.packet)
        num_inliers = int(pkt[0])
        t_norm = float(pkt[1])
        angle = float(pkt[2])

        if self._frames_in_current_map == 0:
            # the first frame of a fresh local map only populates the arena
            # (matches are impossible against an empty scene) — the
            # reference's Initializing status (app_benchmark.cpp:123-135)
            self.status = INITIALIZING
        elif num_inliers >= config.min_track_inliers:
            self.status = TRACKING
        else:
            self.status = LOST
        self._frames_in_current_map += 1

        if config.local_ba.enabled and self.status == TRACKING:
            self._record_ba_keyframe(e)

        if self.status == LOST:
            self._rollback_replay(e, lambda: self._handle_lost(e))
            T_rec = np.eye(4, dtype=np.float32)
        elif (t_norm > config.splitting.maximum_translation_m
              or angle > config.splitting.maximum_rotation_rad):
            # splitting criterion (viewpoint distance, kitti.conf:542-550)
            T_split = np.eye(4, dtype=np.float32)
            T_split[:3, :] = pkt[8:20].reshape(3, 4)
            with profile_time("split"):
                self._rollback_replay(
                    e, lambda: self._handle_split(e, T_split))
            T_rec = np.eye(4, dtype=np.float32)
        else:
            T_rec = np.eye(4, dtype=np.float32)
            T_rec[:3, :] = pkt[8:20].reshape(3, 4)
        self.frames.append(FrameRecord(
            timestamp=e.timestamp,
            local_map_index=self.current_map,
            T_lm_robot=T_rec,
        ))
        self._frame_count += 1

    def _rollback_replay(self, e: _PendingFrame, handler):
        """Roll the tracker back to frame ``e``, run ``handler`` (split /
        lost), then replay the frames that were speculatively dispatched
        after it.  The replayed tracker steps are the cost of a mispredict
        (~2 ms each); correct-path frames never pay anything."""
        rest = [f for f in self._queue]
        self._queue.clear()
        self.tracker_state = e.state
        handler()
        for f in rest:
            self.process_dispatch(*f.meas, f.timestamp)

    def _handle_lost(self, e: _PendingFrame):
        """Lost -> abandon and start a fresh local map at the predicted
        world pose (app_benchmark.cpp:163-169); the motion model resets
        like the reference matcher's total-loss recovery
        (correspondence_finder_projective_base_impl.cpp:251-258) —
        dead-reckoning a stale velocity through repeated losses otherwise
        runs away."""
        self.num_losses += 1
        T_world_lm = self.graph.poses[self.current_map]
        T_world_robot = T_world_lm @ e.state.T_lm_robot
        with profile_time("db_insert"):
            self._finalize_current_map()
        self._make_new_map(T_world_robot)
        self.tracker_state = self.tracker_state._replace(
            velocity=jnp.zeros(6, jnp.float32)
        )
        self.status = TRACKING

    def _record_ba_keyframe(self, e: _PendingFrame):
        """Keep the most recent keyframes' associations for split-time BA
        (device references only — no per-frame readback)."""
        lba = self.config.local_ba
        if self._frames_in_current_map % lba.keyframe_stride != 0:
            return
        meas_points = e.meas[0]
        if self.model == "stereo":
            gn_meas = meas_points[:, :3]   # (uL, vL, uR)
        else:
            gn_meas = meas_points          # (u, v, d)
        # BA keyframes are SENSOR poses: fold the sensor-in-robot extrinsic
        T_rs = jnp.asarray(self.config.tracker.T_robot_sensor,
                           jnp.float32).reshape(4, 4)
        self._ba_keyframes.append((
            e.state.T_lm_robot @ T_rs,
            e.stats.match_idx,
            gn_meas,
            e.stats.match_mask,
        ))
        if len(self._ba_keyframes) > lba.max_keyframes:
            self._ba_keyframes.pop(0)

    def _run_local_ba(self):
        """Jointly refine the finished map's keyframes + landmarks.

        Problem assembly is pure device work over the keyframe refs kept by
        ``_record_ba_keyframe`` — no host materialization.
        """
        lba = self.config.local_ba
        K = len(self._ba_keyframes)
        if K < 2:
            return
        arena = self.tracker_state.arena
        P = lba.max_keyframes
        N = self._ba_keyframes[0][2].shape[0]
        L = arena.capacity
        problem = ba_ops.empty_problem(P, L, P * N)
        eye = jnp.eye(4, dtype=jnp.float32)
        poses = jnp.stack([
            self._ba_keyframes[k][0] if k < K else eye for k in range(P)
        ])
        pose_valid = jnp.asarray([k < K for k in range(P)])
        zdim = self._ba_keyframes[0][2].shape[1]
        obs_kf = jnp.repeat(jnp.arange(P, dtype=jnp.int32), N)
        obs_lm = jnp.concatenate(
            [jnp.maximum(self._ba_keyframes[k][1], 0) for k in range(K)]
            + [jnp.zeros(((P - K) * N,), jnp.int32)]
        )
        obs_z = jnp.concatenate(
            [self._ba_keyframes[k][2] for k in range(K)]
            + [jnp.zeros(((P - K) * N, zdim), jnp.float32)]
        )
        obs_valid = jnp.concatenate(
            [self._ba_keyframes[k][3] for k in range(K)]
            + [jnp.zeros(((P - K) * N,), bool)]
        )
        refine_mask = arena.valid
        if lba.max_refine_maturity > 0:
            refine_mask = refine_mask & (
                arena.num_updates <= lba.max_refine_maturity)
        problem = problem._replace(
            poses=poses, pose_valid=pose_valid,
            points=arena.pos, point_valid=refine_mask,
            obs_kf=obs_kf, obs_lm=obs_lm,
            obs_z=obs_z, obs_valid=obs_valid,
        )
        refined, chi = ba_ops.optimize(problem, self.cam, self.model, lba.ba)
        self.tracker_state = self.tracker_state._replace(
            arena=arena._replace(pos=refined.points)
        )

    def _handle_split(self, e: _PendingFrame, T_split: np.ndarray):
        """Close the current local map; dispatch loop closing; open the next
        map speculatively (app_benchmark.cpp:136-161).

        Nothing here blocks on the device: the closure/relocalization
        decision is deferred to the marker appended to the pipeline queue.
        """
        if self.config.local_ba.enabled:
            # polish the finished map before it enters the closure database
            with profile_time("local_ba"):
                self._run_local_ba()
        T_world_lm = self.graph.poses[self.current_map]
        T_world_robot = T_world_lm @ e.state.T_lm_robot
        with profile_time("db_insert"):
            self._finalize_current_map()
        marker = None
        if self.config.enable_loop_closing and self.num_maps >= 2:
            with profile_time("loop_detect"):
                marker = self._dispatch_loop_query(e, T_split)
        self._make_new_map(T_world_robot)
        if marker is not None:
            marker.new_map = self.current_map
            marker.odo_edge_slot = self.num_edges - 1
            self._queue.append(marker)

    # ------------------------------------------------------------------
    # chunked stepping (models/chunk.py): B frames per device program
    # ------------------------------------------------------------------

    def process_sequence(self, a_all, b_all, timestamps, adaptor_config,
                         count: int = None):
        """Run a whole image sequence in chunked mode (chunk_size > 0).

        ``a_all``/``b_all``: [T, H, W] image stacks (left/right for stereo,
        intensity/raw-depth for RGB-D) — uploaded to device once; the
        adaptor, tracker and status machine all run inside one device
        program per ``chunk_size`` frames.  Equivalent frame-for-frame to
        the per-frame ``process`` loop (tests/test_chunked.py).
        """
        T = int(count if count is not None else a_all.shape[0])
        self._start_sequence(
            dict(kind="images", a=jnp.asarray(a_all), b=jnp.asarray(b_all),
                 acfg=adaptor_config),
            timestamps, T)
        self._run_sequence()

    def process_meas_sequence(self, points_all, desc_all, valid_all,
                              timestamps, count: int = None):
        """Chunked mode over pre-adapted measurement stacks [T, N, ...]."""
        T = int(count if count is not None else points_all.shape[0])
        self._start_sequence(
            dict(kind="meas", a=jnp.asarray(points_all),
                 b=jnp.asarray(desc_all), c=jnp.asarray(valid_all)),
            timestamps, T)
        self._run_sequence()

    @property
    def _chunk_span(self) -> int:
        """Frames per chunk-op DISPATCH: chunk_size * chunk_group."""
        return self.config.chunk_size * max(1, self.config.chunk_group)

    def _start_sequence(self, seq: dict, timestamps, T: int):
        B = self._chunk_span
        assert B > 0, "sequence processing requires config.chunk_size > 0"
        if self.config.local_ba.enabled:
            raise ValueError(
                "local_ba is per-frame-mode only: its keyframe ring does "
                "not ride the fused chunk op (the smoother landmark "
                "estimator provides the equivalent structure-refinement "
                "capability in-op) — see PARITY.md 'Known behavioral "
                "divergences'")
        assert not self._queue, "cannot mix per-frame and chunked pipelines"
        # pad the sequence to a whole number of chunks so the in-op dynamic
        # slice never clamps onto preceding frames (tail frames are masked
        # inactive via the [lo, hi) window)
        Tp = -(-T // B) * B
        for key in ("a", "b", "c"):
            if key in seq and seq[key].shape[0] < Tp:
                pad = Tp - seq[key].shape[0]
                seq[key] = jnp.concatenate(
                    [seq[key],
                     jnp.zeros((pad,) + seq[key].shape[1:], seq[key].dtype)])
        ts = list(timestamps)
        ts += [float(len(ts) + i) for i in range(T - len(ts))]
        seq["ts"] = ts
        seq["T"] = T
        if self.mesh is not None:
            # sequence stacks + carry scalars join the mesh replicated
            # (multi-controller jit requires globally-consistent operands)
            for key in ("a", "b", "c"):
                if key in seq:
                    seq[key] = jax.device_put(seq[key], self._replicated)
        self._seq = seq
        self._seq_cursor = 0
        self._seq_lo = 0
        if self.num_maps == 0:
            self._make_new_map(se3.identity())
            self.status = INITIALIZING
        state = self.tracker_state
        if self.mesh is not None:
            state = jax.device_put(state, self._replicated)
        self._carry = chunk_ops.ChunkCarry(
            state=state,
            frames_in_map=jnp.int32(self._frames_in_current_map),
            graph=self.graph,
            edge_count=jnp.int32(self.num_edges),
            db=self.db,
            current_map=jnp.int32(self.current_map),
            num_maps=jnp.int32(self.num_maps),
        )

    def _run_sequence(self):
        B = self._chunk_span
        T = self._seq["T"]
        while self._seq_cursor < T or self._cqueue:
            if self._seq_cursor < T:
                self._ensure_chunk_capacity()
                start = self._seq_cursor
                lo = self._seq_lo
                self._seq_lo = 0
                self._dispatch_chunk(start, lo, min(B, T - start))
                self._seq_cursor = start + B
                self._drain_chunk_queue(self.config.chunk_lag)
            else:
                # tail: force-consume everything; a relocalization here can
                # rewind the cursor, re-entering the dispatch branch
                self._drain_chunk_queue(0, force=True)
        self._seq = None

    def _invoke_chunk(self, carry, start: int, lo: int, hi: int):
        """One fused chunk-op call (dispatch or deterministic reloc replay)."""
        seq = self._seq
        config = self.config
        sp = config.splitting
        common = (
            self.config.tracker, self.model, config.chunk_size,
            config.min_track_inliers,
            sp.maximum_translation_m, sp.maximum_rotation_rad,
            config.loop, config.pgo, config.max_db_descriptors_per_map,
            config.enable_loop_closing,
        )
        group = max(1, config.chunk_group)
        if seq["kind"] == "images":
            return chunk_ops.fused_image_chunk_op(
                carry, seq["a"], seq["b"], start, lo, hi, self.cam,
                seq["acfg"], *common, group_size=group)
        return chunk_ops.fused_meas_chunk_op(
            carry, seq["a"], seq["b"], seq["c"], start, lo, hi, self.cam,
            *common, group_size=group)

    def _dispatch_chunk(self, start: int, lo: int, hi: int):
        inputs = self._carry
        with profile_time("chunk_dispatch"):
            carry, ys = self._invoke_chunk(inputs, start, lo, hi)
        ys.packet.copy_to_host_async()
        packet = self._fetcher.submit(np.asarray, ys.packet)
        self._carry = carry
        # keep the public attributes pointing at the freshest device refs
        # (accessors flush + read them)
        self.tracker_state = carry.state
        self.graph = carry.graph
        self.db = carry.db
        self._cqueue.append(_ChunkEntry(ys=ys, inputs=inputs, outputs=carry,
                                        start=start, lo=lo, hi=hi,
                                        packet=packet))

    def _drain_chunk_queue(self, lag: int, force: bool = False):
        while self._cqueue and (force or len(self._cqueue) > lag):
            entry = self._cqueue.popleft()
            self._consume_chunk(entry)
            self._chunks_consumed += 1

    def _consume_chunk(self, entry: _ChunkEntry):
        """Mirror the on-device status machine, splits and closure decisions.

        ONE packet read per chunk: the per-frame status rows AND the
        per-split decisions (which ran inside the same device program)
        arrive together — there is no separate split dispatch or decision
        readback to wait for.
        """
        config = self.config
        P = chunk_ops
        B = self._chunk_span
        K = config.loop.max_candidates
        SM = P.split_meta_size(K)
        with profile_time("chunk_readback"):
            flat = entry.packet.result()
        pkt = flat[:B * P.PACKET_SIZE].reshape(B, P.PACKET_SIZE)
        meta = flat[B * P.PACKET_SIZE:].reshape(B, SM)
        ts_all = self._seq["ts"]
        # compact this chunk's split outputs to ONE [n_splits, ...] stack
        # (a single gather dispatch) so the mirrors below never pin the
        # whole [B] chunk output on device (VERDICT r4 item 2)
        split_frames = [i for i in range(B)
                        if pkt[i, P.PKT_ACTIVE] > 0.5
                        and pkt[i, P.PKT_FINISH] > 0.5]
        if split_frames:
            s_arenas, s_desc, s_pos, s_rows = chunk_ops.take_frames(
                (entry.ys.arenas, entry.ys.split_desc,
                 entry.ys.split_pos, entry.ys.split_rows),
                jnp.asarray(split_frames, jnp.int32))
            split_slot = {i: j for j, i in enumerate(split_frames)}
        for i in range(B):
            row = pkt[i]
            if row[P.PKT_ACTIVE] < 0.5:
                continue
            g = entry.start + i
            if self._frames_in_current_map == 0:
                self.status = INITIALIZING
            elif row[P.PKT_INLIERS] >= config.min_track_inliers:
                self.status = TRACKING
            else:
                self.status = LOST
            self._frames_in_current_map += 1
            fin = row[P.PKT_FINISH]
            if fin == P.FINISH_NONE:
                T_rec = np.eye(4, dtype=np.float32)
                T_rec[:3, :] = row[P.PKT_T:P.PKT_T + 12].reshape(3, 4)
                self.frames.append(FrameRecord(
                    ts_all[g], self.current_map, T_rec))
                self._frame_count += 1
                continue
            # device-detected finish: mirror the split the op already ran
            sm = meta[i]
            prev, new = int(sm[P.SM_PREV]), int(sm[P.SM_NEW])
            # mirrors reference slices of the per-chunk SPLIT STACK (built
            # above with one gather), not the whole chunk output — holding
            # a frame's arena keeps n_splits frames alive, not [B]
            self._map_arenas[prev] = ("stack", s_arenas, split_slot[i])
            self._note_device_arena(prev)
            if sm[P.SM_INS] > 0.5:
                ev = int(sm[P.SM_EVICTED])
                if ev >= 0:
                    # the ring slot write overwrote the oldest stored map
                    self._db_entries.pop(ev, None)
                    self.num_db_evictions += 1
                    print(f"[slam] loop database ring full: evicted map "
                          f"{ev} ({self.num_db_evictions} evictions total)")
                self._db_entries[prev] = dict(
                    _stack=(s_desc, s_pos, s_rows, split_slot[i]),
                    _n=int(sm[P.SM_DBN]),
                )
            self.num_edges = int(sm[P.SM_EDGES])
            self.num_maps = new + 1
            self.current_map = new
            self._frames_in_current_map = 0
            self.frames.append(FrameRecord(
                ts_all[g], self.current_map, np.eye(4, dtype=np.float32)))
            self._frame_count += 1
            if fin == P.FINISH_LOST:
                self.num_losses += 1
                self.status = TRACKING
            # closure decision: rode the SAME packet as the split
            cp = sm[P.SM_CP:].reshape(K, 22)
            accepted = [k for k in range(K)
                        if cp[k, 1] > 0.5 and cp[k, 0] >= 0]
            rejected = [k for k in range(K) if cp[k, 1] < -0.5]
            if rejected:
                self.num_backstop_rejections += len(rejected)
                print(f"[slam] closure backstop: rejected {len(rejected)} "
                      f"candidate(s) into map {prev} on device")
            if not accepted:
                continue
            self.num_closures += len(accepted)
            for k in accepted:
                self.closure_events.append((int(cp[k, 0]), prev))
            best_k = max(accepted, key=lambda k: cp[k, 2])
            brow = cp[best_k]
            if self._reloc_gates(brow):
                with profile_time("reloc"):
                    self._fused_relocalize(
                        entry, i, g, best_k, int(brow[0]),
                        brow[6:22].reshape(4, 4).astype(np.float32),
                        row, sm, pkt, meta)
                return  # rest of this chunk (and queue) is rolled back

    def _fused_relocalize(self, entry: _ChunkEntry, i: int, g: int, k: int,
                          cand: int, T_k: np.ndarray, row: np.ndarray,
                          sm: np.ndarray, pkt: np.ndarray,
                          meta: np.ndarray):
        """Reload old map ``cand``: recover the at-finish state, merge.

        The decision arrived in the finish frame's own chunk packet, so no
        host bookkeeping exists past the finish yet — rollback is simply
        (a) dropping the not-yet-consumed queue, (b) recovering the device
        state exactly at the split, (c) ``reloc_op``, (d) rewinding the
        sequence cursor so the frames after the finish re-dispatch against
        the reloaded map.

        (b) is usually FREE: graph / database / map counters only change at
        finishes, so when no later frame of this chunk finished a map the
        already-computed end-of-chunk carry IS the at-finish carry, and the
        per-frame ``ys`` rows for frames <= i are identical by determinism
        — no replay dispatch at all.  A second finish after frame i (two
        splits in one chunk behind a closure) is ROLLED BACK on device
        instead of replayed: a later finish only (1) adds a pose + odometry
        edge (invalidated, like ``reloc_op``'s dead-map retirement), (2)
        writes a db ring slot (restored from the host mirror / cleared),
        and (3) bumps the carry counters (overwritten from the finish
        frame's own split-meta row) — two tiny dispatches instead of the
        full-chunk replay that measured ~165 ms (~18% of the round-5 bench
        wall).  The replay remains the fallback for the two cases the
        rollback cannot cover: a later finish whose accepted closure ran
        PGO (pose rewrites are not invertible by invalidation), and the
        mesh-integrated orchestrator (host-built rollback operands would
        not carry the ring's shardings).
        """
        config = self.config
        P = chunk_ops
        K = config.loop.max_candidates
        self._cqueue.clear()
        later = [j for j in range(i + 1, pkt.shape[0])
                 if pkt[j, P.PKT_ACTIVE] > 0.5 and pkt[j, P.PKT_FINISH] > 0.5]
        if not later:
            carry_fin, ys_fin = entry.outputs, entry.ys
        else:
            later_closure = any(
                meta[j, P.SM_CP + 22 * c + 1] > 0.5
                for j in later for c in range(K))
            if later_closure or self.mesh is not None:
                self.num_reloc_replays += 1
                carry_fin, ys_fin = self._invoke_chunk(
                    entry.inputs, entry.start, entry.lo, i + 1)
            else:
                try:
                    carry_fin = self._rollback_later_finishes(
                        entry.outputs, sm, [meta[j] for j in later])
                    ys_fin = entry.ys
                    self.num_reloc_rollbacks += 1
                except KeyError:
                    # an evicted map's mirror is gone (shouldn't happen —
                    # consume order guarantees it; keep the bit-exact path
                    # as the safety net)
                    self.num_reloc_replays += 1
                    carry_fin, ys_fin = self._invoke_chunk(
                        entry.inputs, entry.start, entry.lo, i + 1)
        T_split = np.eye(4, dtype=np.float32)
        T_split[:3, :] = row[P.PKT_T:P.PKT_T + 12].reshape(3, 4)
        velocity = row[P.PKT_VEL:P.PKT_VEL + 6].astype(np.float32)
        ref_arena = jax.tree_util.tree_map(jnp.asarray,
                                           self._get_map_arena(cand))
        query_arena = chunk_ops.take_frame(ys_fin.arenas, i)
        graph, state = chunk_ops.reloc_op(
            carry_fin.graph, ref_arena, query_arena,
            chunk_ops.take_frame(ys_fin.loop_T, i),
            chunk_ops.take_frame(ys_fin.loop_row, i),
            chunk_ops.take_frame(ys_fin.loop_mask, i), jnp.int32(k),
            jnp.asarray(T_split), jnp.asarray(velocity),
            int(sm[P.SM_NEW]), int(sm[P.SM_ODO]),
            config.closure_merge_max_insertions,
            config.tracker.landmark_estimator,
        )
        self._carry = chunk_ops.ChunkCarry(
            state=state, frames_in_map=jnp.int32(1), graph=graph,
            edge_count=carry_fin.edge_count, db=carry_fin.db,
            current_map=jnp.int32(cand), num_maps=carry_fin.num_maps,
        )
        self.tracker_state = state
        self.graph = graph
        self.db = carry_fin.db
        self._map_arenas[cand] = state.arena
        self._note_device_arena(cand)
        self.current_map = cand
        self._frames_in_current_map = 1
        self.num_relocalizations += 1
        # the finish frame's record belongs to the reloaded map
        self.frames[-1] = FrameRecord(
            self._seq["ts"][g], cand, (T_k @ T_split).astype(np.float32))
        # rewind the sequence cursor to the frame after the finish
        B = self._chunk_span
        gnext = g + 1
        self._seq_cursor = (gnext // B) * B
        self._seq_lo = gnext - self._seq_cursor

    def _rollback_later_finishes(self, carry, sm_i: np.ndarray,
                                 later_meta: list):
        """At-finish carry from the end-of-chunk carry, by undoing the
        later finishes' mutations on device (no chunk replay).

        Each later finish added a pose + odometry edge (invalidated — the
        values stay stale exactly like ``reloc_op``'s dead-map retirement),
        possibly wrote a db ring slot (restored from the host mirror of the
        map it evicted, or cleared when the slot was free), and advanced
        the counters (restored from the finish frame's own split-meta row).
        The caller guarantees no later finish retained an accepted closure,
        so no PGO rewrote the poses.  Invalid-row padding of a restored
        slot matches ``add_local_map``'s fills bit-exactly.
        """
        P = chunk_ops
        cap = carry.graph.capacity
        ecap = carry.graph.edge_capacity
        budget = self.config.max_db_descriptors_per_map
        # pad with out-of-range indices: scatter drops them under jit
        pad = 8
        dead_p = np.full((max(pad, len(later_meta)),), cap, np.int32)
        dead_e = np.full((max(pad, len(later_meta)),), ecap, np.int32)
        for n, m in enumerate(later_meta):
            dead_p[n] = int(m[P.SM_NEW])
            dead_e[n] = int(m[P.SM_ODO])
        graph = chunk_ops.undo_graph_entries(
            carry.graph, jnp.asarray(dead_p), jnp.asarray(dead_e))
        db = carry.db
        S = db.num_slots
        next_fin = int(sm_i[P.SM_DBNEXT])
        for m in reversed(later_meta):
            if m[P.SM_INS] < 0.5:
                continue
            slot = (int(m[P.SM_DBNEXT]) - 1) % S
            ev = int(m[P.SM_EVICTED])
            desc = np.full((budget, lm.DESC_BITS), -1, np.int8)
            points = np.zeros((budget, 3), np.float32)
            rows = np.zeros((budget,), np.int32)
            valid = np.zeros((budget,), bool)
            if ev >= 0:
                ent = self._entry_np(self._db_entries[ev])
                n = min(ent["desc"].shape[0], budget)
                desc[:n] = ent["desc"][:n]
                points[:n] = ent["points"][:n]
                rows[:n] = ent["rows"][:n]
                valid[:n] = True
            db = chunk_ops.db_write_slot(
                db, jnp.int32(slot), jnp.asarray(desc), jnp.asarray(points),
                jnp.asarray(rows), jnp.asarray(valid),
                ev if ev >= 0 else -1, next_fin)
        return carry._replace(
            graph=graph, db=db,
            edge_count=jnp.int32(int(sm_i[P.SM_EDGES])),
            num_maps=jnp.int32(int(sm_i[P.SM_NEW]) + 1),
        )

    def _ensure_chunk_capacity(self):
        """Pre-grow the pose graph so in-flight chunks can never overflow.

        The bound is loose (every frame of every in-flight chunk could in
        principle split); tripping it drains the queue for exact counts and
        grows double-and-copy — a rare, recompiling event.
        """
        config = self.config
        B = self._chunk_span
        K = config.loop.max_candidates
        inflight = len(self._cqueue) + 1
        g = self._carry.graph
        if (self.num_maps + inflight * B <= g.capacity
                and self.num_edges + inflight * B * (1 + K)
                <= g.edge_capacity):
            return
        self._drain_chunk_queue(0, force=True)
        g = self._carry.graph
        pcap, ecap = g.capacity, g.edge_capacity
        while self.num_maps + B > pcap:
            pcap *= 2
        while self.num_edges + B * (1 + K) > ecap:
            ecap *= 2
        if (pcap, ecap) != (g.capacity, g.edge_capacity):
            print(f"[slam] growing pose graph to {pcap} poses / {ecap} "
                  "edges (chunk op recompiles)")
            self._carry = self._carry._replace(graph=pgo.grow(g, pcap, ecap))
            self.graph = self._carry.graph
            if self.mesh is not None:
                self._apply_mesh()


    # ------------------------------------------------------------------
    # accessors (example_slam_3d.cpp:106-141 parity)
    # ------------------------------------------------------------------

    def robot_in_world(self) -> np.ndarray:
        self.flush()
        T_world_lm = np.asarray(self.graph.poses[self.current_map])
        return T_world_lm @ np.asarray(self.tracker_state.T_lm_robot)

    def current_local_map(self) -> lm.LandmarkArena:
        self.flush()
        return self.tracker_state.arena

    def trajectory(self) -> List[np.ndarray]:
        """Unroll per-frame poses through (PGO-updated) local-map estimates.

        app_benchmark.cpp:195-203 parity: keyframe-relative poses recombined
        with the optimized local-map transforms.
        """
        self.flush()
        poses = np.asarray(self.graph.poses)
        return [poses[f.local_map_index] @ f.T_lm_robot for f in self.frames]

    def timestamps(self) -> List[float]:
        self.flush()
        return [f.timestamp for f in self.frames]
