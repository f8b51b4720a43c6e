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
    # mature landmarks of a finalized map enter; keeps long runs within
    # ``database_capacity`` before eviction has to kick in
    max_db_descriptors_per_map: int = 1024
    enable_loop_closing: bool = True
    min_track_inliers: int = 6          # below this the tracker is Lost
    # merged-landmark insertion budget when relocalizing into an old map
    closure_merge_max_insertions: int = 512


# tracker status machine (app_benchmark.cpp:123-178)
INITIALIZING = "Initializing"
TRACKING = "Tracking"
LOST = "Lost"


class FrameRecord(NamedTuple):
    """Host-side per-frame bookkeeping for trajectory unrolling."""

    timestamp: float
    local_map_index: int
    T_lm_robot: np.ndarray  # robot in its local map at this frame


class GraphSLAM:
    """Host orchestrator driving the jitted stages.

    Usage mirrors the reference public API (slam->setRawData/compute,
    example_slam_3d.cpp:106-124): call ``process(meas_points, desc, valid,
    timestamp)`` per frame; read ``robot_in_world()``, ``trajectory()``,
    ``status``.
    """

    def __init__(self, cam: Camera, config: GraphSLAMConfig = GraphSLAMConfig(),
                 model: str = "stereo"):
        self.cam = cam
        self.config = config
        self.model = model
        self.status = INITIALIZING
        self.tracker_state: TrackerState = initial_state(
            config.arena_capacity, estimator=config.tracker.landmark_estimator)
        self.graph = pgo.empty_graph(config.max_local_maps, config.max_edges)
        self.db = loop_closure.empty_database(config.database_capacity)
        self.num_maps = 0
        self.current_map = -1   # index of the active local map
        self.num_edges = 0
        self.num_closures = 0
        self.frames: List[FrameRecord] = []
        self._frame_count = 0
        self._frames_in_current_map = 0
        self.last_stats = None
        self._pending = None  # dispatched-but-unfinalized frame (pipelining)
        # host-side snapshots of finalized local-map arenas, indexed by map
        # id — the store the relocalizer reloads from (the reference keeps
        # every local map alive in its graph; we snapshot to host RAM)
        self._map_arenas: dict = {}
        # host mirror of the closure database: map id -> budget-selected
        # (desc, points, rows) numpy arrays, insertion-ordered.  Enables
        # eviction of the oldest maps (with a rebuild) when the device
        # database would overflow — instead of silently dropping rows.
        self._db_entries: "dict" = {}
        self.num_db_evictions = 0
        self.num_relocalizations = 0
        # local-BA keyframe records of the ACTIVE map: (T_lm_robot np,
        # match_idx np, gn_meas np, mask np)
        self._ba_keyframes: list = []

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
        self.graph = pgo.add_edge(self.graph, self.num_edges, i, j, Z,
                                  weight=weight)
        self.num_edges += 1

    def _db_select_budget(self, arena_np) -> np.ndarray:
        """Validity mask of the per-map descriptor budget: the most mature
        (highest num_updates) landmarks win."""
        budget = self.config.max_db_descriptors_per_map
        valid = arena_np.valid
        n_valid = int(valid.sum())
        if n_valid <= budget:
            return valid.copy()
        key = np.where(valid, -arena_np.num_updates.astype(np.int64), 1 << 40)
        keep_rows = np.argsort(key, kind="stable")[:budget]
        mask = np.zeros_like(valid)
        mask[keep_rows] = True
        return mask

    def _rebuild_db(self):
        """Rebuild the device database from the host mirror (post-eviction)."""
        cap = self.db.capacity
        desc = np.full((cap, 256), -1, np.int8)
        points = np.zeros((cap, 3), np.float32)
        map_id = np.full((cap,), -1, np.int32)
        arena_row = np.zeros((cap,), np.int32)
        valid = np.zeros((cap,), bool)
        offset = 0
        for mid, entry in self._db_entries.items():
            n = entry["desc"].shape[0]
            sl = slice(offset, offset + n)
            desc[sl] = entry["desc"]
            points[sl] = entry["points"]
            map_id[sl] = mid
            arena_row[sl] = entry["rows"]
            valid[sl] = True
            offset += n
        self.db = loop_closure.DescriptorDatabase(
            desc=jnp.asarray(desc), points=jnp.asarray(points),
            map_id=jnp.asarray(map_id), arena_row=jnp.asarray(arena_row),
            valid=jnp.asarray(valid), size=jnp.int32(offset),
        )

    def _finalize_current_map(self):
        """Push the finished local map's landmarks into the closure database
        and snapshot its arena for relocalization reloads.

        Capacity lifecycle: each map contributes at most
        ``max_db_descriptors_per_map`` rows; when the database would
        overflow, the OLDEST maps are evicted (with a warning) and the
        device database rebuilt — closures keep firing on long runs instead
        of silently stopping.
        """
        arena = self.tracker_state.arena
        arena_np = jax.tree_util.tree_map(np.asarray, arena)
        self._map_arenas[self.current_map] = arena_np
        if not self.config.enable_loop_closing:
            return
        if self.current_map in self._db_entries:
            return  # re-finalizing a reloaded map: descriptors already stored
        keep = self._db_select_budget(arena_np)
        rows = np.nonzero(keep)[0].astype(np.int32)
        self._db_entries[self.current_map] = dict(
            desc=arena_np.desc[rows], points=arena_np.pos[rows], rows=rows,
        )
        total = sum(e["desc"].shape[0] for e in self._db_entries.values())
        if total > self.db.capacity:
            while total > self.db.capacity and len(self._db_entries) > 1:
                oldest = next(iter(self._db_entries))
                total -= self._db_entries.pop(oldest)["desc"].shape[0]
                self.num_db_evictions += 1
                print(f"[slam] loop database full: evicted map {oldest} "
                      f"({self.num_db_evictions} evictions total)")
            self._rebuild_db()
        else:
            # common path: jitted contiguous append of the selected rows
            sel = jnp.asarray(keep)
            self.db = loop_closure.add_local_map(
                self.db, arena.desc, arena.pos, sel, self.current_map
            )

    def _detect_and_close_loops(self):
        """loopDetect/loopValidate/optimize (app_benchmark.cpp:136-161).

        Queries the database, validates ALL top-K candidate maps (one
        vmapped jit), adds a closure factor for EVERY accepted candidate —
        the reference extracts and validates closures for each qualifying
        reference map (correspondence_finder_hbst.cpp:95-128) — and runs
        global PGO once.  Returns the best accepted closure (for the
        relocalizer) as (map id, closure slice, match_row, match_mask).
        """
        if not self.config.enable_loop_closing or self.num_maps < 2:
            return None
        arena = self.tracker_state.arena
        result = loop_closure.query(
            arena.desc, arena.valid, self.current_map, self.db,
            self.config.loop, self.graph.capacity,
        )
        cands = np.asarray(result.candidate_maps)
        if not (cands >= 0).any():
            return None
        # initial guesses: relative poses from current graph estimates
        poses = self.graph.poses
        T_init = jax.vmap(
            lambda c: se3.inverse(poses[jnp.maximum(c, 0)])
            @ poses[self.current_map]
        )(result.candidate_maps)
        closures = loop_closure.validate_batch(
            arena.pos, result, T_init, self.config.loop
        )
        accepted = np.asarray(closures.accepted) & (cands >= 0)
        if not accepted.any():
            return None
        best = None
        best_inliers = -1
        for k in np.nonzero(accepted)[0]:
            cand = int(cands[k])
            T_k = np.asarray(closures.T_query_in_ref[k])
            self._add_graph_edge(cand, self.current_map, jnp.asarray(T_k))
            self.num_closures += 1
            n_inl = int(closures.num_inliers[k])
            if n_inl > best_inliers:
                best_inliers = n_inl
                best = (
                    cand,
                    jax.tree_util.tree_map(lambda a, kk=k: a[kk], closures),
                    result.match_row[k],
                    result.match_mask[k],
                )
        with profile_time("pgo"):
            self.graph, _ = pgo.optimize(self.graph, self.config.pgo)
        return best

    def _try_relocalize(self, cand: int, closure) -> bool:
        """MultiRelocalizer3D analog: jump back into a nearby old local map.

        Accepts when the closure's implied displacement is small and the
        alignment meets the relocalizer gates (kitti.conf:91-110), including
        the inlier-ratio gate.
        """
        rc = self.config.relocalizer
        t = np.asarray(closure.T_query_in_ref[:3, 3])
        return bool(
            np.linalg.norm(t) <= rc.max_translation
            and int(closure.num_inliers) >= rc.relocalize_min_inliers
            and float(closure.chi_per_inlier) <= rc.relocalize_max_chi_inliers
            and float(closure.inlier_ratio) >= rc.relocalize_min_inliers_ratio
        )

    # ------------------------------------------------------------------
    # per-frame processing
    # ------------------------------------------------------------------

    def process(self, meas_points, meas_desc, meas_valid, timestamp: float = 0.0):
        """One SLAM step on adapted measurements. Returns the frame stats."""
        stats = self.process_dispatch(meas_points, meas_desc, meas_valid,
                                      timestamp)
        self.process_finalize()
        return stats

    def process_dispatch(self, meas_points, meas_desc, meas_valid,
                         timestamp: float = 0.0):
        """Dispatch the frame's device work without blocking on the result.

        Frame pipelining (SURVEY.md §7.3 hard part 4): the caller may enqueue
        the NEXT frame's adaptor right after this returns — it executes on
        device while the host sits in ``process_finalize``'s readback for
        THIS frame — overlapping frontend t+1 with the tracker/status round
        trip of frame t.  ``process`` == dispatch + finalize.
        """
        assert self._pending is None, "process_dispatch without finalize"
        if self.num_maps == 0:
            self._make_new_map(se3.identity())
            self.status = INITIALIZING

        with profile_time("tracker_dispatch"):
            state, stats, X = track_step(
                self.tracker_state, meas_points, meas_desc, meas_valid,
                self.cam, self.config.tracker, self.model,
            )
        self.tracker_state = state
        self.last_stats = stats
        self._pending = (state, stats, meas_points, timestamp)
        return stats

    def process_finalize(self):
        """Block on the dispatched frame's stats and run the host logic."""
        state, stats, meas_points, timestamp = self._pending
        self._pending = None
        config = self.config
        # ONE batched host readback drives the status machine AND the
        # splitting criterion (its scalars are computed on device): on a
        # tunneled/remote TPU every sync costs a full round trip, so the
        # scalars and the per-frame pose are fetched together
        with profile_time("status_readback"):
            num_inliers, t_norm, angle, T_lm_robot_np = jax.device_get((
                stats.num_inliers, stats.trans_in_map, stats.rot_in_map,
                state.T_lm_robot,
            ))
        num_inliers = int(num_inliers)

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
            self._record_ba_keyframe(meas_points, stats)

        if self.status == LOST:
            # Lost -> abandon and start a fresh local map at the predicted
            # world pose (app_benchmark.cpp:163-169); the motion model
            # resets like the reference matcher's total-loss recovery
            # (correspondence_finder_projective_base_impl.cpp:251-258) —
            # dead-reckoning a stale velocity through repeated losses
            # otherwise runs away
            T_world_lm = self.graph.poses[self.current_map]
            T_world_robot = T_world_lm @ state.T_lm_robot
            self._finalize_current_map()
            self._make_new_map(T_world_robot)
            self.tracker_state = self.tracker_state._replace(
                velocity=jnp.zeros(6, jnp.float32)
            )
            self.status = TRACKING
        else:
            # splitting criterion (viewpoint distance, kitti.conf:542-550);
            # the scalars were computed on device and read back above
            if (
                t_norm > config.splitting.maximum_translation_m
                or angle > config.splitting.maximum_rotation_rad
            ):
                with profile_time("split"):
                    self._split()

        if self.tracker_state.T_lm_robot is state.T_lm_robot:
            T_rec = T_lm_robot_np
        else:  # a split/lost handler replaced the tracker state
            T_rec = np.asarray(self.tracker_state.T_lm_robot)
        self.frames.append(FrameRecord(
            timestamp=timestamp,
            local_map_index=self.current_map,
            T_lm_robot=T_rec,
        ))
        self._frame_count += 1
        return stats

    def _record_ba_keyframe(self, meas_points, stats):
        """Keep the most recent keyframes' associations for split-time BA."""
        lba = self.config.local_ba
        if self._frames_in_current_map % lba.keyframe_stride != 0:
            return
        if self.model == "stereo":
            gn_meas = np.asarray(meas_points[:, :3])   # (uL, vL, uR)
        else:
            gn_meas = np.asarray(meas_points)          # (u, v, d)
        # BA keyframes are SENSOR poses: fold the sensor-in-robot extrinsic
        T_rs = np.asarray(self.config.tracker.T_robot_sensor,
                          np.float32).reshape(4, 4)
        self._ba_keyframes.append((
            np.asarray(self.tracker_state.T_lm_robot) @ T_rs,
            np.asarray(stats.match_idx),
            gn_meas,
            np.asarray(stats.match_mask),
        ))
        if len(self._ba_keyframes) > lba.max_keyframes:
            self._ba_keyframes.pop(0)

    def _run_local_ba(self):
        """Jointly refine the finished map's keyframes + landmarks."""
        lba = self.config.local_ba
        if len(self._ba_keyframes) < 2:
            return
        arena = self.tracker_state.arena
        P = lba.max_keyframes
        N = self._ba_keyframes[0][2].shape[0]
        L = arena.capacity
        problem = ba_ops.empty_problem(P, L, P * N)
        poses = np.broadcast_to(np.eye(4, dtype=np.float32), (P, 4, 4)).copy()
        pose_valid = np.zeros(P, bool)
        obs_kf = np.zeros(P * N, np.int32)
        obs_lm = np.zeros(P * N, np.int32)
        obs_z = np.zeros((P * N, 3), np.float32)
        obs_valid = np.zeros(P * N, bool)
        for k, (T, idx, z, mask) in enumerate(self._ba_keyframes):
            poses[k] = T
            pose_valid[k] = True
            sl = slice(k * N, (k + 1) * N)
            obs_kf[sl] = k
            obs_lm[sl] = np.maximum(idx, 0)
            obs_z[sl] = z
            obs_valid[sl] = mask
        problem = problem._replace(
            poses=jnp.asarray(poses), pose_valid=jnp.asarray(pose_valid),
            points=arena.pos, point_valid=arena.valid,
            obs_kf=jnp.asarray(obs_kf), obs_lm=jnp.asarray(obs_lm),
            obs_z=jnp.asarray(obs_z), obs_valid=jnp.asarray(obs_valid),
        )
        refined, chi = ba_ops.optimize(problem, self.cam, self.model, lba.ba)
        self.tracker_state = self.tracker_state._replace(
            arena=arena._replace(pos=refined.points)
        )

    def _split(self):
        """Close the current local map; loop-close; relocalize or open a new map."""
        if self.config.local_ba.enabled:
            # polish the finished map before it enters the closure database
            with profile_time("local_ba"):
                self._run_local_ba()
        T_world_lm = self.graph.poses[self.current_map]
        T_lm_robot = self.tracker_state.T_lm_robot
        T_world_robot = T_world_lm @ T_lm_robot
        with profile_time("db_insert"):
            self._finalize_current_map()
        with profile_time("loop_detect"):
            hit = self._detect_and_close_loops()
        if hit is not None:
            cand, closure, match_row, match_mask = hit
            if self._try_relocalize(cand, closure):
                # reload the old local map instead of opening a new one
                # (MultiRelocalizer3D re-enters old maps, kitti.conf:91-110;
                # app_benchmark.cpp:150-161 reloads via closure geometry) —
                # and merge the finished query map's landmarks into it via
                # the closure correspondences (the reference's
                # tracker->setClosure merge flow)
                arena_np = self._map_arenas[cand]
                arena = jax.tree_util.tree_map(jnp.asarray, arena_np)
                arena = lm.merge_closure(
                    arena, self.tracker_state.arena,
                    closure.T_query_in_ref, match_row, match_mask,
                    self.config.closure_merge_max_insertions,
                )
                self._map_arenas[cand] = jax.tree_util.tree_map(
                    np.asarray, arena
                )
                buf = self.tracker_state.meas_buf
                if buf is not None:
                    # smoother buffers belong to the abandoned query map;
                    # the reloaded map starts with empty observation history
                    buf = jax.tree_util.tree_map(jnp.zeros_like, buf)
                self.tracker_state = self.tracker_state._replace(
                    arena=arena,
                    T_lm_robot=jnp.asarray(closure.T_query_in_ref @ T_lm_robot,
                                           jnp.float32),
                    meas_buf=buf,
                )
                # the reloaded map keeps its (PGO-updated) graph pose; frames
                # now attach to the old map index
                self.num_relocalizations += 1
                self._frames_in_current_map = 1  # arena is populated
                self.current_map = cand
                # keyframes recorded in the abandoned map are in its frame
                # and index its arena — they must not feed the reloaded
                # map's local BA
                self._ba_keyframes = []
                return
        self._make_new_map(T_world_robot)

    # ------------------------------------------------------------------
    # accessors (example_slam_3d.cpp:106-141 parity)
    # ------------------------------------------------------------------

    def robot_in_world(self) -> np.ndarray:
        T_world_lm = np.asarray(self.graph.poses[self.current_map])
        return T_world_lm @ np.asarray(self.tracker_state.T_lm_robot)

    def current_local_map(self) -> lm.LandmarkArena:
        return self.tracker_state.arena

    def trajectory(self) -> List[np.ndarray]:
        """Unroll per-frame poses through (PGO-updated) local-map estimates.

        app_benchmark.cpp:195-203 parity: keyframe-relative poses recombined
        with the optimized local-map transforms.
        """
        poses = np.asarray(self.graph.poses)
        return [poses[f.local_map_index] @ f.T_lm_robot for f in self.frames]

    def timestamps(self) -> List[float]:
        return [f.timestamp for f in self.frames]
