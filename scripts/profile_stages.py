"""Amortized per-stage device profiling of the frame pipeline (round 4).

Each stage runs ``reps`` times inside ONE executable (lax.scan with a
loop-carried data dependence so XLA cannot hoist or overlap iterations),
and the single consuming read amortizes the tunnel's ~25-45 ms dispatch
link to <0.1 ms/rep — the only honest way to time device stages on the
tunneled runtime (see bench.py::amortized_device_times).

Run: python scripts/profile_stages.py          # on the TPU
     JAX_PLATFORMS=cpu python scripts/profile_stages.py   # CPU sanity
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srrg2_proslam_tpu.io import synthetic as syn
from srrg2_proslam_tpu.models.frontend import (
    StereoAdaptorConfig, adapt_stereo, _stereo_tail,
)
from srrg2_proslam_tpu.models.tracker import (
    TrackerConfig, initial_state, track_step,
)
from srrg2_proslam_tpu.ops import features as F
from srrg2_proslam_tpu.ops.matching import match_epipolar
from srrg2_proslam_tpu.ops.subpixel import refine_disparity

REPS = int(os.environ.get("PROFILE_REPS", "128"))
_FLOOR_S = [0.0]   # measured per-invocation link overhead (subtracted)


def _settle(x):
    np.asarray(x)


def amortized(label, fn, *args, reps=REPS):
    """Time reps executions of fn inside one executable; print ms/rep.

    ``fn(i, *args)`` must return an array; the scan carry accumulates a
    scalar of it, forging the data dependence.  The tunnel's fixed
    ~25-35 ms per-invocation cost (measured by the 'link floor' row) is
    subtracted so small stages are not misread as 25/reps ms.
    """
    @jax.jit
    def rep(*args):
        def body(c, i):
            out = fn(i, *args)
            leaves = [jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(out)]
            return c + sum(leaves), None
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(reps, dtype=jnp.int32))
        return c

    _settle(rep(*args))          # compile + absorb first-read transition
    t0 = time.perf_counter()
    _settle(rep(*args))
    dt = (time.perf_counter() - t0 - _FLOOR_S[0]) / reps
    print(f"{label:44s} {dt * 1e3:8.3f} ms")
    return dt


def measure_floor():
    """Fixed cost of one rep-op invocation (empty body): the link."""
    @jax.jit
    def rep():
        c, _ = jax.lax.scan(lambda c, i: (c + i, None), jnp.float32(0),
                            jnp.arange(8, dtype=jnp.float32))
        return c
    _settle(rep())
    t0 = time.perf_counter()
    _settle(rep())
    _FLOOR_S[0] = time.perf_counter() - t0
    print(f"{'link floor (per invocation, subtracted)':44s} "
          f"{_FLOOR_S[0] * 1e3:8.3f} ms")


def main():
    print(f"backend: {jax.default_backend()}, reps={REPS}")
    measure_floor()
    cam = syn.synthetic_camera()
    planes = syn.make_room(size_x=22.0, size_z=32.0)
    T = jnp.asarray(np.eye(4, dtype=np.float32))
    left, right, _ = syn.render_stereo(cam, T, planes)
    acfg = StereoAdaptorConfig()
    fcfg = acfg.extractor
    tcfg = TrackerConfig()
    print(f"image: {left.shape}")

    def pert(img, i):
        return img + (i & 1).astype(img.dtype)

    # ---- detection sub-stages (one image) ----
    amortized("fast_scores (XLA)",
              lambda i, im: F.fast_scores(pert(im, i),
                                          fcfg.detector_threshold), left)
    try:
        from srrg2_proslam_tpu.ops.fast_pallas import fast_scores_pallas
        amortized("fast_scores (pallas)",
                  lambda i, im: fast_scores_pallas(
                      pert(im, i), fcfg.detector_threshold), left)
    except Exception as e:
        print(f"fast_scores (pallas) unavailable: {e}")
    amortized("detect_keypoints (fast+nms+topk+subpx)",
              lambda i, im: F.detect_keypoints(pert(im, i), fcfg)[0], left)
    amortized("boxfilter 5x5",
              lambda i, im: F._boxfilter(pert(im, i), 5), left)

    from srrg2_proslam_tpu.ops.brief_pallas import (
        brief_bitplanes, descriptors_from_planes,
    )
    smooth2 = jax.vmap(lambda im: F._boxfilter(im, 5))(
        jnp.stack([left, right]))
    if jax.default_backend() != "cpu":
        amortized("brief_bitplanes (2 images)",
                  lambda i, s: brief_bitplanes(pert(s, i)), smooth2)

    # ---- full frontend, matching tail ----
    amortized("detect_keypoints_batch (2 images)",
              lambda i, l, r: F.detect_keypoints_batch(
                  jnp.stack([pert(l, i), r]), fcfg)[0], left, right)
    amortized("descriptors_from_planes (2x1152 kp)",
              lambda i, p, yy, xx: jax.vmap(descriptors_from_planes)(
                  p, yy + (i & 1), xx),
              brief_bitplanes(smooth2),
              jnp.stack([jnp.clip(jnp.arange(1152) % 400 + 20, 20, 440)] * 2),
              jnp.stack([jnp.clip(jnp.arange(1152) % 600 + 20, 20, 600)] * 2))
    amortized("extract_features_batch (2 images)",
              lambda i, l, r: F.extract_features_batch(
                  jnp.stack([pert(l, i), r]), fcfg), left, right)
    feats = F.extract_features_batch(jnp.stack([left, right]), fcfg)
    fl = jax.tree_util.tree_map(lambda x: x[0], feats)
    fr = jax.tree_util.tree_map(lambda x: x[1], feats)
    amortized("match_epipolar",
              lambda i, a, b: match_epipolar(
                  a.uv + (i & 1), a.desc, a.valid,
                  b.uv, b.desc, b.valid, acfg.matcher).idx, fl, fr)
    m = match_epipolar(fl.uv, fl.desc, fl.valid, fr.uv, fr.desc, fr.valid,
                       acfg.matcher)
    uvr = fr.uv[jnp.maximum(m.idx, 0)]
    amortized("refine_disparity (subpixel)",
              lambda i, l, r, ul, ur: refine_disparity(
                  pert(l, i), r, ul, ur), left, right, fl.uv, uvr)
    amortized("adapt_stereo (full)",
              lambda i, l, r: adapt_stereo(pert(l, i), r, acfg).points,
              left, right)

    # ---- tracker ----
    meas = adapt_stereo(left, right, acfg)
    state = initial_state(4096)
    state, _, _ = track_step(state, meas.points, meas.desc, meas.valid,
                             cam, tcfg, "stereo")
    _settle(state.T_lm_robot)

    def track(i, st, p, d, v):
        st2, stats, _ = track_step(st, p, d, v, cam, tcfg, "stereo")
        return stats.num_inliers

    amortized("track_step", track, state, meas.points, meas.desc,
              meas.valid)

    # ---- split-time stages ----
    from srrg2_proslam_tpu.models import loop_closure as lc
    db = lc.empty_database(16384)
    arena = state.arena
    db = lc.add_local_map(db, arena.desc, arena.pos, arena.valid, 0)
    lcfg = lc.LoopDetectorConfig(minimum_age_difference=0)
    amortized("select_db_rows (budget 512)",
              lambda i, a: lc.select_db_rows(
                  a.desc, a.pos, a.valid, a.num_updates + i, budget=512)[4],
              arena, reps=32)
    amortized("add_local_map",
              lambda i, d, a: lc.add_local_map(
                  d, a.desc, a.pos, a.valid, i).next, db, arena, reps=32)
    amortized("detect_and_validate (Q=4096, D=16k)",
              lambda i, a, d: lc.detect_and_validate(
                  a.desc, a.valid, a.pos, 40 + (i & 1), d,
                  jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                   (512, 4, 4)),
                  lcfg, 512)[2], arena, db, reps=16)


if __name__ == "__main__":
    main()
