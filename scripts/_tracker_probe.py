"""Amortized device-cost sweep of tracker/adaptor config variants (probe).

Times the bench-shape frame pipeline with hundreds of repetitions inside
ONE executable (link floor amortized away) for a grid of TrackerConfig /
StereoAdaptorConfig variants, to rank the next kernel levers by measured
savings rather than guesses.  Probe script — not part of the package API.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from srrg2_proslam_tpu.io import synthetic as syn
from srrg2_proslam_tpu.models.frontend import (
    StereoAdaptorConfig, adapt_stereo_batch,
)
from srrg2_proslam_tpu.models.tracker import (
    TrackerConfig, initial_state, track_step,
)

B, REPS = 16, 32


def build_inputs():
    cam = syn.synthetic_camera()
    planes = syn.make_room(size_x=22.0, size_z=32.0)
    poses = syn.loop_trajectory()[:B]
    images = [syn.render_stereo(cam, jnp.asarray(T), planes)[:2]
              for T in poses]
    a = jnp.stack([im[0] for im in images])
    b = jnp.stack([im[1] for im in images])
    jax.block_until_ready(b)
    return cam, a, b


def timed(fn, *args):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return (time.perf_counter() - t0) / (REPS * B)


def measure(cam, a, b, acfg, tcfg, arena=2048):
    def track_frames(state, pts, desc, valid):
        def body(st, xs):
            p, d, v = xs
            st2, stats, _ = track_step(st, p, d, v, cam, tcfg, "stereo")
            return st2, stats.num_inliers
        return jax.lax.scan(body, state, (pts, desc, valid))[0]

    @jax.jit
    def populate(state, a, b):
        meas = adapt_stereo_batch(a, b, acfg)
        return track_frames(state, meas.points, meas.desc, meas.valid)

    @jax.jit
    def tracker_rep(state, pts, desc, valid):
        def body(st, _):
            return track_frames(st, pts, desc, valid), None
        st, _ = jax.lax.scan(body, state, None, length=REPS)
        return st.T_lm_robot

    @jax.jit
    def adaptor_rep(a, b):
        def body(c, i):
            ai = a + (i & 1).astype(a.dtype)
            meas = adapt_stereo_batch(ai, b, acfg)
            return c + meas.points[0, 0, 0], None
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(REPS, dtype=jnp.int32))
        return c

    meas0 = jax.jit(lambda a, b: adapt_stereo_batch(a, b, acfg))(a, b)
    state = populate(initial_state(arena), a, b)
    np.asarray(state.T_lm_robot)
    t_tr = timed(tracker_rep, state, meas0.points, meas0.desc, meas0.valid)
    t_ad = timed(adaptor_rep, a, b)
    return t_tr, t_ad


def main():
    cam, a, b = build_inputs()
    base_a = StereoAdaptorConfig()
    variants = [
        ("base r3/i5/eps1e-5", base_a, TrackerConfig(gn_epsilon=1e-5)),
        ("rounds=2", base_a, TrackerConfig(gn_epsilon=1e-5, rounds=2)),
        ("gn_iters=3", base_a, TrackerConfig(gn_epsilon=1e-5,
                                             gn_iterations=3)),
        ("rounds=2,iters=3", base_a,
         TrackerConfig(gn_epsilon=1e-5, rounds=2, gn_iterations=3)),
        ("eps=0 (fixed count)", base_a, TrackerConfig()),
    ]
    for name, acfg, tcfg in variants:
        t_tr, t_ad = measure(cam, a, b, acfg, tcfg)
        print(f"{name:26s} tracker {t_tr*1e3:6.3f} ms/frame   "
              f"adaptor {t_ad*1e3:6.3f} ms/pair", flush=True)


if __name__ == "__main__":
    main()
