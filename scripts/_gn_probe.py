"""Decompose the GN iteration cost: system eval vs 6x6 solve vs se3.exp.

Amortized inside one executable (chained scan, data-dependent carry).
Probe script — informs which piece of the tracker's serial GN chain to
attack next.
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

from srrg2_proslam_tpu.ops import gn, se3
from srrg2_proslam_tpu.ops.pinhole import Camera

REPS = 4096
C = 1024

cam = Camera(fx=450.0, fy=450.0, cx=320.0, cy=240.0, rows=480, cols=640,
             baseline_px=45.0)
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.uniform(-5, 5, (C, 3)).astype(np.float32) +
                  np.array([0, 0, 8], np.float32))
X_gt = se3.exp(jnp.asarray(np.array([0.1, 0, 0.2, 0.01, 0.02, 0],
                                    np.float32)))
p = se3.transform_points(X_gt, pts)
meas = jnp.stack([cam.fx * p[:, 0] / p[:, 2] + cam.cx,
                  cam.fy * p[:, 1] / p[:, 2] + cam.cy,
                  cam.fx * p[:, 0] / p[:, 2] + cam.cx
                  - cam.baseline_px / p[:, 2]], -1)
w = jnp.ones((C,))
m = jnp.ones((C,), bool)


def timed(fn, *args):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return (time.perf_counter() - t0) / REPS * 1e6  # us per rep


def chain(step):
    @jax.jit
    def run(X0):
        def body(X, i):
            return step(X + 0.0 * i.astype(jnp.float32)), None
        X, _ = jax.lax.scan(body, X0, jnp.arange(REPS, dtype=jnp.int32))
        return X
    return run


def system_only(X):
    H, b, stats = gn.stereo_projective_system(X, pts, meas, w, m, cam)
    # fold into the carry without a solve
    return X + 1e-9 * (H[0, 0] + b[0])


def solve_only(X):
    H = jnp.eye(6) * (2.0 + X[0, 0])
    b = jnp.ones((6,)) * X[0, 1]
    dx = -jnp.linalg.solve(H + 1e-6 * jnp.eye(6), b)
    return X.at[0, 0].add(1e-9 * dx[0])


def exp_only(X):
    dx = 1e-9 * X[0, :3].sum() * jnp.ones((6,))
    return se3.exp(dx) @ X


def full_step(X):
    H, b, _ = gn.stereo_projective_system(X, pts, meas, w, m, cam)
    return gn.gn_step(X, H, b)


def main():
    for name, step in [("system only", system_only),
                       ("solve only", solve_only),
                       ("exp only", exp_only),
                       ("full GN step", full_step)]:
        t = timed(chain(step), se3.identity())
        print(f"{name:14s} {t:7.2f} us/iteration", flush=True)


if __name__ == "__main__" and not os.environ.get("GN_PALLAS"):
    main()


def pallas_check():
    """Compiled-kernel check + timing on the live backend."""
    from srrg2_proslam_tpu.ops.gn_pallas import gn_burst_stereo

    X_ref, s_ref = gn.gn_iterate(
        lambda X: gn.stereo_projective_system(X, pts, meas, w, m, cam),
        se3.identity(), 5, epsilon=0.0, unroll=True)
    X_k, s_k = gn_burst_stereo(se3.identity(), pts, meas, w, m, cam,
                               iterations=5)
    err = float(jnp.max(jnp.abs(X_k - X_ref)))
    print(f"pallas vs xla max|dX| = {err:.2e}  inliers {int(s_k.num_inliers)}"
          f" vs {int(s_ref.num_inliers)}", flush=True)

    @jax.jit
    def burst_chain(X0):
        def body(X, i):
            Xn, _ = gn_burst_stereo(X + 0.0 * i.astype(jnp.float32),
                                    pts, meas, w, m, cam, iterations=5)
            return Xn, None
        X, _ = jax.lax.scan(body, X0, jnp.arange(REPS // 5,
                                                 dtype=jnp.int32))
        return X

    t = timed_n(burst_chain, REPS // 5, se3.identity())
    print(f"pallas burst(5 iters)  {t:7.2f} us/burst "
          f"({t / 5:.2f} us/iteration)", flush=True)

    @jax.jit
    def burst_chain20(X0):
        def body(X, i):
            Xn, _ = gn_burst_stereo(X + 0.0 * i.astype(jnp.float32),
                                    pts, meas, w, m, cam, iterations=20)
            return Xn, None
        X, _ = jax.lax.scan(body, X0, jnp.arange(REPS // 20,
                                                 dtype=jnp.int32))
        return X

    t20 = timed_n(burst_chain20, REPS // 20, se3.identity())
    print(f"pallas burst(20 iters) {t20:7.2f} us/burst "
          f"({t20 / 20:.2f} us/iteration; launch tax ~= "
          f"{(4 * t - t20) / 3:.1f} us)", flush=True)


def timed_n(fn, n, *args):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return (time.perf_counter() - t0) / n * 1e6


if __name__ == "__main__" and os.environ.get("GN_PALLAS"):
    pallas_check()
