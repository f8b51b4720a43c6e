import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp, numpy as np
from srrg2_proslam_tpu.ops import pgo, se3

for N, E in ((512, 1024), (128, 512), (64, 256)):
    g = pgo.empty_graph(N, E)
    # build a 24-pose chain with one closure
    poses = [np.eye(4, dtype=np.float32)]
    Z = np.eye(4, dtype=np.float32); Z[0, 3] = 1.0
    for i in range(23):
        g = pgo.add_pose(g, i + 1, jnp.asarray(poses[-1] @ Z))
        poses.append(poses[-1] @ Z)
        g = pgo.add_edge(g, i, i, i + 1, jnp.asarray(Z))
    cl = np.eye(4, dtype=np.float32); cl[0, 3] = 22.7
    g = pgo.add_edge(g, 23, 0, 23, jnp.asarray(cl))
    cfg = pgo.PGOConfig()

    @jax.jit
    def reps(g):
        def body(c, _):
            gg, _ = pgo.optimize._fun(g._replace(poses=g.poses + 0*c[..., None, None, None].sum()), cfg) if False else (None, None)
            return c, None
        return g
    # simpler: loop optimize 20x threading poses
    @jax.jit
    def run20(g):
        def body(gg, _):
            g2, chi = pgo.optimize(gg, cfg)
            return g2, chi
        return jax.lax.scan(body, g, None, length=20)
    out, chis = run20(g)
    np.asarray(out.poses)
    t0 = time.perf_counter()
    out, chis = run20(g)
    np.asarray(out.poses)
    dt = time.perf_counter() - t0
    print(f"N={N} E={E}: optimize() = {dt/20*1000:.2f} ms  chi_final={float(chis[-1]):.4f}")
