"""Pose-graph optimization tests: convergence + sharded equivalence.

Mirrors the reference's PGO usage (global Solver over local-map SE3
variables with closure factors, srrg2_proslam configurations/kitti.conf:
420-444, tests/test_loop_closing.cpp:9-17) on synthetic graphs.
"""
import numpy as np
import jax
import jax.numpy as jnp

from srrg2_proslam_tpu.ops import pgo, se3


def _ring_graph(n=8, edge_capacity=16, noise=0.0, rng=None):
    """Ground-truth ring of poses + odometry edges (+ one loop edge)."""
    gt = [np.eye(4, dtype=np.float32)]
    step = np.asarray(se3.exp(jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 2 * np.pi / n])))
    for _ in range(n - 1):
        gt.append((gt[-1] @ step).astype(np.float32))
    graph = pgo.empty_graph(n, edge_capacity)
    slot = 0
    for i in range(n - 1):
        Z = np.linalg.inv(gt[i]) @ gt[i + 1]
        if noise and rng is not None:
            xi = rng.normal(0, noise, 6).astype(np.float32)
            Z = np.asarray(se3.exp(jnp.asarray(xi))) @ Z
        graph = pgo.add_edge(graph, slot, i, i + 1, jnp.asarray(Z))
        slot += 1
    # loop edge closing the ring
    Z = np.linalg.inv(gt[n - 1]) @ gt[0] if False else np.linalg.inv(gt[0]) @ gt[n - 1]
    graph = pgo.add_edge(graph, slot, 0, n - 1, jnp.asarray(Z), weight=1.0)
    slot += 1
    # initialize poses: identity-perturbed guesses (except anchor)
    graph = pgo.add_pose(graph, 0, jnp.asarray(gt[0]))
    for i in range(1, n):
        guess = gt[i].copy()
        if rng is not None:
            xi = rng.normal(0, 0.05, 6).astype(np.float32)
            guess = np.asarray(se3.exp(jnp.asarray(xi))) @ guess
        graph = pgo.add_pose(graph, i, jnp.asarray(guess))
    return graph, gt


def test_pgo_zero_noise_stays_at_gt():
    graph, gt = _ring_graph(n=6)
    out, chi = pgo.optimize(graph, pgo.PGOConfig(iterations=5))
    for i in range(6):
        t_err, ang = se3.error_t_and_angle(out.poses[i], jnp.asarray(gt[i]))
        assert float(jnp.max(t_err)) < 1e-3
        assert float(ang) < 1e-3
    assert float(chi) < 1e-4


def test_pgo_corrects_perturbed_guesses():
    rng = np.random.RandomState(1)
    graph, gt = _ring_graph(n=8, rng=rng)
    # perturbed initial guesses, exact measurements -> recover GT
    out, _ = pgo.optimize(graph, pgo.PGOConfig(iterations=10))
    for i in range(8):
        t_err, ang = se3.error_t_and_angle(out.poses[i], jnp.asarray(gt[i]))
        assert float(jnp.max(t_err)) < 5e-3, (i, np.asarray(t_err))
        assert float(ang) < 5e-3


def test_pgo_sharded_matches_single_device():
    from srrg2_proslam_tpu import parallel

    rng = np.random.RandomState(2)
    graph, gt = _ring_graph(n=8, edge_capacity=16, rng=rng)
    cfg = pgo.PGOConfig(iterations=5)
    out_single, chi_single = pgo.optimize(graph, cfg)
    mesh = parallel.make_mesh(jax.devices()[:8])
    out_spmd, chi_spmd = parallel.pgo_optimize_spmd(mesh, graph, cfg)
    np.testing.assert_allclose(
        np.asarray(out_single.poses), np.asarray(out_spmd.poses),
        rtol=1e-4, atol=1e-4,
    )


def test_adjoint_consistency():
    # Ad(T) xi must equal log(T exp(xi) T^-1) for small xi
    rng = np.random.RandomState(3)
    T = se3.exp(jnp.asarray(rng.normal(0, 0.5, 6), jnp.float32))
    xi = jnp.asarray(rng.normal(0, 1e-3, 6), jnp.float32)
    lhs = pgo.adjoint(T) @ xi
    rhs = se3.log(T @ se3.exp(xi) @ se3.inverse(T))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_pgo_cg_matches_dense():
    rng = np.random.RandomState(5)
    graph, gt = _ring_graph(n=8, edge_capacity=16, rng=rng)
    dense, chi_d = pgo.optimize(graph, pgo.PGOConfig(iterations=8))
    cg, chi_c = pgo.optimize(
        graph, pgo.PGOConfig(iterations=8, solver="cg", cg_iterations=200)
    )
    np.testing.assert_allclose(np.asarray(dense.poses), np.asarray(cg.poses),
                               rtol=1e-3, atol=1e-3)


def test_pgo_cg_scales_to_large_graph():
    # 256 poses in a noisy ring — the regime where the matrix-free solver
    # is the right path at pod scale (the raw dense Newton step here is
    # hundreds of meters and needs the trust region to converge at all)
    rng = np.random.RandomState(6)
    n = 256
    graph, gt = _ring_graph(n=n, edge_capacity=2 * n, rng=rng)
    out, chi = pgo.optimize(
        graph,
        pgo.PGOConfig(iterations=40, solver="cg", cg_iterations=300),
    )
    assert float(chi) < 1e-3
    errs = []
    for i in range(0, n, 16):
        t_err, ang = se3.error_t_and_angle(out.poses[i], jnp.asarray(gt[i]))
        errs.append(float(jnp.max(t_err)))
    # 0.12 m absolute over a ~40 m-radius ring (0.3%)
    assert max(errs) < 0.2, max(errs)


def test_edge_residuals_flag_inconsistent_closure():
    """Backstop statistics (ops/pgo.edge_t_residuals / mean_edge_residual):
    after optimizing a chain with a TRUE closure, every factor's
    translational residual is small; a closure wrong by meters keeps a
    large self-residual at the optimized poses (the robustified solver
    refuses to satisfy it against the anchored chain)."""
    import numpy as np
    import jax.numpy as jnp
    from srrg2_proslam_tpu.ops import pgo, se3

    N = 6
    g = pgo.empty_graph(8, 16)
    T = jnp.eye(4)
    step = se3.exp(jnp.asarray([0.0, 0, -1.0, 0, 0, 0], jnp.float32))
    for i in range(N):
        g = pgo.add_pose(g, i, T)
        T = T @ step
    for i in range(N - 1):
        g = pgo.add_edge(g, i, i, i + 1, step)
    # true closure 0 -> 5 (the chain is exact, measurement = chained step)
    Z_true = jnp.linalg.matrix_power(np.asarray(step), 5)
    g_true = pgo.add_edge(g, N - 1, 0, N - 1, jnp.asarray(Z_true))
    g_opt, _ = pgo.optimize(g_true, pgo.PGOConfig())
    r = np.asarray(pgo.edge_t_residuals(g_opt))
    assert r[N - 1] < 0.05, r
    held = jnp.arange(16) < N - 1
    assert float(pgo.mean_edge_residual(g_opt, held)) < 0.05

    # false closure: claims pose 5 is 8 m off to the side.  NOTE the
    # dilution bound: the optimizer spreads a wrong closure's error over
    # the loop's edges (~err/(n_edges+1) per edge at equilibrium), so the
    # per-edge chi test only catches errors large relative to the loop
    # length — the candidate-AGREEMENT gate is the sharp primary defense
    # (models/loop_closure.py backstop_agreement_tolerance); this test
    # pins the coarse chi branch
    Z_false = jnp.asarray(Z_true) @ se3.exp(
        jnp.asarray([8.0, 0, 0, 0, 0, 0], jnp.float32))
    g_false = pgo.add_edge(g, N - 1, 0, N - 1, Z_false)
    g_opt2, _ = pgo.optimize(g_false, pgo.PGOConfig())
    r2 = np.asarray(pgo.edge_t_residuals(g_opt2))
    # the false edge's own residual stays well above the 0.5 m backstop
    # bound OR the chain is visibly bent — either signal rejects it
    chain2 = float(pgo.mean_edge_residual(g_opt2, held))
    assert r2[N - 1] > 0.5 or chain2 > 0.5, (r2[N - 1], chain2)
