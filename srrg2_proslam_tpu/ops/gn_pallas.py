"""Fused Gauss-Newton burst as ONE Pallas TPU kernel.

The tracker's alignment is a serial chain of tiny dependent steps: per
iteration a residual/Jacobian sweep over ~1k correspondences, a (H, b)
reduction, a damped 6x6 solve and an SE3 exp-compose (reference solver
loop: srrg2_solver iterations driven by MultiAligner3DQR, SURVEY.md §3.3).
As XLA ops this chain costs ~46 us PER ITERATION on v5e (measured round 5,
scripts/_gn_probe.py: system 31 + solve 13 + exp 15) — pure per-op
dispatch latency, since the arithmetic is a few hundred FLOPs per point.
At the reference cadence (3 rounds x 5 bursts) that is ~0.7 of the
tracker's 1.25 ms/frame.

This kernel runs the WHOLE burst inside one Mosaic program:

  * correspondences live in VMEM as 8 feature planes [8, R, 128]
    (x, y, z, zu_l, zv, zu_r, weight, mask) — each plane one vreg row per
    128 points, so the per-iteration sweep is ~100 VPU instructions;
  * the 21 unique (H)+6 (b) reductions are masked FMA + full reduces;
  * the damped 6x6 solve is an ANALYTIC two-level Schur complement
    (3x3 cofactor inverses — no pivoting: H + damping*I is SPD);
  * SE3 exp/compose run on the scalar core (the f32-stable coefficient
    forms of ops/se3.py verbatim);
  * termination carries the sticky stop flag of gn_iterate(unroll=True):
    once the applied twist drops below epsilon no further update applies
    (bit-semantics of ops/gn.py::gn_iterate, modulo float reduction
    order — equivalence pinned by tests/test_gn_pallas.py).

Only the rectified-stereo factor (the production tracker's hot slice) is
fused; other factors and the vmapped loop-closure validation keep the XLA
path (ops/gn.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gn import GNStats
from .pinhole import Camera

_LANE = 128


def _inv3(m, eps=0.0):
    """Analytic symmetric 3x3 inverse from scalar entries.

    m = ((a00, a01, a02), (a01, a11, a12), (a02, a12, a22)).
    Returns (rows of the inverse, det).
    """
    (a00, a01, a02), (_, a11, a12), (_, _, a22) = m
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / (det + eps)
    i00 = c00 * inv_det
    i01 = c01 * inv_det
    i02 = c02 * inv_det
    i11 = (a00 * a22 - a02 * a02) * inv_det
    i12 = (a02 * a01 - a00 * a12) * inv_det
    i22 = (a00 * a11 - a01 * a01) * inv_det
    return ((i00, i01, i02), (i01, i11, i12), (i02, i12, i22)), det


def _mat3_vec(m, v):
    return tuple(m[i][0] * v[0] + m[i][1] * v[1] + m[i][2] * v[2]
                 for i in range(3))


def _solve6_schur(H, b, damping):
    """dx = -(H + damping I)^-1 b via block Schur, all scalars.

    H: tuple-of-tuples 6x6 (symmetric), b: tuple 6.
    """
    Hd = [[H[i][j] + (damping if i == j else 0.0) for j in range(6)]
          for i in range(6)]
    A = tuple(tuple(Hd[i][j] for j in range(3)) for i in range(3))
    B = tuple(tuple(Hd[i][3 + j] for j in range(3)) for i in range(3))
    C = tuple(tuple(Hd[3 + i][3 + j] for j in range(3)) for i in range(3))
    b1 = tuple(b[i] for i in range(3))
    b2 = tuple(b[3 + i] for i in range(3))
    Ainv, _ = _inv3(A)
    u = _mat3_vec(Ainv, b1)                       # A^-1 b1
    # V = A^-1 B (columns)
    Vcol = [_mat3_vec(Ainv, tuple(B[i][j] for i in range(3)))
            for j in range(3)]
    # S = C - B^T V  (S[i][j] = C[i][j] - sum_k B[k][i] Vcol[j][k])
    S = tuple(tuple(
        C[i][j] - sum(B[k][i] * Vcol[j][k] for k in range(3))
        for j in range(3)) for i in range(3))
    Sinv, _ = _inv3(S)
    rhs2 = tuple(b2[i] - sum(B[k][i] * u[k] for k in range(3))
                 for i in range(3))
    y2 = _mat3_vec(Sinv, rhs2)
    y1 = tuple(u[i] - sum(Vcol[j][i] * y2[j] for j in range(3))
               for i in range(3))
    return tuple(-y for y in (y1 + y2))


def _exp_coeffs(theta2):
    """f32-stable A, B, C of se3 exp (ops/se3.py::_exp_coefficients)."""
    eps = 1e-8
    theta = jnp.sqrt(theta2 + eps)
    small = theta2 < 1e-2
    A = jnp.where(small, 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0,
                  jnp.sin(theta) / theta)
    half_sin = jnp.sin(0.5 * theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0,
                  2.0 * half_sin * half_sin / (theta2 + eps))
    C = jnp.where(small,
                  1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta + eps))
    return A, B, C


def _exp_compose(dx, Xr, Xt):
    """(exp(dx) @ X) on scalars: Xr rows 3x3, Xt tuple 3."""
    v = dx[:3]
    w = dx[3:]
    theta2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    A, B, C = _exp_coeffs(theta2)
    W = ((0.0, -w[2], w[1]), (w[2], 0.0, -w[0]), (-w[1], w[0], 0.0))
    W2 = tuple(tuple(sum(W[i][k] * W[k][j] for k in range(3))
                     for j in range(3)) for i in range(3))
    I = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
    Rd = tuple(tuple(I[i][j] + A * W[i][j] + B * W2[i][j]
                     for j in range(3)) for i in range(3))
    Vm = tuple(tuple(I[i][j] + B * W[i][j] + C * W2[i][j]
                     for j in range(3)) for i in range(3))
    td = _mat3_vec(Vm, v)
    Rn = tuple(tuple(sum(Rd[i][k] * Xr[k][j] for k in range(3))
                     for j in range(3)) for i in range(3))
    tn = tuple(sum(Rd[i][k] * Xt[k] for k in range(3)) + td[i]
               for i in range(3))
    return Rn, tn


def _make_kernel(cam: Camera, iterations: int, damping: float,
                 min_inliers: int, epsilon: float, chi_threshold: float):
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)
    bpx = float(cam.baseline_px)
    range_min = float(cam.range_min)

    def kernel(planes_ref, x_ref, out_ref):
        x = planes_ref[0]
        y = planes_ref[1]
        z = planes_ref[2]
        m0 = planes_ref[3]
        m1 = planes_ref[4]
        m2 = planes_ref[5]
        w_in = planes_ref[6]
        mask = planes_ref[7]

        def iteration(carry):
            Xr, Xt, dx_norm, stats = carry
            live = dx_norm > epsilon
            px = Xr[0][0] * x + Xr[0][1] * y + Xr[0][2] * z + Xt[0]
            py = Xr[1][0] * x + Xr[1][1] * y + Xr[1][2] * z + Xt[1]
            pz = Xr[2][0] * x + Xr[2][1] * y + Xr[2][2] * z + Xt[2]
            z_safe = jnp.maximum(pz, 1e-3)
            iz = 1.0 / z_safe
            iz2 = iz * iz
            u_l = fx * px * iz + cx
            v_l = fy * py * iz + cy
            u_r = u_l - bpx * iz
            r0 = u_l - m0
            r1 = v_l - m1
            r2 = u_r - m2
            # Jp rows (projection jacobian wrt camera-frame point)
            a0 = fx * iz
            c0 = -fx * px * iz2
            b1c = fy * iz
            c1 = -fy * py * iz2
            c2 = (-fx * px + bpx) * iz2
            # J[d] = [Jp[d,0], Jp[d,1], Jp[d,2] | rotation part], with
            # J[d, 3+k] = -(Jp[d] @ skew(p))[k]
            def rot_cols(j0, j1, j2):
                g3 = -(j1 * pz - j2 * py)
                g4 = -(j2 * px - j0 * pz)
                g5 = -(j0 * py - j1 * px)
                return g3, g4, g5

            zero = jnp.zeros_like(px)
            J0 = (a0, zero, c0) + rot_cols(a0, zero, c0)
            J1 = (zero, b1c, c1) + rot_cols(zero, b1c, c1)
            J2 = (a0, zero, c2) + rot_cols(a0, zero, c2)

            mz = jnp.logical_and(mask > 0.5, pz > range_min)
            chi = (r0 * r0 + r1 * r1 + r2 * r2) * w_in
            kw = jnp.minimum(1.0, chi_threshold / jnp.maximum(chi, 1e-12))
            wgt = jnp.where(mz, w_in * kw, 0.0)

            H = [[None] * 6 for _ in range(6)]
            for i in range(6):
                for j in range(i, 6):
                    acc = (J0[i] * J0[j] + J1[i] * J1[j]
                           + J2[i] * J2[j]) * wgt
                    H[i][j] = jnp.sum(acc)
                    H[j][i] = H[i][j]
            b = tuple(
                jnp.sum((J0[i] * r0 + J1[i] * r1 + J2[i] * r2) * wgt)
                for i in range(6))

            inlier = jnp.logical_and(mz, chi <= chi_threshold)
            chi_tot = jnp.sum(jnp.where(mz, jnp.minimum(chi, chi_threshold),
                                        0.0))
            n_inl = jnp.sum(jnp.where(inlier, 1.0, 0.0))
            n_terms = jnp.sum(jnp.where(mz, 1.0, 0.0))

            dx = _solve6_schur(tuple(tuple(r) for r in H), b, damping)
            # degenerate-solve guard (gn_step_dx): |d| < 1e30 is False for
            # both inf and NaN, avoiding isfinite on the scalar core
            finite = jnp.bool_(True)
            for k in range(6):
                finite = jnp.logical_and(finite, jnp.abs(dx[k]) < 1e30)
            dx = tuple(jnp.where(finite, d, 0.0) for d in dx)
            Rn, tn = _exp_compose(dx, Xr, Xt)
            ok = n_terms >= float(min_inliers)
            apply = jnp.logical_and(live, ok)
            Xr2 = tuple(tuple(jnp.where(apply, Rn[i][j], Xr[i][j])
                              for j in range(3)) for i in range(3))
            Xt2 = tuple(jnp.where(apply, tn[i], Xt[i]) for i in range(3))
            step = jnp.sqrt(sum(d * d for d in dx))
            dx_norm2 = jnp.where(live, jnp.where(ok, step, 0.0), dx_norm)
            stats2 = tuple(jnp.where(live, s_new, s_old) for s_new, s_old
                           in zip((chi_tot, n_inl, n_terms), stats))
            return Xr2, Xt2, dx_norm2, stats2

        Xr = tuple(tuple(x_ref[0, 4 * i + j] for j in range(3))
                   for i in range(3))
        Xt = tuple(x_ref[0, 4 * i + 3] for i in range(3))
        carry = (Xr, Xt, jnp.float32(jnp.inf),
                 (jnp.float32(0), jnp.float32(0), jnp.float32(0)))
        for _ in range(iterations):
            carry = iteration(carry)
        Xr, Xt, _, stats = carry
        for i in range(3):
            for j in range(3):
                out_ref[0, 4 * i + j] = Xr[i][j]
            out_ref[0, 4 * i + 3] = Xt[i]
        out_ref[0, 12] = stats[0]
        out_ref[0, 13] = stats[1]
        out_ref[0, 14] = stats[2]

    return kernel


@partial(jax.jit, static_argnames=(
    "cam", "iterations", "damping", "min_inliers", "epsilon",
    "chi_threshold", "interpret"))
def gn_burst_stereo(
    X0: jnp.ndarray,          # [4, 4] moving-in-fixed initial estimate
    pts_moving: jnp.ndarray,  # [C, 3] map points (moving frame)
    meas_uvu: jnp.ndarray,    # [C, 3] measured (uL, vL, uR)
    weights: jnp.ndarray,     # [C] information scaling
    mask: jnp.ndarray,        # [C] bool
    cam: Camera,
    iterations: int,
    damping: float = 1e-6,
    min_inliers: int = 6,
    epsilon: float = 0.0,
    chi_threshold: float = 25.0,
    interpret: bool = False,
):
    """Fused burst: gn_iterate(stereo_projective_system, unroll=True) in
    one kernel.  Returns (X, GNStats) like ops/gn.py::gn_iterate."""
    C = pts_moving.shape[0]
    R = -(-C // _LANE)
    Cp = R * _LANE
    pad = Cp - C

    def col(v):
        return jnp.pad(v.astype(jnp.float32), (0, pad))

    planes = jnp.stack([
        col(pts_moving[:, 0]), col(pts_moving[:, 1]), col(pts_moving[:, 2]),
        col(meas_uvu[:, 0]), col(meas_uvu[:, 1]), col(meas_uvu[:, 2]),
        col(weights), col(mask.astype(jnp.float32)),
    ]).reshape(8, R, _LANE)
    x_flat = X0[:3, :].reshape(1, 12).astype(jnp.float32)

    kernel = _make_kernel(cam, iterations, float(damping), int(min_inliers),
                          float(epsilon), float(chi_threshold))
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 16), jnp.float32),
        interpret=interpret,
    )(planes, x_flat)
    X = jnp.concatenate([
        out[0, :12].reshape(3, 4),
        jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32),
    ], 0)
    stats = GNStats(
        chi_total=out[0, 12],
        num_inliers=out[0, 13].astype(jnp.int32),
        num_terms=out[0, 14].astype(jnp.int32),
    )
    return X, stats
