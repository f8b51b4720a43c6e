"""SE(3) operations on 4x4 float32 matrices (batched, jit-friendly).

Capability parity with the srrg2_core geometry helpers the reference pipeline
uses (``geometry3d::t2tnq``/``tnq2t`` and isometry algebra, see usage at
reference srrg2_proslam/tests/test_aligners.cpp:132-139) — implemented from
the standard closed-form exp/log maps, not translated from the reference.

Conventions:
  * A transform ``T`` maps points from its "source" frame to its "dest"
    frame: ``p_dest = T @ [p_src, 1]``.
  * ``exp`` uses the left-multiplied twist ``[v, w]`` (translation first),
    matching the Gauss-Newton update ``T <- exp(dx) @ T`` used in ops/gn.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def identity() -> jnp.ndarray:
    return jnp.eye(4, dtype=jnp.float32)


def from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build a 4x4 transform from a 3x3 rotation and a 3-translation."""
    T = jnp.zeros(R.shape[:-2] + (4, 4), dtype=jnp.float32)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply ``T`` to points of shape [..., N, 3] (or [N, 3])."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of [..., 3] vectors."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def _exp_coefficients(theta2: jnp.ndarray):
    """Stable f32 coefficients A = sin(t)/t, B = (1-cos t)/t^2, C = (t-sin t)/t^3.

    The naive (1-cos t) form cancels catastrophically in float32 for
    t in [1e-4, 1e-2] (1-cos t falls below f32 ulp of 1.0), which is the
    typical inter-frame rotation regime of VO — B is therefore computed via
    the half-angle identity 1-cos t = 2 sin^2(t/2) (stable for all t), and
    A/C switch to Taylor series below t < 0.1 where their numerators cancel.
    """
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-2  # theta < 0.1 rad
    A = jnp.where(small, 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0,
                  jnp.sin(theta) / theta)
    half_sin = jnp.sin(0.5 * theta)
    # B uses the SAME cutover as A/C: with a lower one (1e-12) the _EPS
    # padding in the denominator dominates for theta in [1e-6, 3e-4] and
    # shrinks B by orders of magnitude; the Taylor series is exact to 1e-9
    # over the whole small branch
    B = jnp.where(small, 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0,
                  2.0 * half_sin * half_sin / (theta2 + _EPS))
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta + _EPS))
    return A, B, C


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, numerically safe near zero (f32-safe, see above)."""
    theta2 = jnp.sum(w * w, axis=-1)
    W = skew(w)
    A, B, _ = _exp_coefficients(theta2)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * (W @ W)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of exp_so3; returns the rotation vector.

    Uses theta = atan2(|antisym|/2, (trace-1)/2): numerically robust near
    zero where arccos loses ~sqrt(eps) absolute accuracy in float32.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # axis*2sin(theta) from the antisymmetric part
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = 0.5 * jnp.sqrt(jnp.sum(v * v, axis=-1) + _EPS)
    cos_t = (trace - 1.0) * 0.5
    theta = jnp.arctan2(sin_t, cos_t)
    small = theta < 1e-4
    # theta/(2 sin theta), Taylor: 1/2 + theta^2/12
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_t + _EPS))
    # Note: near theta = pi this form degrades; SLAM inter-frame rotations are
    # far from pi, and PGO increments are small, so this regime is acceptable.
    return scale[..., None] * v


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se3 exp of twist [..., 6] = [v(3), w(3)] -> 4x4 transform.

    Uses the exact left-Jacobian for the translation part.
    """
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    W = skew(w)
    _, B, C = _exp_coefficients(theta2)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = exp_so3(w)
    V = I + B[..., None, None] * W + C[..., None, None] * (W @ W)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return from_rt(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """se3 log -> twist [..., 6] = [v, w]."""
    w = log_so3(T[..., :3, :3])
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = skew(w)
    # V^{-1} = I - W/2 + coef W^2 with coef = (1 - (t/2) cot(t/2)) / t^2.
    # The numerator cancels (~t^2/12) for small t, so switch to its Taylor
    # series below t < 0.1 — the f32-stable analog of _exp_coefficients.
    small = theta2 < 1e-2
    half = 0.5 * theta
    cot_half = jnp.cos(half) / (jnp.sin(half) + _EPS)
    coef = jnp.where(
        small, 1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0,
        (1.0 - half * cot_half) / (theta2 + _EPS),
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = I - 0.5 * W + coef[..., None, None] * (W @ W)
    v = jnp.einsum("...ij,...j->...i", Vinv, T[..., :3, 3])
    return jnp.concatenate([v, w], axis=-1)


def error_t_and_angle(A: jnp.ndarray, B: jnp.ndarray):
    """Per-axis translation error and rotation angle between two transforms.

    Mirrors the manifold-error assertions of the reference tests
    (tests/test_aligners.cpp:132-139): error transform E = A^-1 B, returns
    (|t_E| per axis, rotation angle of E in radians).
    """
    E = inverse(A) @ B
    t_err = jnp.abs(E[..., :3, 3])
    w = log_so3(E[..., :3, :3])
    return t_err, jnp.sqrt(jnp.sum(w * w, axis=-1))


def normalize(T: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize the rotation block (SVD projection onto SO(3))."""
    R = T[..., :3, :3]
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    d = jnp.ones(T.shape[:-2] + (3,), dtype=T.dtype).at[..., 2].set(det)
    Rn = (u * d[..., None, :]) @ vt
    return from_rt(Rn, T[..., :3, 3])
