"""Rigid-body geometry in pure JAX: axis-angle rotations and Kabsch alignment.

Replaces /root/reference/src/utils/geometry.py (torch + pytorch3d snippets).
The Kabsch solver uses Horn's quaternion method (eigen-decomposition of a 4x4
symmetric matrix) instead of the reference's 3x3 SVD: it always returns a
proper rotation, never hits the torch 'SVD failed to converge' retry path
(reference inference.py:199-221), batches trivially under vmap, and is
differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Pose geometry is numerically sensitive (3x3 rotations composed over 20
# denoise steps); force full-precision contractions so TPU MXU bf16 passes
# are never used for these tiny matmuls.
_HI = jax.lax.Precision.HIGHEST


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vectors (..., 3) -> rotation matrices (..., 3, 3).

    Quaternion route with the small-angle series used by pytorch3d
    (reference geometry.py:38-85) so gradients are stable at zero rotation.
    """
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = 0.5 * angles
    small = angles < 1e-6
    sin_half_over_angle = jnp.where(
        small, 0.5 - angles * angles / 48.0, jnp.sin(half) / jnp.maximum(angles, 1e-30)
    )
    quat = jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)
    return quaternion_to_matrix(quat)


def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternions (..., 4) real-first -> rotation matrices (..., 3, 3)."""
    r, i, j, k = jnp.moveaxis(quat, -1, 0)
    two_s = 2.0 / jnp.sum(quat * quat, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(quat.shape[:-1] + (3, 3))


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> unit quaternions (..., 4) real-first.

    Shepperd's max-component extraction: all four candidate quaternions are
    formed and the best-conditioned one selected per element, so the result is
    uniformly accurate including near theta = pi (where trace-based formulas
    degrade).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    qw = jnp.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    scores = jnp.stack(
        [1 + m00 + m11 + m22, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22, 1 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    # canonical hemisphere: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def matrix_to_axis_angle(R: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3), |angle| <= pi."""
    q = matrix_to_quaternion(R)
    xyz = q[..., 1:]
    n = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(n[..., 0], q[..., 0])
    return xyz / jnp.maximum(n, eps) * angle[..., None]


def kabsch(
    A: jnp.ndarray, B: jnp.ndarray, mask: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Optimal rigid transform (R, t) with  B ~= A @ R.T + t.

    Args:
      A, B: (..., N, 3) point clouds (note: row-vector convention, unlike the
        reference's 3xN).
      mask: optional (..., N) boolean validity mask (padded graphs).
    Returns:
      R: (..., 3, 3) proper rotation;  t: (..., 3) translation.
    """
    if mask is None:
        w = jnp.ones(A.shape[:-1], dtype=A.dtype)
    else:
        w = mask.astype(A.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    cA = jnp.sum(A * w[..., None], axis=-2) / wsum
    cB = jnp.sum(B * w[..., None], axis=-2) / wsum
    Am = (A - cA[..., None, :]) * w[..., None]
    Bm = B - cB[..., None, :]
    H = jnp.einsum("...ni,...nj->...ij", Am, Bm, precision=_HI)  # 3x3 covariance

    # Horn's quaternion method: max eigenvector of the 4x4 key matrix.
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    K = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], axis=-1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], axis=-1),
            jnp.stack([Szx - Sxz, Sxy + Syx, Syy - Sxx - Szz, Syz + Szy], axis=-1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, Szz - Sxx - Syy], axis=-1),
        ],
        axis=-2,
    )
    _, vecs = jnp.linalg.eigh(K)
    quat = vecs[..., -1]  # eigenvector of the largest eigenvalue
    R = quaternion_to_matrix(quat)
    t = cB - jnp.einsum("...ij,...j->...i", R, cA, precision=_HI)
    return R, t


def rigid_align(A: jnp.ndarray, B: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Align A onto B: returns A @ R.T + t."""
    R, t = kabsch(A, B, mask)
    return jnp.einsum("...ni,...ji->...nj", A, R, precision=_HI) + t[..., None, :]


def angle_between(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Numerically-stable angle between vectors along the last axis.

    Same atan2 formulation as the reference (score_model_phore.py:1018-1035).
    """
    a_norm = jnp.linalg.norm(a, axis=-1, keepdims=True)
    b_norm = jnp.linalg.norm(b, axis=-1, keepdims=True)
    num = jnp.linalg.norm(a * b_norm - a_norm * b, axis=-1)
    den = jnp.linalg.norm(a * b_norm + a_norm * b, axis=-1)
    return 2.0 * jnp.arctan2(num, jnp.maximum(den, eps))
