"""Torsion-angle updates on device.

The reference applies torsion updates with a per-bond Python/numpy loop of
scipy rotations on the CPU inside the sampling loop
(/root/reference/src/utils/torsion.py:64-109) - one of the two hot CPU
serializers of its sampler.  Here the sequential bond rotations become a
``lax.scan`` over a statically padded bond axis with per-bond atom rotation
bitmasks, fully on device and vmappable over poses.

Bond order matters (rotating bond k can move the pivot atoms of bond k+1);
the scan reproduces the reference's edge-order semantics exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import axis_angle_to_matrix


def apply_torsion_updates(
    pos: jnp.ndarray,
    tor_edges: jnp.ndarray,
    mask_rotate: jnp.ndarray,
    torsion_updates: jnp.ndarray,
    tor_mask: jnp.ndarray,
    aux_points: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """Sequentially rotate atom subsets around rotatable bonds.

    Args:
      pos: (A, 3) atom positions.
      tor_edges: (T, 2) int32 bond endpoints (u, v); convention: the side
        containing v rotates (reference torsion.py:90-93).
      mask_rotate: (T, A) bool - atoms moved by each bond.
      torsion_updates: (T,) rotation angles (radians).
      tor_mask: (T,) validity of each padded bond slot.
      aux_points: optional (..., A, 3) extra per-atom points (e.g. absolute
        pharmacophore-norm endpoints) rotated with the same masks.
    Returns:
      (pos', aux_points') after all valid rotations.
    """
    updates = jnp.where(tor_mask, torsion_updates, 0.0)

    def body(carry, inp):
        p, aux = carry
        uv, m, ang = inp
        u, v = uv[0], uv[1]
        pivot = p[v]
        rot_vec = p[u] - pivot
        rot_vec = rot_vec / jnp.maximum(jnp.linalg.norm(rot_vec), 1e-12) * ang
        R = axis_angle_to_matrix(rot_vec)
        rotate = lambda x: jnp.einsum("...i,ji->...j", x - pivot, R, precision=jax.lax.Precision.HIGHEST) + pivot
        p = jnp.where(m[:, None], rotate(p), p)
        if aux is not None:
            aux = jnp.where(m[:, None], rotate(aux), aux)
        return (p, aux), None

    (pos, aux_points), _ = jax.lax.scan(
        body, (pos, aux_points), (tor_edges, mask_rotate, updates)
    )
    return pos, aux_points
