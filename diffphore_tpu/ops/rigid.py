"""Conformer modification: apply (translation, rotation, torsions) to a pose.

Device-side equivalent of reference ``modify_conformer``
(/root/reference/src/utils/diffusion_utils.py:23-79): rigid move about the
ligand centroid, sequential torsion rotations, then Kabsch re-alignment of the
flexible pose onto the rigid one.  Written for a single (padded) pose; vmap
over the pose/complex batch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .geometry import axis_angle_to_matrix, kabsch


def _rot(x, R):
    """x @ R.T at full precision (never bf16 on the MXU)."""
    return jnp.einsum("...i,ji->...j", x, R, precision=jax.lax.Precision.HIGHEST)
from .torsion import apply_torsion_updates


class PoseState(NamedTuple):
    """The mutable-under-diffusion part of a complex: positions + norms.

    norm holds *relative* pharmacophore-norm vectors per atom and phore type,
    shape (NUM_PHORETYPE, A, 3), exactly like the reference's
    data['ligand'].norm reshaped (diffusion_utils.py:36).
    """

    pos: jnp.ndarray  # (A, 3)
    norm: Optional[jnp.ndarray]  # (K, A, 3) relative, or None


def modify_conformer(
    state: PoseState,
    atom_mask: jnp.ndarray,
    tor_edges: jnp.ndarray,
    mask_rotate: jnp.ndarray,
    tor_mask: jnp.ndarray,
    tr_update: jnp.ndarray,
    rot_update: jnp.ndarray,
    torsion_updates: Optional[jnp.ndarray],
) -> PoseState:
    """Apply one diffusion update to a padded pose.

    Args:
      state: current positions / relative norms.
      atom_mask: (A,) valid-atom mask.
      tor_edges: (T, 2); mask_rotate: (T, A); tor_mask: (T,).
      tr_update: (3,); rot_update: (3,) axis-angle; torsion_updates: (T,) or None.
    """
    pos, norm = state.pos, state.norm
    w = atom_mask.astype(pos.dtype)[:, None]
    center = jnp.sum(pos * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)

    R = axis_angle_to_matrix(rot_update)
    rigid_pos = _rot(pos - center, R) + tr_update + center
    abs_norm = None
    if norm is not None:
        abs_norm = norm + pos[None, :, :]  # to absolute endpoints
        abs_norm = _rot(abs_norm - center, R) + tr_update + center

    if torsion_updates is None:
        new_norm = None if abs_norm is None else (abs_norm - rigid_pos[None, :, :])
        return PoseState(rigid_pos, new_norm)

    flex_pos, flex_norm = apply_torsion_updates(
        rigid_pos, tor_edges, mask_rotate, torsion_updates, tor_mask, aux_points=abs_norm
    )
    # Kabsch: align the flexible pose back onto the rigid one so torsion
    # updates do not leak rigid-body motion (reference diffusion_utils.py:59).
    Rk, tk = kabsch(flex_pos, rigid_pos, mask=atom_mask)
    aligned_pos = _rot(flex_pos, Rk) + tk
    new_norm = None
    if flex_norm is not None:
        aligned_norm = _rot(flex_norm, Rk) + tk
        new_norm = aligned_norm - aligned_pos[None, :, :]
    return PoseState(aligned_pos, new_norm)
