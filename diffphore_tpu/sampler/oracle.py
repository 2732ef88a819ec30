"""Analytic (oracle) score functions that certify the reverse-diffusion chain.

The training targets (data/transforms.py, mirroring reference
pdbbind_phore.py:156-160) are closed-form functions of the *applied* noise:
``tr_score = -tr/sigma^2``, ``rot_score = IGSO3 score at the drawn rotation``,
``tor_score = wrapped-normal score at the drawn torsions``.  A perfectly
trained model therefore predicts exactly these quantities *measured from the
pose it is shown*.  This module measures them: given the clean pose, it
computes the translation / rotation / torsion offsets of the current pose and
returns the corresponding analytic scores.

Feeding this oracle through ``reverse_diffusion`` proves (or disproves) that
the sampling chain itself - update scaling g^2*dt (reference
sampling.py:174-280), ``modify_conformer`` composition, torsion ordering,
Kabsch re-alignment - recovers poses when the score field is correct,
independent of any trained weights.

Offset measurement notes (all exact statements about ops/rigid.py):
  * centroid: ``modify_conformer`` moves the masked centroid by exactly
    ``tr_update`` (the rigid move translates it, and the torsion+Kabsch step
    re-aligns onto the rigid pose, matching centroids exactly) - so the
    centroid offset equals the cumulative applied translation.
  * rotation: measured by masked Kabsch between the centered clean and
    current poses; exact when torsions agree, and second-order accurate in
    the torsion offsets otherwise (the same approximation the model's
    training distribution embodies, since noising Kabsch-aligns the torsioned
    pose back onto the rigid one).
  * torsions: dihedral angles are invariant under the rigid move and Kabsch
    re-alignment, so per-bond dihedral differences equal the cumulative
    applied torsion updates exactly.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import so3, torus
from ..ops.diffusion import SigmaSchedule
from ..ops.geometry import kabsch, matrix_to_axis_angle


def dihedral_reference_atoms(
    bond_mask: np.ndarray,
    tor_edges: np.ndarray,
    tor_mask: np.ndarray,
    mask_rotate: np.ndarray,
) -> np.ndarray:
    """Host-side: pick fixed-side / rotating-side reference atoms per bond.

    For each rotatable bond (u, v) - convention: the ``mask_rotate`` side
    containing v's other neighbors rotates (ops/torsion.py) - returns
    ``(T, 2)`` int32 ``(a, b)`` with ``a`` a neighbor of u outside the
    rotating mask and ``b`` a neighbor of v inside it, defining the measured
    dihedral a-u-v-b.  Padded slots get (0, 0).
    """
    T = tor_edges.shape[0]
    out = np.zeros((T, 2), np.int32)
    bm = np.asarray(bond_mask)
    mr = np.asarray(mask_rotate)
    for k in range(T):
        if not tor_mask[k]:
            continue
        u, v = int(tor_edges[k, 0]), int(tor_edges[k, 1])
        a_cands = [a for a in np.where(bm[u])[0] if a != v and not mr[k, a]]
        b_cands = [b for b in np.where(bm[v])[0] if b != u and mr[k, b]]
        if not a_cands or not b_cands:
            raise ValueError(f"torsion bond {k} ({u},{v}) has no dihedral refs")
        out[k] = (a_cands[0], b_cands[0])
    return out


def measure_dihedrals(
    pos: jnp.ndarray, tor_edges: jnp.ndarray, ref_atoms: jnp.ndarray
) -> jnp.ndarray:
    """Dihedral a-u-v-b per torsion slot for one pose ``(A, 3) -> (T,)``.

    Sign convention: ``apply_torsion_updates(pos, ..., theta)`` increases the
    value returned here by exactly ``theta`` (verified by
    tests/test_oracle_sampler.py::test_dihedral_sign_convention), so measured
    differences are directly comparable to cumulative torsion updates.
    """
    a = pos[ref_atoms[:, 0]]
    u = pos[tor_edges[:, 0]]
    v = pos[tor_edges[:, 1]]
    b = pos[ref_atoms[:, 1]]
    b0 = a - u
    b1 = v - u
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-12)
    b2 = b - v
    v_perp = b0 - jnp.sum(b0 * b1, -1, keepdims=True) * b1
    w_perp = b2 - jnp.sum(b2 * b1, -1, keepdims=True) * b1
    x = jnp.sum(v_perp * w_perp, -1)
    y = jnp.sum(jnp.cross(b1, v_perp) * w_perp, -1)
    # the torsion op rotates the b-side about axis (u - v) = -b1; a positive
    # update therefore *decreases* atan2(y, x), hence the leading minus.
    return -jnp.arctan2(y, x)


def pose_offsets(
    batch, true_pos: jnp.ndarray, true_dih: jnp.ndarray, ref_atoms: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Measured (tr_offset (B,3), rot_vec (B,3), tor_delta (B,T)) of the
    batch's current pose relative to ``true_pos``."""
    m = batch.lig_mask.astype(batch.lig_pos.dtype)
    wsum = jnp.maximum(m.sum(-1, keepdims=True), 1.0)
    c_cur = (batch.lig_pos * m[..., None]).sum(-2) / wsum
    c_true = (true_pos * m[..., None]).sum(-2) / wsum
    tr_off = c_cur - c_true
    # current ~= R . true (about centroids): kabsch gives cur = true @ R.T + t
    R, _ = kabsch(true_pos, batch.lig_pos, mask=batch.lig_mask)
    rot_vec = matrix_to_axis_angle(R)
    cur_dih = jax.vmap(measure_dihedrals)(
        batch.lig_pos, batch.tor_edges, jnp.broadcast_to(ref_atoms, batch.tor_edges.shape)
    )
    tor_delta = torus.wrap(cur_dih - true_dih) * batch.tor_mask
    return tr_off, rot_vec, tor_delta


def make_oracle_score_fn(
    clean_batch, schedule: SigmaSchedule
) -> Callable:
    """Build a drop-in ``score_fn`` for ``reverse_diffusion`` that returns the
    analytic scores of the current pose's offsets from ``clean_batch``.

    The returned function reads the diffusion time from ``batch.t`` (set per
    step by the sampler scan) and is fully jittable.
    """
    true_pos = jnp.asarray(clean_batch.lig_pos)
    ref_atoms = jnp.asarray(
        np.stack(
            [
                dihedral_reference_atoms(
                    np.asarray(clean_batch.bond_mask[i]),
                    np.asarray(clean_batch.tor_edges[i]),
                    np.asarray(clean_batch.tor_mask[i]),
                    np.asarray(clean_batch.mask_rotate[i]),
                )
                for i in range(clean_batch.batch_size)
            ]
        )
    )
    true_dih = jax.vmap(measure_dihedrals)(
        true_pos, jnp.asarray(clean_batch.tor_edges), ref_atoms
    )

    def score_fn(b):
        tr_sigma, rot_sigma, tor_sigma = schedule(b.t)
        tr_off, rot_vec, tor_delta = pose_offsets(b, true_pos, true_dih, ref_atoms)
        tr_score = -tr_off / tr_sigma[:, None] ** 2
        rot_score = so3.score_vec(rot_sigma, rot_vec)
        tor_score = torus.score(tor_delta, tor_sigma[:, None]) * b.tor_mask
        return tr_score, rot_score, tor_score

    return score_fn
