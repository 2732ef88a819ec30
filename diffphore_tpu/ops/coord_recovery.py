"""Coordinate recovery from predicted distance maps (TANKBind-style baseline).

JAX/optax re-design of the reference generation_utils
(/root/reference/src/utils/generation_utils.py:46-213): recover ligand
coordinates by gradient descent on a weighted MSE between (a) predicted
ligand-phore cross distances and (b) LAS-constrained intra-ligand distances.
Used by the ``model_type='tank'`` baseline path; here the whole optimization
is one jitted lax.scan and batches over multiple initializations.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def distance_loss(
    coords: jnp.ndarray,         # (A, 3)
    phore_pos: jnp.ndarray,      # (P, 3)
    pred_dist: jnp.ndarray,      # (A, P) predicted cross distances
    cross_mask: jnp.ndarray,     # (A, P)
    holo_dist: jnp.ndarray,      # (A, A) target intra distances (LAS)
    intra_mask: jnp.ndarray,     # (A, A)
    cross_weight: float = 1.0,
    intra_weight: float = 1.0,
    cross_cutoff: float = 10.0,
) -> jnp.ndarray:
    """Weighted MSE on cross + intra distances (reference
    distance_loss_function :46-68; distances beyond the cutoff are ignored
    like its dist_map clamp)."""
    def safe_norm(x):
        # sqrt at exactly 0 has a NaN gradient; the diagonal of the intra
        # matrix hits it
        return jnp.sqrt(jnp.sum(x * x, axis=-1) + 1e-12)

    d_cross = safe_norm(coords[:, None, :] - phore_pos[None, :, :])
    m_cross = cross_mask & (pred_dist < cross_cutoff)
    cross = (((d_cross - pred_dist) ** 2) * m_cross).sum() / jnp.maximum(m_cross.sum(), 1)
    d_intra = safe_norm(coords[:, None, :] - coords[None, :, :])
    intra = (((d_intra - holo_dist) ** 2) * intra_mask).sum() / jnp.maximum(intra_mask.sum(), 1)
    return cross_weight * cross + intra_weight * intra


def recover_coords(
    key: jax.Array,
    phore_pos: jnp.ndarray,
    pred_dist: jnp.ndarray,
    cross_mask: jnp.ndarray,
    holo_dist: jnp.ndarray,
    intra_mask: jnp.ndarray,
    n_init: int = 4,
    steps: int = 500,
    lr: float = 0.1,
    init_spread: float = 4.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Optimize coordinates from several random inits; return (coords, loss)
    of the best run.  Fully jitted (scan over optimizer steps, vmap over
    initializations) - the reference loops in Python per complex (:70-196).
    """
    A = holo_dist.shape[0]
    center = phore_pos.mean(axis=0)
    inits = center + init_spread * jax.random.normal(key, (n_init, A, 3))
    opt = optax.adam(lr)

    def run(x0):
        state0 = opt.init(x0)

        def step(carry, _):
            x, st = carry
            loss, g = jax.value_and_grad(distance_loss)(
                x, phore_pos, pred_dist, cross_mask, holo_dist, intra_mask
            )
            updates, st = opt.update(g, st)
            return (optax.apply_updates(x, updates), st), loss

        (x, _), losses = jax.lax.scan(step, (x0, state0), None, length=steps)
        final = distance_loss(x, phore_pos, pred_dist, cross_mask, holo_dist, intra_mask)
        return x, final

    coords, losses = jax.vmap(run)(inits)
    best = jnp.argmin(losses)
    return coords[best], losses[best]


def las_distance_matrix(mol, coords=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Local-atomic-structure target distances: pairs within 2 bond hops or a
    shared ring keep their conformer distance; other pairs are unconstrained
    (reference get_LAS_distance_constraint_mask, process_mols.py:1037-1072).
    Returns (holo_dist (A, A), mask (A, A)) as numpy-backed jnp arrays."""
    import numpy as np

    A = mol.num_atoms
    adj = np.zeros((A, A), bool)
    for i, j, _ in mol.bonds:
        adj[i, j] = adj[j, i] = True
    two_hop = adj @ adj | adj
    ring_pair = np.zeros((A, A), bool)
    for ring in mol.sssr:
        for i in ring:
            for j in ring:
                ring_pair[i, j] = True
    mask = (two_hop | ring_pair) & ~np.eye(A, dtype=bool)
    c = mol.coords if coords is None else coords
    d = np.linalg.norm(c[:, None] - c[None, :], axis=-1)
    return jnp.asarray(d), jnp.asarray(mask)
