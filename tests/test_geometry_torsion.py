"""Geometry + torsion kernels vs scipy ground truth."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from diffphore_tpu.ops.geometry import (
    angle_between,
    axis_angle_to_matrix,
    kabsch,
    matrix_to_axis_angle,
)
from diffphore_tpu.ops.rigid import PoseState, modify_conformer
from diffphore_tpu.ops.torsion import apply_torsion_updates

rng = np.random.default_rng(42)


def test_axis_angle_matches_scipy():
    v = rng.normal(size=(64, 3))
    R_ours = np.asarray(axis_angle_to_matrix(jnp.asarray(v, dtype=jnp.float32)))
    R_scipy = Rotation.from_rotvec(v).as_matrix()
    assert np.allclose(R_ours, R_scipy, atol=1e-5)


def test_axis_angle_roundtrip():
    v = rng.normal(size=(64, 3))
    R = axis_angle_to_matrix(jnp.asarray(v, dtype=jnp.float32))
    v2 = np.asarray(matrix_to_axis_angle(R))
    R2 = Rotation.from_rotvec(v2).as_matrix()
    assert np.allclose(np.asarray(R), R2, atol=2e-3)


def test_kabsch_recovers_transform():
    A = rng.normal(size=(30, 3)).astype(np.float32)
    R_true = Rotation.random(random_state=1).as_matrix().astype(np.float32)
    t_true = np.array([1.0, -2.0, 0.5], dtype=np.float32)
    B = A @ R_true.T + t_true
    R, t = kabsch(jnp.asarray(A), jnp.asarray(B))
    assert np.allclose(np.asarray(R), R_true, atol=2e-3)
    assert np.allclose(np.asarray(t), t_true, atol=2e-3)
    assert np.isclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_kabsch_masked_ignores_padding():
    A = rng.normal(size=(20, 3)).astype(np.float32)
    R_true = Rotation.random(random_state=2).as_matrix().astype(np.float32)
    B = A @ R_true.T
    # poison the padded tail
    A_pad = np.concatenate([A, rng.normal(size=(12, 3)).astype(np.float32) * 100], 0)
    B_pad = np.concatenate([B, np.zeros((12, 3), np.float32)], 0)
    mask = np.concatenate([np.ones(20, bool), np.zeros(12, bool)])
    R, t = kabsch(jnp.asarray(A_pad), jnp.asarray(B_pad), mask=jnp.asarray(mask))
    assert np.allclose(np.asarray(R), R_true, atol=2e-3)


def _reference_torsion_apply(pos, edges, mask_rotate, updates):
    """Direct numpy re-statement of the reference loop (torsion.py:84-105)."""
    pos = pos.copy()
    for idx, (u, v) in enumerate(edges):
        if updates[idx] == 0:
            continue
        rot_vec = pos[u] - pos[v]
        rot_vec = rot_vec * updates[idx] / np.linalg.norm(rot_vec)
        R = Rotation.from_rotvec(rot_vec).as_matrix()
        pos[mask_rotate[idx]] = (pos[mask_rotate[idx]] - pos[v]) @ R.T + pos[v]
    return pos


def _butane_like():
    """A 10-atom chain with 2 rotatable bonds + rotation masks."""
    pos = np.cumsum(rng.normal(size=(10, 3)), axis=0).astype(np.float32)
    edges = np.array([[3, 4], [6, 7]], dtype=np.int32)
    mask_rotate = np.zeros((2, 10), dtype=bool)
    mask_rotate[0, 4:] = True
    mask_rotate[1, 7:] = True
    return pos, edges, mask_rotate


def test_torsion_apply_matches_reference_loop():
    pos, edges, mask_rotate = _butane_like()
    updates = np.array([0.7, -1.3], dtype=np.float32)
    want = _reference_torsion_apply(pos, edges, mask_rotate, updates)
    got, _ = apply_torsion_updates(
        jnp.asarray(pos), jnp.asarray(edges), jnp.asarray(mask_rotate),
        jnp.asarray(updates), jnp.ones(2, dtype=bool),
    )
    assert np.allclose(np.asarray(got), want, atol=1e-4)


def test_torsion_padded_slots_are_noops():
    pos, edges, mask_rotate = _butane_like()
    edges_pad = np.concatenate([edges, np.zeros((3, 2), np.int32)], 0)
    mask_pad = np.concatenate([mask_rotate, np.ones((3, 10), bool)], 0)
    updates = np.array([0.7, -1.3, 9.0, 9.0, 9.0], dtype=np.float32)
    tor_mask = np.array([1, 1, 0, 0, 0], dtype=bool)
    want = _reference_torsion_apply(pos, edges, mask_rotate, updates[:2])
    got, _ = apply_torsion_updates(
        jnp.asarray(pos), jnp.asarray(edges_pad), jnp.asarray(mask_pad),
        jnp.asarray(updates), jnp.asarray(tor_mask),
    )
    assert np.allclose(np.asarray(got), want, atol=1e-4)


def test_modify_conformer_rigid_only():
    pos, edges, mask_rotate = _butane_like()
    state = PoseState(jnp.asarray(pos), None)
    tr = jnp.asarray([1.0, 0.0, -1.0])
    rotvec = np.array([0.3, -0.2, 0.5], dtype=np.float32)
    out = modify_conformer(
        state, jnp.ones(10, bool), jnp.asarray(edges), jnp.asarray(mask_rotate),
        jnp.ones(2, bool), tr, jnp.asarray(rotvec), None,
    )
    center = pos.mean(0)
    R = Rotation.from_rotvec(rotvec).as_matrix()
    want = (pos - center) @ R.T + np.asarray(tr) + center
    assert np.allclose(np.asarray(out.pos), want, atol=1e-4)


def test_modify_conformer_torsion_preserves_bonds_and_recidivism():
    """Torsion+Kabsch keeps all pairwise bonded distances and centroid."""
    pos, edges, mask_rotate = _butane_like()
    state = PoseState(jnp.asarray(pos), None)
    out = modify_conformer(
        state, jnp.ones(10, bool), jnp.asarray(edges), jnp.asarray(mask_rotate),
        jnp.ones(2, bool), jnp.zeros(3), jnp.zeros(3),
        jnp.asarray([0.9, -0.4], dtype=jnp.float32),
    )
    new_pos = np.asarray(out.pos)
    # chain bond lengths preserved
    d0 = np.linalg.norm(np.diff(pos, axis=0), axis=1)
    d1 = np.linalg.norm(np.diff(new_pos, axis=0), axis=1)
    assert np.allclose(d0, d1, atol=1e-4)
    # Kabsch re-alignment: flexible pose stays registered to the rigid pose
    disp = np.linalg.norm(new_pos - pos, axis=1)
    assert disp.mean() < np.abs(pos).max()  # no runaway drift


def test_angle_between():
    a = np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], np.float32)
    b = np.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]], np.float32)
    ang = np.asarray(angle_between(jnp.asarray(a), jnp.asarray(b)))
    assert np.allclose(ang, [np.pi / 2, np.pi], atol=1e-5)
