"""Padded ligand-pharmacophore complexes: the host -> device data contract.

The reference represents a complex as a PyG HeteroData with ragged edge lists
(pdbbind_phore.py:1143-1189).  On TPU everything is dense and static: a
complex is padded to bucket sizes (A atoms, P phore points, T torsions) and
the intra/cross graphs are dense masked grids - the bipartite cross graph is
fully connected in the reference anyway (score_model_phore.py:1038-1079), and
ligand graphs are ~tens of atoms, so dense (A, A) is cheaper than gather/
scatter on this hardware.

``ComplexBatch`` is a flax.struct pytree: jit/vmap/pjit traverse it directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
from flax import struct

from ..chem.features import bond_features, featurize_atoms
from ..chem.mol import Molecule
from ..chem.pharmacophore_rules import ligand_phore_features
from ..chem.topology import rotatable_bonds
from .phore import NUM_PHORETYPE, Phore, PhoreGraph, build_phore_graph


def _round_up(x: int, m: int) -> int:
    return max(m, ((x + m - 1) // m) * m)


@struct.dataclass
class ComplexBatch:
    """A batch of padded complexes (leading axis B on every array field).

    Static-shape invariantss: A = atoms, P = phore points, T = torsion slots.
    All index fields point into the padded atom axis; masks mark validity.
    """

    # ligand
    lig_feat: Any          # (B, A, 16) int32 categorical features
    lig_pos: Any           # (B, A, 3) f32, phore-centered frame
    lig_mask: Any          # (B, A) bool
    lig_phorefp: Any       # (B, A, 11) f32
    lig_norm: Any          # (B, 11, A, 3) f32 relative norm vectors
    lig_norm_angle1: Any   # (B, A, 11) f32
    lig_norm_angle2: Any   # (B, A, 11) f32
    lig_ph: Any            # (B, 11) f32 molecule-level type counts
    bond_attr: Any         # (B, A, A, 4) f32 one-hot bond features
    bond_mask: Any         # (B, A, A) bool covalent-bond adjacency
    # torsions
    tor_edges: Any         # (B, T, 2) int32
    tor_mask: Any          # (B, T) bool
    mask_rotate: Any       # (B, T, A) bool
    # pharmacophore
    phore_x: Any           # (B, P, 5) f32 [type, is_ex_idx, has_norm_idx, alpha, weight]
    phore_pos: Any         # (B, P, 3) f32
    phore_norm: Any        # (B, P, 3) f32
    phore_mask: Any        # (B, P) bool
    phoretype: Any         # (B, P, 11) f32 one-hot
    phore_edge_mask: Any   # (B, P, P) bool
    # bookkeeping
    orig_center: Any       # (B, 3) f32 phore centroid in the input frame
    t: Any                 # (B,) f32 diffusion time (set by sampler/transform)
    valid: Any = None      # (B,) bool; False = repeat-padded row (loss/metric weight 0)
    # AncPhore-calibrated scoring fingerprint (chem.scoring_phore_fp); the
    # model consumes lig_phorefp (reference-SMARTS semantics), the fitness
    # scorer consumes this one
    lig_scorer_fp: Any = None  # (B, A, 11) f32
    # host-only metadata (not traced)
    names: Sequence[str] = struct.field(pytree_node=False, default=())
    meta: Sequence[Dict] = struct.field(pytree_node=False, default=())

    @property
    def batch_size(self) -> int:
        return self.lig_pos.shape[0]

    @property
    def num_atoms(self) -> int:
        return self.lig_pos.shape[1]

    @property
    def num_phore(self) -> int:
        return self.phore_pos.shape[1]

    @property
    def num_torsions(self) -> int:
        return self.tor_edges.shape[1]


def build_complex(
    name: str,
    mol: Molecule,
    phore: Phore,
    a_pad: Optional[int] = None,
    p_pad: Optional[int] = None,
    t_pad: Optional[int] = None,
    consider_ex: bool = True,
    neighbor_cutoff: Optional[float] = 5.0,
    ex_connected: bool = True,
    move_to_center: bool = True,
    orig_pos: Optional[np.ndarray] = None,
    meta: Optional[Dict] = None,
) -> ComplexBatch:
    """Featurize one (H-free ligand, phore) pair into a B=1 padded batch.

    Mirrors PhoreDataset.generate_graph (pdbbind_phore.py:1143-1189): ligand
    graph + phore graph + SMARTS-rule phorefp/norms, then both centered on
    the phore centroid.
    """
    assert all(a.atomic_num != 1 for a in mol.atoms), "ligand must be H-free"
    n_atoms = mol.num_atoms
    pg: PhoreGraph = build_phore_graph(phore, consider_ex, neighbor_cutoff, ex_connected)
    n_phore = pg.pos.shape[0]
    edges, masks = rotatable_bonds(mol)
    n_tor = len(edges)

    A = _round_up(n_atoms, 8) if a_pad is None else a_pad
    P = _round_up(n_phore, 8) if p_pad is None else p_pad
    T = _round_up(max(n_tor, 1), 4) if t_pad is None else t_pad
    if n_atoms > A or n_phore > P or n_tor > T:
        raise ValueError(
            f"{name}: sizes (A={n_atoms}, P={n_phore}, T={n_tor}) exceed pads ({A},{P},{T})"
        )

    feats = featurize_atoms(mol)
    fp, norms, ang1, ang2, counts = ligand_phore_features(mol)
    from ..chem.pharmacophore_rules import scoring_phore_fp

    sfp_full = scoring_phore_fp(mol)

    lig_feat = np.zeros((A, 16), np.int32)
    lig_feat[:n_atoms] = feats
    lig_pos = np.zeros((A, 3), np.float32)
    lig_pos[:n_atoms] = mol.coords
    lig_mask = np.zeros(A, bool)
    lig_mask[:n_atoms] = True
    lig_phorefp = np.zeros((A, NUM_PHORETYPE), np.float32)
    lig_phorefp[:n_atoms] = fp
    lig_scorer_fp = np.zeros((A, NUM_PHORETYPE), np.float32)
    lig_scorer_fp[:n_atoms] = sfp_full
    lig_norm = np.zeros((NUM_PHORETYPE, A, 3), np.float32)
    lig_norm[:, :n_atoms] = np.transpose(norms, (1, 0, 2))
    a1 = np.zeros((A, NUM_PHORETYPE), np.float32)
    a1[:n_atoms] = ang1
    a2 = np.zeros((A, NUM_PHORETYPE), np.float32)
    a2[:n_atoms] = ang2
    lig_ph = np.asarray(
        [counts[t] for t in ("MB", "HD", "AR", "PO", "HA", "HY", "NE", "CV", "CR", "XB", "EX")],
        np.float32,
    )

    bond_attr = np.zeros((A, A, 4), np.float32)
    bond_mask = np.zeros((A, A), bool)
    for i, j, o in mol.bonds:
        bf = bond_features(o)
        bond_attr[i, j] = bf
        bond_attr[j, i] = bf
        bond_mask[i, j] = bond_mask[j, i] = True

    tor_edges = np.zeros((T, 2), np.int32)
    tor_mask = np.zeros(T, bool)
    mask_rot = np.zeros((T, A), bool)
    if n_tor:
        tor_edges[:n_tor] = edges
        tor_mask[:n_tor] = True
        mask_rot[:n_tor, :n_atoms] = masks

    phore_x = np.zeros((P, 5), np.float32)
    phore_x[:n_phore] = pg.x
    phore_pos = np.zeros((P, 3), np.float32)
    phore_pos[:n_phore] = pg.pos
    phore_norm = np.zeros((P, 3), np.float32)
    phore_norm[:n_phore] = pg.norm
    phore_mask = np.zeros(P, bool)
    phore_mask[:n_phore] = True
    phoretype = np.zeros((P, NUM_PHORETYPE), np.float32)
    phoretype[:n_phore] = pg.phoretype
    pem = np.zeros((P, P), bool)
    pem[pg.edge_index[0], pg.edge_index[1]] = True

    center = pg.pos.mean(axis=0).astype(np.float32)
    if move_to_center:
        lig_pos[:n_atoms] -= center
        phore_pos[:n_phore] -= center

    md = dict(meta or {})
    md.setdefault("n_atoms", n_atoms)
    md.setdefault("n_phore", n_phore)
    md.setdefault("n_tor", n_tor)
    if orig_pos is not None:
        md["orig_pos"] = np.asarray(orig_pos)

    def b(x):  # add batch axis
        return x[None]

    return ComplexBatch(
        lig_feat=b(lig_feat), lig_pos=b(lig_pos), lig_mask=b(lig_mask),
        lig_phorefp=b(lig_phorefp), lig_norm=b(lig_norm),
        lig_norm_angle1=b(a1), lig_norm_angle2=b(a2), lig_ph=b(lig_ph),
        bond_attr=b(bond_attr), bond_mask=b(bond_mask),
        tor_edges=b(tor_edges), tor_mask=b(tor_mask), mask_rotate=b(mask_rot),
        phore_x=b(phore_x), phore_pos=b(phore_pos), phore_norm=b(phore_norm),
        phore_mask=b(phore_mask), phoretype=b(phoretype), phore_edge_mask=b(pem),
        orig_center=b(center), t=np.zeros(1, np.float32),
        valid=np.ones(1, bool), lig_scorer_fp=b(lig_scorer_fp),
        names=(name,), meta=(md,),
    )


def concat_batches(batches: Sequence[ComplexBatch]) -> ComplexBatch:
    """Stack same-shape complexes along the batch axis."""
    import jax

    stripped = [b.replace(names=(), meta=()) for b in batches]
    arrays = jax.tree_util.tree_map(lambda *xs: np.concatenate(xs, axis=0), *stripped)
    names = tuple(n for b in batches for n in b.names)
    meta = tuple(m for b in batches for m in b.meta)
    return arrays.replace(names=names, meta=meta)


def repeat_batch(batch: ComplexBatch, n: int) -> ComplexBatch:
    """Tile a B=1 complex into n identical poses (sample_per_complex)."""
    import jax

    arrays = jax.tree_util.tree_map(
        lambda x: np.repeat(np.asarray(x), n, axis=0), batch.replace(names=(), meta=())
    )
    return arrays.replace(names=tuple(batch.names) * n, meta=tuple(batch.meta) * n)


def pad_to_bucket(
    batches: Sequence[ComplexBatch], a_pad: int, p_pad: int, t_pad: int
) -> List[ComplexBatch]:
    """Re-pad complexes to common bucket sizes so they can be concatenated."""
    out = []
    for bb in batches:
        pads = {
            "lig_feat": ((0, 0), (0, a_pad - bb.num_atoms), (0, 0)),
            "lig_pos": ((0, 0), (0, a_pad - bb.num_atoms), (0, 0)),
            "lig_mask": ((0, 0), (0, a_pad - bb.num_atoms)),
            "lig_phorefp": ((0, 0), (0, a_pad - bb.num_atoms), (0, 0)),
            "lig_norm": ((0, 0), (0, 0), (0, a_pad - bb.num_atoms), (0, 0)),
            "lig_norm_angle1": ((0, 0), (0, a_pad - bb.num_atoms), (0, 0)),
            "lig_norm_angle2": ((0, 0), (0, a_pad - bb.num_atoms), (0, 0)),
            "lig_ph": None,
            "bond_attr": ((0, 0), (0, a_pad - bb.num_atoms), (0, a_pad - bb.num_atoms), (0, 0)),
            "bond_mask": ((0, 0), (0, a_pad - bb.num_atoms), (0, a_pad - bb.num_atoms)),
            "tor_edges": ((0, 0), (0, t_pad - bb.num_torsions), (0, 0)),
            "tor_mask": ((0, 0), (0, t_pad - bb.num_torsions)),
            "mask_rotate": ((0, 0), (0, t_pad - bb.num_torsions), (0, a_pad - bb.num_atoms)),
            "phore_x": ((0, 0), (0, p_pad - bb.num_phore), (0, 0)),
            "phore_pos": ((0, 0), (0, p_pad - bb.num_phore), (0, 0)),
            "phore_norm": ((0, 0), (0, p_pad - bb.num_phore), (0, 0)),
            "phore_mask": ((0, 0), (0, p_pad - bb.num_phore)),
            "phoretype": ((0, 0), (0, p_pad - bb.num_phore), (0, 0)),
            "phore_edge_mask": ((0, 0), (0, p_pad - bb.num_phore), (0, p_pad - bb.num_phore)),
            "orig_center": None,
            "t": None,
            "valid": None,
            "lig_scorer_fp": ((0, 0), (0, a_pad - bb.num_atoms), (0, 0)),
        }
        kwargs = {}
        for f in dataclasses.fields(bb):
            if f.name in ("names", "meta"):
                continue
            arr = np.asarray(getattr(bb, f.name))
            pad = pads[f.name]
            kwargs[f.name] = arr if pad is None else np.pad(arr, pad)
        out.append(ComplexBatch(names=bb.names, meta=bb.meta, **kwargs))
    return out
