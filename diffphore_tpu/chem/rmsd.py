"""Symmetry-corrected RMSD via molecular-graph automorphisms.

Replaces the reference's OpenBabel ``obrms`` subprocess and spyrmsd fallback
(utils/utils.py:22-49, 204-230): automorphisms of the (element, bond-order)
colored graph are enumerated with networkx VF2 and the minimum RMSD over
mappings is returned.  Automorphism count is capped to bound worst cases
(highly symmetric molecules).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from .mol import Molecule


def _graph(mol: Molecule):
    import networkx as nx

    G = nx.Graph()
    for i, a in enumerate(mol.atoms):
        G.add_node(i, z=a.atomic_num)
    for i, j, o in mol.bonds:
        G.add_edge(i, j, o=o)
    return G


def symmetry_rmsd(
    mol: Molecule,
    coords_a: np.ndarray,
    coords_b: np.ndarray,
    max_mappings: int = 256,
    align: bool = False,
) -> float:
    """Min RMSD between two coordinate sets over graph automorphisms.

    ``align=False`` matches the docking convention (poses share a frame).
    """
    import networkx as nx
    from networkx.algorithms.isomorphism import GraphMatcher, categorical_node_match, categorical_edge_match

    G = _graph(mol)
    gm = GraphMatcher(
        G, G,
        node_match=categorical_node_match("z", 0),
        edge_match=categorical_edge_match("o", 0),
    )
    best = np.inf
    n = len(mol.atoms)
    count = 0
    for mapping in gm.isomorphisms_iter():
        perm = np.asarray([mapping[i] for i in range(n)])
        b = coords_b[perm]
        if align:
            from scipy.spatial.transform import Rotation

            ac = coords_a - coords_a.mean(0)
            bc = b - b.mean(0)
            rot, _ = Rotation.align_vectors(ac, bc)
            b = bc @ rot.as_matrix().T + coords_a.mean(0)
        rmsd = float(np.sqrt(((coords_a - b) ** 2).sum(-1).mean()))
        best = min(best, rmsd)
        count += 1
        if count >= max_mappings:
            break
    return best


def plain_rmsd(coords_a: np.ndarray, coords_b: np.ndarray) -> float:
    return float(np.sqrt(((coords_a - coords_b) ** 2).sum(-1).mean()))
