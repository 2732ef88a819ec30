"""DiffPhore-TPU: a TPU-native framework for 3D ligand-pharmacophore mapping.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of DiffPhore
(Yu et al., Nat Commun 16, 2269 (2025)): score-based diffusion over
T(3) x SO(3) x SO(2)^m driven by an SE(3)-equivariant tensor-product GNN
over a ligand-pharmacophore heterograph.

Design principles (TPU-first, not a port):
  * Static shapes everywhere: complexes are padded into dense masked
    arrays (atoms A, phore points P, torsions T); the bipartite cross
    graph is a dense (A, P) grid, intra graphs dense (A, A) / (P, P).
  * The whole reverse diffusion (20 Euler-Maruyama steps, including
    rigid-move + torsion updates + Kabsch re-alignment) is a single
    jitted ``lax.scan`` on device - no host round trips per step.
  * SO(3)/torus score tables are device-resident arrays looked up with
    ``jnp.interp``-style gather, not CPU numpy lookups.
  * Scale-out over a ``jax.sharding.Mesh``: parameters replicated, the
    poses-x-complexes batch dimension sharded (``data`` axis), gradient
    ``psum`` over ICI.
  * The host chemistry layer (SDF/SMILES, pharmacophore perception,
    rotatable bonds) is self-contained - no RDKit / OpenBabel / torch.
"""

__version__ = "0.1.0"
