"""Self-contained host-side chemistry kernel.

The reference sits on RDKit/OpenBabel (C++) for molecular IO, perception and
featurization (/root/reference/src/datasets/process_mols.py).  Neither library
exists in this environment, so this package provides the needed subset from
scratch: a molecular graph model, SDF/MOL/MOL2/PDB/SMILES parsing, aromaticity
and ring perception, pharmacophore-type perception (rule equivalents of the
reference's PHORE_SMARTS table), rotatable-bond analysis, 3D embedding for
SMILES inputs, and symmetry-aware RMSD.

Everything here is host-side numpy/python - it feeds fixed-shape arrays to the
JAX compute path and never touches the device.
"""

from .mol import Atom, Molecule  # noqa: F401
from .sdf import parse_sdf, parse_sdf_text, write_sdf  # noqa: F401
from .smiles import mol_from_smiles  # noqa: F401
