"""Command-line entry points: inference (ligand-phore fitting / virtual
screening), training, and evaluation."""
