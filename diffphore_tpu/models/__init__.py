"""SE(3)-equivariant score network (flax): knowledge-guided ligand-phore
encoder + translation/rotation/torsion score heads, built on the dense masked
graph representation of data.graphs.ComplexBatch."""

from .score_model import ScoreModel, ScoreModelConfig  # noqa: F401
