"""Scale-out over a jax.sharding.Mesh: data-parallel training and sharded
virtual screening (the reference's PyG DataParallel + multiprocess analogue,
SURVEY 2.3)."""

from .mesh import make_mesh, shard_batch, shard_train_step  # noqa: F401
