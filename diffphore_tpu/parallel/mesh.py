"""Device-mesh sharding for training and screening.

Parallelism analysis (SURVEY 2.3): DiffPhore's models are a few M
parameters with graphs of <= ~100 nodes, so the scale axis is *throughput* -
poses x complexes - not model size.  The reference scales with PyG
``DataParallel`` thread-scatter over local GPUs (utils/utils.py:171) and
multiprocess featurization; here:

  * one ``Mesh`` axis ``data`` spans all chips (ICI);
  * parameters/optimizer state are fully replicated;
  * the batch (poses x complexes) is sharded along ``data``;
  * gradient reduction is the psum XLA inserts for the replicated-output
    loss - no hand-written collectives;
  * multi-host virtual screens shard the ligand CSV per process (DCN is
    crossed only by the final host-side gather of ranked results,
    matching the reference's embarrassingly-parallel semantics).

Tensor/pipeline/expert parallelism are intentionally absent - there is no
dimension to shard (documented, not forgotten).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (pose/complex) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a ComplexBatch with its leading axis sharded across the mesh.

    The batch size must divide the mesh size; callers pad the pose count
    (sample_per_complex) or the complex batch to a multiple of the mesh.
    """
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_train_step(step_fn: Callable, mesh: Mesh, n_extra: int = 0) -> Callable:
    """jit the train step with (replicated state, sharded batch) placement.

    ``n_extra`` replicated scalar arguments follow (state, batch, key) —
    e.g. the reject probability or the CCSampler branch probability, which
    are traced so their schedules never trigger recompiles.

    XLA turns the mean-loss gradient into an all-reduce over ICI; nothing in
    the step function mentions collectives.
    """
    repl = replicated(mesh)
    data = batch_sharding(mesh)

    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl) + (repl,) * n_extra,
        out_shardings=(repl, repl),
    )


def shard_eval_step(step_fn: Callable, mesh: Mesh) -> Callable:
    """jit the (variables, batch, key) -> per-graph-metrics eval step with the
    batch sharded; per-graph outputs come back sharded along the same axis."""
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(repl, data, repl), out_shardings=data)


def shard_records(records, process_index: Optional[int] = None, process_count: Optional[int] = None):
    """Multi-host screening: statically stripe the work list per process."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return records[pi::pc]
