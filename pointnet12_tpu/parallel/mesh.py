"""Device mesh + sharding utilities (data parallelism, ICI collectives).

The reference has no distributed layer at all (SURVEY.md §2 parallelism
table: at most optional ``nn.DataParallel``). The TPU-native design makes DP
first-class: a named 1-D ``Mesh`` over all local devices, batches sharded on
the ``data`` axis, parameters/optimizer state replicated. ``jax.jit`` with
these shardings emits the gradient all-reduce as an XLA collective over ICI —
no NCCL analog, no launcher; multi-host DCN later is a mesh-shape change.

A ``model`` axis (size 1 by default) is threaded through so tensor-parallel
shardings can be added without touching call sites; the models are <2M
params, so TP is intentionally unused (SURVEY.md §2).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
) -> Mesh:
    """1-D data-parallel mesh (optionally x model axis) over local devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}"
        )
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, split along the leading axis."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def cpu_mesh_sync(mesh: Optional[Mesh], x) -> None:
    """Serialize sharded-step dispatch on the XLA:CPU backend (tests only).

    TPU devices run enqueued programs in submission order, so two in-flight
    sharded steps can never interleave their collectives. XLA:CPU's
    in-process communicator has no such ordering: with donation chaining,
    device 0 can start step k+1 while device 7 is still inside step k, the
    two steps' all-gathers rendezvous with each other, and the stuck
    collective aborts the process (observed as AwaitAndLogIfStuck ->
    SIGABRT on the 8-virtual-device test mesh). Blocking on each step's
    output keeps the per-device program streams in lock-step; a no-op in
    cost terms on CPU where the tests run, and never taken on TPU.
    """
    if mesh is not None and jax.default_backend() == "cpu":
        jax.block_until_ready(x)
