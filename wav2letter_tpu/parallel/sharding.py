"""Sharding rules: batch over the data axis, parameters replicated or
tensor-sharded over the model axis by simple size/shape heuristics.

Replaces the reference's explicit NCCL machinery (``distributeModuleGrads`` /
``CoalescingReducer`` / ``allReduceParameters``, ``cpc/Train.cpp:342-353,
972-980``): under GSPMD none of that exists as user code — batch sharding
makes XLA insert gradient psums over ICI automatically.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def replicate(mesh: Mesh, tree: Any) -> Any:
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Shard leading (batch) axis of every leaf over the data axis.

    Multi-process (``jax.distributed``): each process holds only its *local*
    rows (the dataset is sharded by rank, reference ``cpc/Train.cpp:765-766``);
    the local arrays are assembled into one global array spanning the mesh —
    the TPU-native replacement for "every rank steps on its own batch and
    NCCL reduces the grads".
    """

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def put(x):
            if np.ndim(x) < 1:
                return multihost_utils.host_local_array_to_global_array(
                    np.asarray(x), mesh, P()
                )
            return multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, P(DATA_AXIS)
            )

        return jax.tree.map(put, batch)

    def put(x):
        spec = P(DATA_AXIS) if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def to_host_local(mesh: Mesh, x: Any) -> np.ndarray:
    """Fetch the rows of a batch-sharded device array that belong to this
    process (inverse of ``shard_batch``). Single-process: plain fetch."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    spec = P(DATA_AXIS) if np.ndim(x) >= 1 else P()
    local = multihost_utils.global_array_to_host_local_array(x, mesh, spec)
    return np.asarray(local)


def param_spec(path: tuple, x: Any, min_shard_size: int = 2**20) -> P:
    """Heuristic tensor-parallel spec: shard the largest dim of big 2-D+
    params over the model axis; small params replicate."""
    shape = np.shape(x)
    if len(shape) < 2 or np.prod(shape) < min_shard_size:
        return P()
    # shard the last axis (output features) — matmul-friendly column split
    spec = [None] * len(shape)
    spec[-1] = MODEL_AXIS
    return P(*spec)


def shard_params(mesh: Mesh, params: Any, tensor_parallel: bool = False) -> Any:
    if mesh.shape[MODEL_AXIS] == 1 or not tensor_parallel:
        return replicate(mesh, params)

    def put(path, x):
        shape = np.shape(x)
        spec = param_spec(path, x)
        # only shard if divisible
        if spec != P():
            ax = len(shape) - 1
            if shape[ax] % mesh.shape[MODEL_AXIS] != 0:
                spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)
