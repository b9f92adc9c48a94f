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


def data_rows_process_local(mesh: Mesh) -> bool:
    """True when every data-axis row's devices belong to a single process —
    the precondition for rank-sharded datasets assembled with
    ``host_local_array_to_global_array``. False on pod-slice meshes whose
    MODEL axis spans hosts (mp > per-host chips): there every host's devices
    carry shards of every batch row, so each host must hold the full global
    batch and contribute per-device shards instead."""
    if jax.process_count() == 1:
        return True
    dp = mesh.shape[DATA_AXIS]
    rows = np.asarray(mesh.devices).reshape(dp, -1)
    return all(len({d.process_index for d in row}) == 1 for row in rows)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Shard leading (batch) axis of every leaf over the data axis.

    Multi-process (``jax.distributed``), process-local data rows: each
    process holds only its *local* rows (the dataset is sharded by rank,
    reference ``cpc/Train.cpp:765-766``); the local arrays are assembled
    into one global array spanning the mesh — the TPU-native replacement
    for "every rank steps on its own batch and NCCL reduces the grads".

    Host-spanning MODEL axis: every process holds the FULL global batch
    (dataset not rank-sharded) and ``make_array_from_callback`` places each
    addressable device's shard — the only assembly that keeps replicas of a
    row consistent across hosts.
    """

    if jax.process_count() > 1:
        if data_rows_process_local(mesh):
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
            x = np.asarray(x)
            spec = P(DATA_AXIS) if x.ndim >= 1 else P()
            sharding = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx]
            )

        return jax.tree.map(put, batch)

    def put(x):
        spec = P(DATA_AXIS) if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def to_host_local(mesh: Mesh, x: Any) -> np.ndarray:
    """Fetch the rows of a batch-sharded device array that belong to this
    process (inverse of ``shard_batch``). Single-process: plain fetch.
    Host-spanning MODEL axis: every process holds shards of every row, so
    gather the global value and take this process's contiguous row block —
    each row is metered by exactly one process, as in the local-rows case."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    if not data_rows_process_local(mesh):
        full = np.asarray(multihost_utils.process_allgather(x, tiled=True))
        if full.ndim < 1:
            return full
        pc = jax.process_count()
        per = full.shape[0] // pc
        r = jax.process_index()
        return full[r * per : (r + 1) * per] if per else full[:0]

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
