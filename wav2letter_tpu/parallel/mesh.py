"""Device mesh construction.

The reference's only parallelism is NCCL data-parallel allreduce
(SURVEY.md §2.7; ``cpc/Train.cpp:342-353``). TPU-native replacement: a
2-D ``jax.sharding.Mesh`` with axes ``("data", "model")`` — gradients are
reduced by XLA-inserted psums over ICI when the loss is computed under jit
with sharded batches (GSPMD), and the model axis enables tensor-parallel
sharding of large layers (a new capability vs. the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass
class MeshSpec:
    n_data: int
    n_model: int = 1

    @classmethod
    def from_config(cls, cfg, n_devices: Optional[int] = None) -> "MeshSpec":
        n = n_devices if n_devices is not None else len(jax.devices())
        mp = max(1, cfg.mp_axis)
        if cfg.dp_axis > 0:
            dp = cfg.dp_axis
        else:
            dp = n // mp
        return cls(dp, mp)


# Current training mesh, published by the Trainer so mesh-aware kernels
# (e.g. the fused attention's shard_map wrapper) can partition themselves
# without threading the mesh through every module signature.
_CURRENT_MESH: Optional[Mesh] = None


def set_current_mesh(mesh: Optional[Mesh]) -> None:
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


def current_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH


def make_mesh(
    spec: Optional[MeshSpec] = None, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if spec is None:
        spec = MeshSpec(len(devices), 1)
    n = spec.n_data * spec.n_model
    if n > len(devices):
        raise ValueError(f"mesh {spec} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(spec.n_data, spec.n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
