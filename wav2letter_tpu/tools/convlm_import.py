"""Import torch/fairseq ConvLM checkpoints.

Reference: ``recipes/utilities/convlm_serializer/`` (``Serialize.cpp`` +
``save_pytorch_model.py``): fairseq GCNN LM checkpoints are renamed/saved as
plain tensors, then packed into flashlight modules (with AdaptiveSoftmax
tail handling). Here: a torch checkpoint (state-dict of arrays) is mapped
positionally onto an ``LMArchModel``'s parameter tree — matching arrays by
shape in traversal order, the same contract the reference serializer uses
(sequential module walk).
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def _flatten_with_paths(tree: Any, prefix=()) -> List:
    import jax

    leaves = []

    def rec(t, p):
        if isinstance(t, dict):
            for k in sorted(t.keys()):
                rec(t[k], p + (k,))
        else:
            leaves.append((p, t))

    rec(tree, prefix)
    return leaves


def import_convlm(
    torch_path: str, lm_params: Dict, transpose_linear: bool = True
) -> Dict:
    """Map torch tensors onto the LM param tree by shape, in order.

    torch Linear stores (out, in); ours is (in, out) — transposed when
    ``transpose_linear``. Raises if any parameter cannot be matched.
    """
    import jax.numpy as jnp

    src = list(load_torch_state_dict(torch_path).items())
    used = [False] * len(src)
    flat = _flatten_with_paths(lm_params)
    new = {}

    def match(shape):
        for i, (k, v) in enumerate(src):
            if used[i]:
                continue
            if v.shape == shape:
                used[i] = True
                return v
            if (
                transpose_linear
                and len(shape) == 2
                and v.ndim == 2
                and v.T.shape == shape
            ):
                used[i] = True
                return v.T
        return None

    out = lm_params
    import jax

    def assign(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = jnp.asarray(value)

    # deep-copy to plain dicts
    def to_dict(t):
        if isinstance(t, dict):
            return {k: to_dict(v) for k, v in t.items()}
        return t

    out = to_dict(lm_params)
    unmatched = []
    for path, leaf in _flatten_with_paths(out):
        v = match(tuple(np.shape(leaf)))
        if v is None:
            unmatched.append("/".join(path))
        else:
            assign(out, path, v)
    if unmatched:
        raise ValueError(f"unmatched LM params: {unmatched[:5]} (+{len(unmatched)-5 if len(unmatched)>5 else 0})")
    return out
