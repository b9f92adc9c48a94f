"""Model plugin path — the TPU-native analog of the reference's compiled C++
plugin `.so` exposing ``extern "C" fl::Module* createModule(int64_t nFeat,
int64_t nLabel)`` (``recipes/mling_pl/mling_large.cpp:124-127``; used via
``--arch=arch.so``, ``recipes/slimIPL/README.md:12,66``).

Here a plugin is a Python file or module exposing
``create_module(n_feat: int, n_label: int) -> flax.linen.Module`` whose
module maps (feats (B,T,C), feat_len, train=) -> (emissions (B,T,N), out_len).
Load with ``--arch=path/to/plugin.py`` or ``--arch=package.module:attr``.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
from typing import Any


def load_plugin_module(spec: str, n_feat: int, n_label: int) -> Any:
    if spec.endswith(".py"):
        name = os.path.splitext(os.path.basename(spec))[0]
        mspec = importlib.util.spec_from_file_location(f"w2l_plugin_{name}", spec)
        mod = importlib.util.module_from_spec(mspec)
        mspec.loader.exec_module(mod)
    else:
        modname, _, attr = spec.partition(":")
        mod = importlib.import_module(modname)
        if attr:
            mod = getattr(mod, attr)
    fn = getattr(mod, "create_module", None)
    if fn is None:
        raise ValueError(f"plugin {spec!r} does not define create_module(n_feat, n_label)")
    return fn(n_feat, n_label)
