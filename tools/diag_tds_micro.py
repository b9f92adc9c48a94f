"""Micro-bisect: which TDS configuration breaks streaming equivalence."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from wav2letter_tpu.inference.convert import build_streaming_network
from wav2letter_tpu.models.arch import ArchSequential, parse_arch_lines, build_arch_from_lines
import flax.linen as nn


def check(lines, nfeat, chunk=50, T=200, seed=0):
    class Raw(nn.Module):
        specs: tuple

        @nn.compact
        def __call__(self, f):
            x = f.transpose(0, 2, 1)[:, None]
            pf = jnp.ones((f.shape[0],), jnp.float32)
            return ArchSequential(self.specs, name="seq")(x, pf, False)

    m = build_arch_from_lines(lines, 8)
    x0 = jnp.zeros((1, T, nfeat))
    params = m.init({"params": jax.random.PRNGKey(seed)}, x0, jnp.asarray([T]))
    rm = Raw(tuple(parse_arch_lines(list(lines))))
    feats = np.random.RandomState(1).randn(1, T, nfeat).astype(np.float32)
    b = np.asarray(rm.apply(params, jnp.asarray(feats)))[0].transpose(2, 1, 0)
    net = build_streaming_network(lines, nfeat, params["params"])
    states = net.start(1)
    outs = []
    for s in range(0, T, chunk):
        ch = jnp.asarray(feats[:, s:s + chunk])[..., None]
        states, y = net.run(states, ch)
        if y.shape[1]:
            outs.append(np.asarray(y))
    states, y = net.finish(states)
    if y is not None and y.shape[1]:
        outs.append(np.asarray(y))
    sarr = np.concatenate(outs, axis=1)[0]
    if sarr.shape != b.shape:
        return f"SHAPE {sarr.shape} vs {b.shape}"
    return f"maxabs={np.max(np.abs(sarr - b)):.3e}"


BASE = ["V -1 {nf} 1 0", "PD 0 6 2", "C2 1 {c} 9 1 2 1 0 0", "R", "LN 1 2",
        "TDS {c} {k} {nf} 0.0 0 {rp} 0"]

for nf, c, k, rp in [(80, 16, 9, 1), (16, 6, 7, 2), (80, 6, 7, 2),
                     (16, 16, 9, 1), (16, 6, 9, 1), (16, 6, 7, 1),
                     (80, 16, 7, 2)]:
    lines = [l.format(nf=nf, c=c, k=k, rp=rp) for l in BASE]
    print(f"nf={nf} c={c} k={k} rp={rp}: {check(lines, nf)}")

# no preceding conv stage: TDS alone on C-channel input via view
print("\n-- TDS alone (no conv stage) --")
for nf, c, k, rp in [(80, 16, 9, 1), (16, 6, 7, 2)]:
    # input (B,T,nf*c)? simpler: V -1 nf c 0 forms (B?, ...) — use V -1 F C
    lines = [f"V -1 {nf} {c} 0", f"TDS {c} {k} {nf} 0.0 0 {rp} 0"]
    print(f"nf={nf} c={c} k={k} rp={rp}: {check(lines, nf * c)}")
