"""Flagship-arch streaming-vs-batch divergence repro (no training needed).

Builds the streaming_convnets flagship arch (4 chained future-context PD/C2
stages at stride 8 overall, 80 filterbanks) with RANDOM params, runs the
batch forward and the chunked streaming forward on the same features, and
reports max-abs divergence — overall and per-prefix-of-arch to localize the
first diverging layer.

Usage: JAX_PLATFORMS=cpu python tools/diag_flagship_stream.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from wav2letter_tpu.inference.convert import build_streaming_network
from wav2letter_tpu.models.arch import build_arch_from_lines

NFEAT = 80
NLABEL = 30

ARCH = [l for l in open(
    os.path.join(os.path.dirname(__file__), "..",
                 "recipes/streaming_convnets/network.arch"))
        if l.strip() and not l.strip().startswith("#")]
ARCH = [l.replace("NFEAT", str(NFEAT)).replace("NLABEL", str(NLABEL)).strip()
        for l in ARCH]


def run_batch(m, params, feats):
    y, _ = m.apply(params, jnp.asarray(feats), jnp.asarray([feats.shape[1]]))
    return np.asarray(y)[0]


def run_streaming(net, feats, chunk_frames):
    states = net.start(1)
    outs = []
    T = feats.shape[1]
    for s in range(0, T, chunk_frames):
        chunk = feats[:, s:s + chunk_frames]
        x = jnp.asarray(chunk)[..., None]  # (1, n, F, 1)
        states, y = net.run(states, x)
        if y.shape[1]:
            outs.append(np.asarray(y))
    states, y = net.finish(states)
    if y is not None and y.shape[1]:
        outs.append(np.asarray(y))
    if not outs:
        return np.zeros((0,))
    out = np.concatenate(outs, axis=1)
    return out[0, :, 0, :] if out.ndim == 4 else out[0]


def prefix_archs():
    """Yield (desc, arch-prefix + flatten/linear tail) to localize divergence.

    A prefix ends after each R / TDS / LN line; we append the RO/V/L tail so
    both paths produce comparable (T, NLABEL)-shaped outputs... actually for
    localization just compare the raw 4-D activations, no tail needed: the
    streaming net for the prefix simply has fewer layers.
    """
    idxs = [i for i, l in enumerate(ARCH)
            if l.split()[0] in ("R", "TDS", "LN", "L")]
    for i in idxs:
        yield ARCH[: i + 1]


def compare(lines, chunk, seed=0, T=300, raw=False):
    m = build_arch_from_lines(lines, NLABEL)
    x0 = jnp.zeros((1, T, NFEAT))
    params = m.init({"params": jax.random.PRNGKey(seed)}, x0,
                    jnp.asarray([T]))
    net = build_streaming_network(lines, NFEAT, params["params"])
    feats = np.random.RandomState(1).randn(1, T, NFEAT).astype(np.float32)
    if raw:
        # raw stored-layout (B, C, F, T) activations of the prefix
        from wav2letter_tpu.models.arch import ArchSequential, parse_arch_lines
        import flax.linen as nn

        class Raw(nn.Module):
            specs: tuple

            @nn.compact
            def __call__(self, f):
                x = f.transpose(0, 2, 1)[:, None]
                pf = jnp.ones((f.shape[0],), jnp.float32)
                return ArchSequential(self.specs, name="seq")(x, pf, False)

        rm = Raw(tuple(parse_arch_lines(list(lines))))
        b = np.asarray(rm.apply(params, jnp.asarray(feats)))[0]
    else:
        b = run_batch(m, params, feats)
    sts = net.start(1)
    outs = []
    for st in range(0, T, chunk):
        ch = jnp.asarray(feats[:, st:st + chunk])[..., None]
        sts, y = net.run(sts, ch)
        if y.shape[1]:
            outs.append(np.asarray(y))
    sts, y = net.finish(sts)
    if y is not None and y.shape[1]:
        outs.append(np.asarray(y))
    s = np.concatenate(outs, axis=1) if outs else np.zeros((1, 0))
    if raw:  # batch (C, F, T) vs stream (1, T, F, C)
        b = b.transpose(2, 1, 0)
        s = s[0]
    else:
        s = s[0, :, 0, :] if s.ndim == 4 else s[0]
    shape_ok = s.shape == b.shape
    if not shape_ok:
        return False, f"SHAPE stream={s.shape} batch={b.shape}", None
    d = float(np.max(np.abs(s - b))) if s.size else 0.0
    return d < 1e-3, f"maxabs={d:.3e}", d


def main():
    T = 300
    print(f"arch: {len(ARCH)} lines, T={T}, chunk=50 frames (500ms)")
    # full arch first
    ok, msg, _ = compare(ARCH, 50, T=T)
    print(f"FULL ARCH: {'OK' if ok else 'DIVERGES'} {msg}")
    if not ok:
        print("\n-- localizing (prefix sweep) --")
        for lines in prefix_archs():
            ok, msg, _ = compare(lines, 50, T=T, raw=lines[-1].split()[0] != "L")
            print(f"  {'OK ' if ok else 'BAD'} {msg}  last={lines[-1]!r} "
                  f"({len(lines)} lines)")
            if not ok:
                break


if __name__ == "__main__":
    main()
