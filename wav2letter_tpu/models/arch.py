"""`.arch` DSL parser -> flax module graph.

Grammar: one layer per line, ``#`` comments, NFEAT/NLABEL substitution
(reference ``buildSequentialModule``, ``cpc/SequentialBuilder.cpp:29-57``;
full mnemonic set parsed at ``:92-626`` — see SURVEY.md §2.3).

The built model consumes features shaped (B, T, C) plus per-sample valid
lengths, converts to the stored AF-reversed layout (B, 1, C, T) == AF
(T, C, 1, B), runs the layer stack (threading the proportional pad-fraction
mask exactly like ``forwardSequentialModuleWithPadMask``,
``SequentialBuilder.cpp:59-81``), and returns emissions (B, T_out, NLABEL)
with proportionally-scaled output lengths.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from . import layers as L
from .transformer import ConformerLayer, TransformerLayer

Array = jnp.ndarray


@dataclasses.dataclass
class LayerSpec:
    kind: str
    module_fn: Callable[[str], nn.Module]  # name -> module
    needs_mask: bool = False
    line: str = ""


def _num(s: str) -> float:
    return float(s)


def _parse_dtype(s: str):
    m = {
        "f16": jnp.float16,
        "f32": jnp.float32,
        "f64": jnp.float64,
        "b8": jnp.bfloat16,
        "bf16": jnp.bfloat16,
    }
    if s not in m:
        raise ValueError(f"unknown dtype {s}")
    return m[s]


def parse_arch_file(path: str, n_feat: int, n_label: int) -> List[str]:
    with open(path) as f:
        raw = f.readlines()
    lines = []
    for l in raw:
        l = l.strip().replace("NFEAT", str(n_feat)).replace("NLABEL", str(n_label))
        if not l or l.startswith("#"):
            continue
        lines.append(l)
    return lines


def _parse_one(tokens: List[str], line: str) -> LayerSpec:
    """Parse a single (non-RES) layer line into a LayerSpec."""
    op = tokens[0]
    p = tokens

    if op in ("V", "RO"):
        dims = tuple(int(x) for x in p[1:5])
        if op == "V":
            return LayerSpec("V", lambda nm: L.View(dims, name=nm), line=line)
        return LayerSpec("RO", lambda nm: L.Reorder(dims, name=nm), line=line)

    if op == "PD":
        val = _num(p[1])
        rest = [int(x) for x in p[2:]] + [0] * (8 - len(p[2:]))
        pads = tuple((rest[2 * i], rest[2 * i + 1]) for i in range(4))
        return LayerSpec("PD", lambda nm: L.Padding(val, pads, name=nm), line=line)

    if op == "TR":
        md, mlp, nh, csz = int(p[1]), int(p[2]), int(p[3]), int(p[4])
        do = _num(p[5])
        ld = _num(p[6]) if len(p) >= 7 else 0.0
        preln = bool(int(p[7])) if len(p) >= 8 else False
        fmask = bool(int(p[8])) if len(p) >= 9 else False
        return LayerSpec(
            "TR",
            lambda nm: TransformerLayer(md, mlp, nh, csz, do, ld, preln, fmask, name=nm),
            needs_mask=True,
            line=line,
        )

    if op == "CFR":
        md, mlp, nh, csz, kern = int(p[1]), int(p[2]), int(p[3]), int(p[4]), int(p[5])
        do = _num(p[6])
        ld = _num(p[7]) if len(p) >= 8 else 0.0
        # optional 9th operand (extension): conv-module norm, LN (default,
        # masked-streaming-safe) or BN (Conformer-paper batch norm, masked)
        cn = p[8].lower() if len(p) >= 9 else "ln"
        if cn not in ("ln", "bn", "layernorm", "batchnorm"):
            raise ValueError(f"CFR conv norm must be LN or BN, got {p[8]!r}: {line}")
        cn = {"ln": "layernorm", "bn": "batchnorm"}.get(cn, cn)
        return LayerSpec(
            "CFR",
            lambda nm: ConformerLayer(md, mlp, nh, csz, kern, do, ld, conv_norm=cn, name=nm),
            needs_mask=True,
            line=line,
        )

    if op == "POSEMB":
        ldim, csz = int(p[1]), int(p[2])
        do = _num(p[3]) if len(p) >= 4 else 0.0
        return LayerSpec(
            "POSEMB", lambda nm: L.PositionEmbedding(ldim, csz, do, name=nm), line=line
        )

    if op == "SINPOSEMB":
        ldim = int(p[1])
        sc = _num(p[2]) if len(p) >= 3 else 1.0
        return LayerSpec(
            "SINPOSEMB",
            lambda nm: L.SinusoidalPositionEmbedding(ldim, sc, name=nm),
            line=line,
        )

    if op in ("C", "C1"):
        ci, co, wx, sx = int(p[1]), int(p[2]), int(p[3]), int(p[4])
        px = int(p[5]) if len(p) >= 6 else 0
        dx = int(p[6]) if len(p) >= 7 else 1
        cb = bool(int(p[7])) if len(p) >= 8 else True
        cg = int(p[8]) if len(p) >= 9 else 1
        return LayerSpec(
            "C",
            lambda nm: L.Conv2D(ci, co, wx, 1, sx, 1, px, 0, dx, 1, cg, cb, name=nm),
            line=line,
        )

    if op == "C2":
        ci, co = int(p[1]), int(p[2])
        wx, wy, sx, sy = int(p[3]), int(p[4]), int(p[5]), int(p[6])
        px = int(p[7]) if len(p) >= 8 else 0
        py = int(p[8]) if len(p) >= 9 else 0
        dx = int(p[9]) if len(p) >= 10 else 1
        dy = int(p[10]) if len(p) >= 11 else 1
        return LayerSpec(
            "C2",
            lambda nm: L.Conv2D(ci, co, wx, wy, sx, sy, px, py, dx, dy, name=nm),
            line=line,
        )

    if op == "TDS":
        ci, wx, fdim = int(p[1]), int(p[2]), int(p[3])
        do = _num(p[4]) if len(p) >= 5 else 0.0
        l2 = int(p[5]) if len(p) >= 6 else 0
        rpad = int(p[6]) if len(p) >= 7 else -1
        lnt = not (len(p) >= 8 and int(p[7]) == 0)
        return LayerSpec(
            "TDS",
            lambda nm: L.TDSBlock(ci, wx, fdim, do, l2, rpad, lnt, name=nm),
            line=line,
        )

    if op == "AC":
        ci, co, wx, sx = int(p[1]), int(p[2]), int(p[3]), int(p[4])
        px = int(p[5]) if len(p) >= 6 else 0
        fpx = _num(p[6]) if len(p) >= 7 else 1.0
        dx = int(p[7]) if len(p) >= 8 else 1
        return LayerSpec(
            "AC",
            lambda nm: L.AsymmetricConv1D(ci, co, wx, sx, px, fpx, dx, name=nm),
            line=line,
        )

    if op == "L":
        li, lo = int(p[1]), int(p[2])
        bias = not (len(p) == 4 and p[3] == "0")
        return LayerSpec("L", lambda nm: L.Linear(li, lo, bias, name=nm), line=line)

    if op == "E":
        return LayerSpec(
            "E", lambda nm: L.Embedding(int(p[1]), int(p[2]), name=nm), line=line
        )

    if op == "ADAPTIVEE":
        embsz = int(p[1])
        cutoffs = tuple(int(c) for c in p[2].split(","))
        if list(cutoffs) != sorted(set(cutoffs)):
            raise ValueError(f"cutoffs must be strictly ascending: {line}")
        return LayerSpec(
            "ADAPTIVEE",
            lambda nm: L.AdaptiveEmbedding(embsz, cutoffs, name=nm),
            line=line,
        )

    if op == "BN":
        fsz = int(p[1])
        fdims = tuple(int(x) for x in p[2:])
        return LayerSpec("BN", lambda nm: L.BatchNorm(fdims, fsz, name=nm), line=line)

    if op == "LN":
        fdims = tuple(int(x) for x in p[1:])
        return LayerSpec("LN", lambda nm: L.LayerNorm(fdims, name=nm), line=line)

    if op == "WN":
        wdim = int(p[1])
        c = p[2:]
        if c[0] in ("C", "C1"):
            ci, co, wx, sx = int(c[1]), int(c[2]), int(c[3]), int(c[4])
            px = int(c[5]) if len(c) >= 6 else 0
            dx = int(c[6]) if len(c) >= 7 else 1
            cb = bool(int(c[7])) if len(c) >= 8 else True
            cg = int(c[8]) if len(c) >= 9 else 1
            return LayerSpec(
                "C",
                lambda nm: L.Conv2D(
                    ci, co, wx, 1, sx, 1, px, 0, dx, 1, cg, cb, wn_dim=wdim, name=nm
                ),
                line=line,
            )
        if c[0] == "C2":
            ci, co = int(c[1]), int(c[2])
            wx, wy, sx, sy = int(c[3]), int(c[4]), int(c[5]), int(c[6])
            px = int(c[7]) if len(c) >= 8 else 0
            py = int(c[8]) if len(c) >= 9 else 0
            dx = int(c[9]) if len(c) >= 10 else 1
            dy = int(c[10]) if len(c) >= 11 else 1
            return LayerSpec(
                "C2",
                lambda nm: L.Conv2D(
                    ci, co, wx, wy, sx, sy, px, py, dx, dy, wn_dim=wdim, name=nm
                ),
                line=line,
            )
        if c[0] == "AC":
            ci, co, wx, sx = int(c[1]), int(c[2]), int(c[3]), int(c[4])
            px = int(c[5]) if len(c) >= 6 else 0
            fpx = _num(c[6]) if len(c) >= 7 else 1.0
            dx = int(c[7]) if len(c) >= 8 else 1
            return LayerSpec(
                "AC",
                lambda nm: L.AsymmetricConv1D(
                    ci, co, wx, sx, px, fpx, dx, wn_dim=wdim, name=nm
                ),
                line=line,
            )
        if c[0] == "L":
            li, lo = int(c[1]), int(c[2])
            bias = not (len(c) == 4 and c[3] == "0")
            return LayerSpec(
                "WNL", lambda nm: WNLinear(li, lo, bias, wdim, name=nm), line=line
            )
        raise ValueError(f"WN wrapping unsupported child: {line}")

    if op == "DO":
        return LayerSpec("DO", lambda nm: L.Dropout(_num(p[1]), name=nm), line=line)

    if op in ("M", "A"):
        wx, wy, dx, dy = int(p[1]), int(p[2]), int(p[3]), int(p[4])
        px = int(p[5]) if len(p) > 5 else 0
        py = int(p[6]) if len(p) > 6 else 0
        mode = "avg" if op == "A" else "max"
        return LayerSpec(
            "POOL", lambda nm: L.Pool2D(wx, wy, dx, dy, px, py, mode, name=nm), line=line
        )

    if op in ("ELU", "R", "R6", "LG", "HT", "T"):
        return LayerSpec(op, lambda nm: L.Activation(op, name=nm), line=line)

    if op == "PR":
        npar = int(p[1]) if len(p) > 1 else 1
        iv = _num(p[2]) if len(p) > 2 else 0.25
        return LayerSpec("PR", lambda nm: L.PReLU(npar, iv, name=nm), line=line)

    if op in ("GLU", "LSM"):
        dim = int(p[1])
        return LayerSpec(op, lambda nm: L.Activation(op, dim, name=nm), line=line)

    if op == "SH":
        beta = _num(p[1]) if len(p) > 1 else 1.0
        return LayerSpec("SH", lambda nm: L.Activation("SH", beta=beta, name=nm), line=line)

    if op in ("RNN", "GRU", "LSTM"):
        mode = {"RNN": "relu", "GRU": "gru", "LSTM": "lstm"}[op]
        isz, osz = int(p[1]), int(p[2])
        nl = int(p[3]) if len(p) > 3 else 1
        bidir = (int(p[4]) > 0) if len(p) > 4 else False
        do = _num(p[5]) if len(p) > 5 else 0.0
        return LayerSpec(
            op, lambda nm: L.RNN(isz, osz, nl, mode, bidir, do, name=nm), line=line
        )

    if op == "SAUG":
        f, mf, t = int(p[1]), int(p[2]), int(p[3])
        tt, tp, mt = int(p[4]), _num(p[5]), int(p[6])
        return LayerSpec(
            "SAUG",
            lambda nm: L.SpecAugmentLayer(f, mf, tt, tp, mt, name=nm),
            line=line,
        )

    if op == "PC":
        dt = _parse_dtype(p[1])
        return LayerSpec("PC", lambda nm: L.PrecisionCast(dt, name=nm), line=line)

    raise ValueError(f"cannot parse arch line: {line!r}")


def parse_arch_lines(lines: List[str]) -> List[LayerSpec]:
    """Parse all lines including multi-line RES blocks."""
    specs: List[LayerSpec] = []
    i = 0
    while i < len(lines):
        tokens = lines[i].split()
        if tokens[0] == "RES":
            n_res = int(tokens[1])
            n_skip = int(tokens[2])
            n_blocks = int(tokens[3]) if len(tokens) == 4 else 1
            spec, consumed = _parse_res_block(lines, i, n_res, n_skip)
            for _ in range(max(1, n_blocks)):
                specs.append(spec)
            i += consumed + 1
        else:
            specs.append(_parse_one(tokens, lines[i]))
            i += 1
    if _chain_tconv_enabled():
        fused = _fuse_chain_tconv(specs)
        if fused is not None:
            return fused
    return _fuse_tds_layouts(specs)


def _chain_tconv_enabled() -> bool:
    """Pallas chain-layout fusion gate (W2L_TCONV=1). Off by default:
    pallas_call does not auto-partition under pjit, so the multi-chip DP
    path keeps the XLA conv graph; bench/single-chip runs opt in."""
    return os.environ.get("W2L_TCONV", "") not in ("", "0", "off", "false")


def _chain_member(s: LayerSpec):
    """Classify a spec for Pallas-chain eligibility. Returns a tag or None."""
    t = s.line.split()
    if s.kind == "PD":
        rest = [int(x) for x in t[2:]] + [0] * 8
        if _num(t[1]) == 0 and all(v == 0 for v in rest[2:8]):
            return "PD"
        return None
    if s.kind == "C2":
        wy, sy = int(t[4]), int(t[6])
        px = int(t[7]) if len(t) >= 8 else 0
        py = int(t[8]) if len(t) >= 9 else 0
        dx = int(t[9]) if len(t) >= 10 else 1
        dy = int(t[10]) if len(t) >= 11 else 1
        if wy == 1 and sy == 1 and py == 0 and dx == 1 and dy == 1 and px >= 0:
            return "C2"
        return None
    if s.kind in ("R", "DO"):
        return s.kind
    if s.kind == "LN":
        if tuple(int(x) for x in t[1:]) == (1, 2):
            return "LN"
        return None
    if s.kind == "TDS":
        lnt = not (len(t) >= 8 and int(t[7]) == 0)
        return None if lnt else "TDS"
    return None


def _fuse_chain_tconv(specs: List[LayerSpec]):
    """Pallas chain fusion: maximal runs of {PD, 1-D C2, R, DO, per-frame LN,
    per-frame-LN TDS} execute in the contiguous f-major (B, T, F*C) layout
    with the ops.pallas.tconv time-conv kernel — no stored-layout transposes
    or XLA conv re-layouts anywhere inside a run (BENCH.md: 23.9 ms/step of
    such copies on the flagship streaming TDS bench). Params (names, shapes,
    C-major feature order) are identical to the unfused graph: PD merges its
    time pads into the following conv and becomes Identity; LN(1,2) becomes
    the per-frame LayerNorm((0,)) with the same scalar affine.

    Returns the new spec list, or None if no run is worth fusing."""
    tags = [_chain_member(s) for s in specs]
    out = list(specs)
    any_fused = False
    i = 0
    n = len(specs)
    while i < n:
        if tags[i] is None:
            i += 1
            continue
        j = i
        while j + 1 < n and tags[j + 1] is not None:
            j += 1
        # trim: start at first PD/C2/TDS, end at last TDS
        a, b = i, j
        while a <= b and tags[a] in ("R", "DO", "LN"):
            a += 1
        while b >= a and tags[b] != "TDS":
            b -= 1
        if b - a < 1 or sum(1 for r in range(a, b + 1) if tags[r] == "TDS") < 2:
            i = j + 1
            continue
        any_fused = True
        pend = (0, 0)
        entered = False
        for r in range(a, b + 1):
            s, tag = out[r], tags[r]
            t = s.line.split()
            if tag == "PD":
                rest = [int(x) for x in t[2:]] + [0, 0]
                pend = (pend[0] + rest[0], pend[1] + rest[1])
                out[r] = LayerSpec(
                    "PD", lambda nm: L.Identity(name=nm), line=s.line)
            elif tag == "C2":
                ci, co = int(t[1]), int(t[2])
                wx, sx = int(t[3]), int(t[5])
                px = int(t[7]) if len(t) >= 8 else 0
                pads = (pend[0] + px, pend[1] + px)
                pend = (0, 0)
                out[r] = LayerSpec(
                    "C2",
                    (lambda nm, ci=ci, co=co, wx=wx, sx=sx, pads=pads:
                     L.Conv2D(ci, co, wx, 1, sx, 1, pads, 0,
                              data_layout="btdf", name=nm)),
                    line=s.line,
                )
                entered = True
            elif tag == "LN":
                out[r] = LayerSpec(
                    "LN", lambda nm: L.LayerNorm((0,), name=nm), line=s.line)
            elif tag == "TDS":
                ci, wx, fdim = int(t[1]), int(t[2]), int(t[3])
                do = _num(t[4]) if len(t) >= 5 else 0.0
                l2 = int(t[5]) if len(t) >= 6 else 0
                rpad = int(t[6]) if len(t) >= 7 else -1
                il = "btdf" if entered else "ncft"
                ol = "ncft" if r == b else "btdf"
                out[r] = LayerSpec(
                    "TDS",
                    (lambda nm, ci=ci, wx=wx, fdim=fdim, do=do, l2=l2,
                            rpad=rpad, il=il, ol=ol:
                     L.TDSBlock(ci, wx, fdim, do, l2, rpad, False,
                                in_layout=il, out_layout=ol, name=nm)),
                    line=s.line,
                )
                entered = True
            # R / DO stay as parsed (elementwise, shape-agnostic)
        i = j + 1
    return out if any_fused else None


def _fuse_tds_layouts(specs: List[LayerSpec]) -> List[LayerSpec]:
    """Layout-fusion pass: runs of >=2 consecutive per-frame-LN TDS blocks
    with identical (channels, freq) execute chained in the contiguous
    (B, T, C*F) layout — the boundary blocks convert; interior blocks skip
    4 full-activation transposes each (13% measured step win on v5e)."""

    def tds_key(s: LayerSpec):
        if s.kind != "TDS":
            return None
        t = s.line.split()
        lnt = not (len(t) >= 8 and int(t[7]) == 0)
        if lnt:
            return None  # time-inclusive LN cannot fuse
        return (int(t[1]), int(t[3]))  # (channels, freq)

    out = list(specs)
    i = 0
    while i < len(out):
        k = tds_key(out[i])
        if k is None:
            i += 1
            continue
        j = i
        while j + 1 < len(out) and tds_key(out[j + 1]) == k:
            j += 1
        # measured on v5e: boundary conversions cost ~1 transpose-pair, so
        # fusion only pays for runs of >= 4 blocks (short runs regress)
        if j - i + 1 >= 4:
            for r in range(i, j + 1):
                t = out[r].line.split()
                ci, wx, fdim = int(t[1]), int(t[2]), int(t[3])
                do = _num(t[4]) if len(t) >= 5 else 0.0
                l2 = int(t[5]) if len(t) >= 6 else 0
                rpad = int(t[6]) if len(t) >= 7 else -1
                il = "ncft" if r == i else "btd"
                ol = "ncft" if r == j else "btd"
                out[r] = LayerSpec(
                    "TDS",
                    (lambda nm, ci=ci, wx=wx, fdim=fdim, do=do, l2=l2,
                            rpad=rpad, il=il, ol=ol:
                     L.TDSBlock(ci, wx, fdim, do, l2, rpad, False,
                                in_layout=il, out_layout=ol, name=nm)),
                    line=out[r].line,
                )
        i = j + 1
    return out


def _parse_res_block(
    lines: List[str], idx: int, n_res: int, n_skip: int
) -> Tuple[LayerSpec, int]:
    """Reference residualBlock parsing (``SequentialBuilder.cpp:525-599``)."""
    layer_specs: List[LayerSpec] = []
    shortcuts: List[Tuple[int, int, Optional[List[LayerSpec]]]] = []
    scales: dict = {}
    n_proj = 0
    i = 1
    while i <= n_res + n_skip:
        line = lines[idx + i + n_proj]
        toks = line.split()
        if toks[0] == "SKIP":
            f, t = int(toks[1]), int(toks[2])
            shortcuts.append((f, t, None))
            if len(toks) == 4:
                scales[t] = float(toks[3])
        elif toks[0] == "SKIPL":
            f, t, npl = int(toks[1]), int(toks[2]), int(toks[3])
            proj = []
            for j in range(1, npl + 1):
                pl = lines[idx + i + n_proj + j]
                proj.append(_parse_one(pl.split(), pl))
            shortcuts.append((f, t, proj))
            if len(toks) == 5:
                scales[t] = float(toks[4])
            n_proj += npl
        else:
            layer_specs.append(_parse_one(toks, line))
        i += 1
    consumed = n_res + n_skip + n_proj

    def make(nm):
        mods = [s.module_fn(f"{nm}_l{k}") for k, s in enumerate(layer_specs)]
        scs = []
        for si, (f, t, proj) in enumerate(shortcuts):
            pm = None
            if proj is not None:
                pmods = [s.module_fn(f"{nm}_s{si}p{k}") for k, s in enumerate(proj)]
                pm = SeqModule(tuple(pmods), name=f"{nm}_s{si}")
            scs.append((f, t, pm))
        return L.ResidualBlock(tuple(mods), tuple(scs), scales, name=nm)

    return LayerSpec("RES", make, line=lines[idx]), consumed


class WNLinear(nn.Module):
    """Weight-normalized Linear (arch ``WN 0 L in out``); norm over AF dim
    `wn_dim` of the AF (out, in) weight."""

    in_dim: int
    out_dim: int
    use_bias: bool = True
    wn_dim: int = 0

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        import math

        bound = 1.0 / math.sqrt(self.in_dim)
        # stored weight (in, out); AF weight is (out, in): AF dim0=out is
        # stored axis 1. WN 0 -> norm computed per output unit over inputs.
        v = self.param(
            "v",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.in_dim, self.out_dim),
        )
        norm_axis = 0 if self.wn_dim == 0 else 1
        g = self.param(
            "g",
            lambda k, s: jnp.linalg.norm(v, axis=norm_axis).reshape(s),
            (self.out_dim,) if norm_axis == 0 else (self.in_dim,),
        )
        nrm = jnp.sqrt(jnp.sum(v * v, axis=norm_axis, keepdims=True) + 1e-12)
        if norm_axis == 0:
            w = v / nrm * g[None, :]
        else:
            w = v / nrm * g[:, None]
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                (self.out_dim,),
            )
            y = y + b.astype(x.dtype)
        return y


class SeqModule(nn.Module):
    mods: Tuple[nn.Module, ...]

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        for m in self.mods:
            x = L._apply(m, x, mask, train)
        return x


class ArchSequential(nn.Module):
    """The compiled arch: threads activations + proportional pad fraction."""

    specs: Tuple[LayerSpec, ...]

    @nn.compact
    def __call__(
        self,
        x: Array,  # stored 4-d, (B, 1, C, T) at entry
        pad_frac: Optional[Array] = None,  # (B,) fraction of valid frames
        train: bool = False,
    ) -> Array:
        for i, spec in enumerate(self.specs):
            mod = spec.module_fn(f"{i:02d}_{spec.kind}")
            mask = None
            if spec.needs_mask and pad_frac is not None:
                T = x.shape[-2]  # transformer layout (…, T, C)
                valid = jnp.ceil(pad_frac * T).astype(jnp.int32)
                mask = jnp.arange(T)[None, :] < valid[:, None]  # (B, T)
                # broadcast mask to x's leading axes: standard archs reach
                # TR as (1, B, T, C) (RO 2 0 3 1); a (B, 1, T, C) view
                # (V 240 -1 1 0 style) puts batch first instead.
                if x.ndim == 4:
                    mask = mask[:, None] if x.shape[1] == 1 else mask[None]
            x = L._apply(mod, x, mask, train)
        return x


class ArchModel(nn.Module):
    """User-facing acoustic model: (B, T, C) features -> (B, T_out, N).

    ``force_label_dim=False`` for s2s encoders: keyvalue-attention archs
    hard-code an output of 2x encoderdim (e.g. ``L 1440 1024`` in
    am_tds_s2s.arch with --encoderdim=512), so the canonicalizing reshape
    to ``n_label`` must not run (it would silently halve the feature dim
    by folding it into time)."""

    specs: Tuple[LayerSpec, ...]
    n_label: int
    force_label_dim: bool = True

    @nn.compact
    def __call__(
        self,
        feats: Array,  # (B, T, C)
        feat_len: Optional[Array] = None,
        train: bool = False,
    ):
        B, T, C = feats.shape
        if feat_len is None:
            feat_len = jnp.full((B,), T, jnp.int32)
        pad_frac = feat_len.astype(jnp.float32) / T
        # (B, T, C) -> AF (T, C, 1, B) == stored (B, 1, C, T)
        x = feats.transpose(0, 2, 1)[:, None]  # (B, 1, C, T)
        y = ArchSequential(self.specs, name="seq")(x, pad_frac, train)
        # canonicalize output to (B, T_out, N). The batch dim can land on
        # any axis after V/RO lines, so squeeze the 1-dims and anchor on B —
        # with the B == 1 case handled explicitly (it used to fall through
        # to the n_label reshape, folding the feature dim into time for
        # archs whose output dim != n_label, e.g. keyvalue s2s encoders).
        sq = [d for d in y.shape if d != 1]
        if len(sq) == 3 and sq[0] == B:
            y = y.reshape(sq)
        elif len(sq) == 2 and B == 1:
            y = y.reshape((1,) + tuple(sq))
        else:
            y = y.reshape((B, -1, self.n_label))
        if y.shape[0] != B:
            raise ValueError(f"unexpected arch output shape {y.shape}")
        if self.force_label_dim and y.shape[-1] != self.n_label:
            y = y.reshape((B, -1, self.n_label))
        t_out = y.shape[1]
        out_len = jnp.ceil(pad_frac * t_out).astype(jnp.int32)
        return y, out_len


def build_arch_module(
    arch_path: str, n_feat: int, n_label: int, force_label_dim: bool = True
) -> ArchModel:
    lines = parse_arch_file(arch_path, n_feat, n_label)
    specs = tuple(parse_arch_lines(lines))
    return ArchModel(specs, n_label, force_label_dim)


def build_arch_from_lines(lines: Sequence[str], n_label: int) -> ArchModel:
    specs = tuple(parse_arch_lines(list(lines)))
    return ArchModel(specs, n_label)
