"""Training checkpoint -> streaming inference bundle.

The reference converter (``StreamingTDSModelConverter.cpp:140-334``) loads a
training checkpoint, walks the `.arch` lines (C2/PD/R/LN/L/TDS; skips
V/RO/DO/SAUG), maps each module's ``fl::Variable`` params into streaming
modules, and emits ``acoustic_model.bin`` + ``feature_extractor.bin`` +
``tokens.txt`` + ``transitions.bin`` (ASG).

Here the same walk maps the flax param tree of an ``ArchModel`` into the
flat param dict of a ``StreamingNetwork``; the bundle is one msgpack file
holding {streaming params, layer specs, feature config, tokens, transitions}.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
from flax import serialization

from ..config import Config
from ..features.frontend import FeatureParams
from ..models.arch import parse_arch_file, parse_arch_lines
from .streaming import (
    StreamConv,
    StreamLayer,
    StreamPointwise,
    StreamTDS,
    StreamingNetwork,
)

BUNDLE_MAGIC = b"W2LSTRM1"


def build_streaming_layers(
    lines: List[str], n_feat: int
) -> Tuple[List[StreamLayer], List[Tuple[str, str]]]:
    """Walk arch lines -> streaming layers + (layer_name, arch_index) map.

    Returns layers and a list of (stream_name, flax_child_name) pairs for
    parameter mapping. Mirrors the reference converter dispatch
    (``StreamingTDSModelConverter.cpp:208-284``).
    """
    specs = parse_arch_lines(lines)
    layers: List[StreamLayer] = []
    pmap: List[Tuple[str, str]] = []
    pending_pad = (0, 0)
    freq_dim = n_feat
    channels = 1
    for i, spec in enumerate(specs):
        kind = spec.kind
        child = f"{i:02d}_{kind}"
        toks = spec.line.split()
        if kind in ("V", "RO", "DO", "SAUG"):
            continue
        if kind == "PD":
            # PD val l0 r0 [l1 r1 ...] — time pads are dim0
            vals = [int(x) for x in toks[2:]]
            pending_pad = (vals[0], vals[1] if len(vals) > 1 else 0)
            continue
        if kind == "C2":
            ci, co = int(toks[1]), int(toks[2])
            kw, kh, sx, sy = int(toks[3]), int(toks[4]), int(toks[5]), int(toks[6])
            px = int(toks[7]) if len(toks) >= 8 else 0
            py = int(toks[8]) if len(toks) >= 9 else 0
            pl, pr = pending_pad
            pl, pr = pl + px, pr + px
            name = f"l{i}_conv"
            layers.append(
                StreamConv(
                    name, ci, co, kw, kh, sx, pl, pr,
                    freq_dim=freq_dim, freq_stride=sy, freq_pad=py,
                )
            )
            pmap.append((name, child))
            freq_dim = (freq_dim + 2 * py - kh) // sy + 1
            channels = co
            pending_pad = (0, 0)
            continue
        if kind == "C":
            # 1-D conv over time: AF (T,1,C,B); freq dim is 1
            ci, co = int(toks[1]), int(toks[2])
            kw, sx = int(toks[3]), int(toks[4])
            px = int(toks[5]) if len(toks) >= 6 else 0
            pl, pr = pending_pad
            name = f"l{i}_conv"
            layers.append(
                StreamConv(name, ci, co, kw, 1, sx, pl + px, pr + px, freq_dim=1)
            )
            pmap.append((name, child))
            channels = co
            pending_pad = (0, 0)
            continue
        if kind == "AC":
            # asymmetric (future-limited) 1-D conv: pad split by future
            # fraction matches models.layers.AsymmetricConv1D exactly
            ci, co = int(toks[1]), int(toks[2])
            kw, sx = int(toks[3]), int(toks[4])
            px = int(toks[5]) if len(toks) >= 6 else 0
            fpx = float(toks[6]) if len(toks) >= 7 else 1.0
            dx = int(toks[7]) if len(toks) >= 8 else 1
            if dx != 1:
                raise ValueError(f"streaming AC with dilation unsupported: {spec.line}")
            # pad split replicates models.layers.AsymmetricConv1D
            if px == -1:
                total = kw - 1
                right = int(round(fpx * total))
            else:
                total = 2 * px
                right = int(round(fpx * total / 2.0))
            left = total - right
            plp, prp = pending_pad
            name = f"l{i}_conv"
            layers.append(
                StreamConv(name, ci, co, kw, 1, sx, plp + left, prp + right,
                           freq_dim=1)
            )
            pmap.append((name, child))
            channels = co
            pending_pad = (0, 0)
            continue
        if kind == "TDS":
            c, w, f = int(toks[1]), int(toks[2]), int(toks[3])
            rpad = int(toks[6]) if len(toks) >= 7 else -1
            lnt = not (len(toks) >= 8 and int(toks[7]) == 0)
            name = f"l{i}_tds"
            layers.append(StreamTDS(name, c, w, f, rpad, lnt))
            pmap.append((name, child))
            continue
        if kind == "R":
            layers.append(StreamPointwise(f"l{i}_relu", "relu"))
            continue
        if kind == "LN":
            name = f"l{i}_ln"
            layers.append(StreamPointwise(name, "ln"))
            pmap.append((name, child))
            continue
        if kind in ("L", "WNL"):
            name = f"l{i}_lin"
            layers.append(StreamPointwise(name, "linear"))
            pmap.append((name, child))
            continue
        raise ValueError(
            f"layer {kind!r} is not streamable (reference converter supports "
            f"C/C2/PD/R/LN/L/TDS): {spec.line}"
        )
    return layers, pmap


def map_params(
    pmap: List[Tuple[str, str]], arch_params: Dict
) -> Dict[str, np.ndarray]:
    """flax ArchModel param tree -> flat streaming param dict."""
    seq = arch_params["seq"] if "seq" in arch_params else arch_params
    out: Dict[str, np.ndarray] = {}
    for sname, child in pmap:
        p = seq[child]
        if sname.endswith("_conv"):
            if "conv" in p:  # AsymmetricConv1D wraps an inner Conv2D
                p = p["conv"]
            if "v" in p:  # weight-normed conv
                v, g = np.asarray(p["v"]), np.asarray(p["g"])
                nrm = np.sqrt((v ** 2).sum(axis=(1, 2, 3), keepdims=True) + 1e-12)
                out[f"{sname}_w"] = (g * v / nrm).astype(np.float32)
            else:
                out[f"{sname}_w"] = np.asarray(p["weight"])
            if "bias" in p:
                out[f"{sname}_b"] = np.asarray(p["bias"])
        elif sname.endswith("_tds"):
            out[f"{sname}_conv_w"] = np.asarray(p["conv"]["weight"])
            out[f"{sname}_conv_b"] = np.asarray(p["conv"]["bias"])
            for ln in ("ln1", "ln2"):
                out[f"{sname}_{ln}_w"] = np.asarray(p[ln]["weight"])
                out[f"{sname}_{ln}_b"] = np.asarray(p[ln]["bias"])
            for lin in ("lin1", "lin2"):
                out[f"{sname}_{lin}_w"] = np.asarray(p[lin]["weight"])
                out[f"{sname}_{lin}_b"] = np.asarray(p[lin]["bias"])
        elif sname.endswith("_ln"):
            out[f"{sname}_w"] = np.asarray(p["weight"])
            out[f"{sname}_b"] = np.asarray(p["bias"])
        elif sname.endswith("_lin"):
            if "v" in p:
                v, g = np.asarray(p["v"]), np.asarray(p["g"])
                nrm = np.sqrt((v ** 2).sum(axis=0, keepdims=True) + 1e-12)
                out[f"{sname}_w"] = (v / nrm * g[None, :]).astype(np.float32)
            else:
                out[f"{sname}_w"] = np.asarray(p["weight"])
            if "bias" in p:
                out[f"{sname}_b"] = np.asarray(p["bias"])
    return out


def build_streaming_network(
    lines: List[str], n_feat: int, arch_params: Dict
) -> StreamingNetwork:
    layers, pmap = build_streaming_layers(lines, n_feat)
    params = map_params(pmap, arch_params)
    return StreamingNetwork(layers, params)


def convert_checkpoint(ckpt_path: str, out_path: str) -> str:
    """Training checkpoint -> streaming bundle file (the analog of the
    acoustic_model.bin + feature_extractor.bin + tokens + transitions set)."""
    from ..runtime.checkpoint import load_checkpoint

    ckpt = load_checkpoint(ckpt_path)
    cfg = Config.deserialize(ckpt.config)
    arch_path = os.path.join(cfg.archdir, cfg.arch) if cfg.archdir else cfg.arch
    n_feat = cfg.num_features()
    # token dict size: reconstruct like training did
    from ..data.dictionary import make_token_dict

    tokens_path = os.path.join(cfg.tokensdir, cfg.tokens) if cfg.tokensdir else cfg.tokens
    tok = make_token_dict(tokens_path, cfg.criterion, cfg.replabel, cfg.eostoken)
    lines = parse_arch_file(arch_path, n_feat, len(tok))
    layers, pmap = build_streaming_layers(lines, n_feat)
    params = map_params(pmap, ckpt.model_params)
    payload = {
        "arch_lines": lines,
        "n_feat": n_feat,
        "params": params,
        "feature_cfg": {
            "sample_rate": cfg.samplerate,
            "frame_size_ms": cfg.framesizems,
            "frame_stride_ms": cfg.framestridems,
            "n_filterbanks": cfg.filterbanks,
            "local_norm_left": cfg.localnrmlleftctx,
            "local_norm_right": cfg.localnrmlrightctx,
        },
        "tokens": tok.entries(),
        "criterion": cfg.criterion,
        "replabel": cfg.replabel,
        "wordseparator": cfg.wordseparator,
        "transitions": (
            np.asarray(ckpt.crit_params["transitions"])
            if cfg.criterion == "asg" and ckpt.crit_params
            else None
        ),
    }
    blob = serialization.msgpack_serialize(
        {k: v for k, v in payload.items() if v is not None}
    )
    with open(out_path, "wb") as f:
        f.write(BUNDLE_MAGIC)
        f.write(blob)
    return out_path


def load_streaming_bundle(path: str):
    with open(path, "rb") as f:
        if f.read(8) != BUNDLE_MAGIC:
            raise ValueError(f"{path}: not a streaming bundle")
        payload = serialization.msgpack_restore(f.read())
    layers, pmap = build_streaming_layers(
        [str(l) for l in payload["arch_lines"]], int(payload["n_feat"])
    )
    net = StreamingNetwork(layers, payload["params"])
    fp = payload["feature_cfg"]
    feat = FeatureParams(
        sample_rate=int(fp["sample_rate"]),
        frame_size_ms=float(fp["frame_size_ms"]),
        frame_stride_ms=float(fp["frame_stride_ms"]),
        n_filterbanks=int(fp["n_filterbanks"]),
        local_norm_left=int(fp["local_norm_left"]),
        local_norm_right=int(fp["local_norm_right"]),
    )
    return net, feat, payload
