"""Per-frame divergence profile for the failing TDS streaming config."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from wav2letter_tpu.inference.convert import build_streaming_network
from wav2letter_tpu.models.arch import (
    ArchSequential, parse_arch_lines, build_arch_from_lines,
)

nfeat, c, k, rp = 16, 6, 7, 2
T, chunk = 200, 50
lines = [f"V -1 {nfeat} 1 0", "PD 0 6 2", f"C2 1 {c} 9 1 2 1 0 0", "R",
         "LN 1 2", f"TDS {c} {k} {nfeat} 0.0 0 {rp} 0"]


class Raw(nn.Module):
    specs: tuple

    @nn.compact
    def __call__(self, f):
        x = f.transpose(0, 2, 1)[:, None]
        pf = jnp.ones((f.shape[0],), jnp.float32)
        return ArchSequential(self.specs, name="seq")(x, pf, False)


m = build_arch_from_lines(lines, 8)
params = m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, T, nfeat)),
                jnp.asarray([T]))
rm = Raw(tuple(parse_arch_lines(list(lines))))
feats = np.random.RandomState(1).randn(1, T, nfeat).astype(np.float32)
b = np.asarray(rm.apply(params, jnp.asarray(feats)))[0].transpose(2, 1, 0)
net = build_streaming_network(lines, nfeat, params["params"])
states = net.start(1)
outs = []
bnd = []
for s in range(0, T, chunk):
    ch = jnp.asarray(feats[:, s:s + chunk])[..., None]
    states, y = net.run(states, ch)
    if y.shape[1]:
        outs.append(np.asarray(y))
        bnd.append(sum(o.shape[1] for o in outs))
states, y = net.finish(states)
if y is not None and y.shape[1]:
    outs.append(np.asarray(y))
sarr = np.concatenate(outs, axis=1)[0]
print("chunk output boundaries:", bnd, "total", sarr.shape, "batch", b.shape)
d = np.abs(sarr - b).max(axis=(1, 2))
for i in range(len(d)):
    if d[i] > 1e-4:
        print(f"frame {i}: {d[i]:.3e}")

# --- instrument: compare TDS input (LN output) seen in streaming finish vs batch
print("\n-- instrument finish path --")
prefix = lines[:5]  # through LN
rmp = Raw(tuple(parse_arch_lines(list(prefix))))
bln = np.asarray(rmp.apply(params, jnp.asarray(feats)))[0].transpose(2, 1, 0)
print("batch LN out:", bln.shape)

# re-run streaming, capturing what the TDS layer receives
net2 = build_streaming_network(lines, nfeat, params["params"])
states = net2.start(1)
tds_inputs = []
orig_step = net2.layers[-1].step
def spy_step(p, s, x, _o=orig_step):
    tds_inputs.append(np.asarray(x))
    return _o(p, s, x)
net2.layers[-1].step = spy_step
outs = []
for s in range(0, T, chunk):
    ch = jnp.asarray(feats[:, s:s + chunk])[..., None]
    states, y = net2._chain_step(net2.params, states, ch)  # unjitted for spy
    if y.shape[1]:
        outs.append(np.asarray(y))
states, y = net2.finish(states)
if y is not None and y.shape[1]:
    outs.append(np.asarray(y))
got = np.concatenate([t for t in tds_inputs if t.shape[1]], axis=1)[0]
print("TDS saw", got.shape, "frames; batch LN", bln.shape)
n = min(len(got), len(bln))
d2 = np.abs(got[:n] - bln[:n]).max(axis=(1, 2))
for i in range(n):
    if d2[i] > 1e-5:
        print(f"  TDS-input frame {i}: {d2[i]:.3e}")
print("  (clean if no frames printed)")

# --- manual numpy TDS from captured inputs
print("\n-- manual numpy TDS --")
P = {k: np.asarray(v) for k, v in net2.params.items()}
name = "l5_tds"
F_in = got  # (102, 16, 6) = f0..f99 + 2 zero flush frames
pl, pr = 4, 2
pad = np.concatenate([np.zeros((pl, 16, 6), np.float32), F_in], axis=0)  # (106,16,6)
w = P[f"{name}_conv_w"]  # (C, C, 1, kw) OIHW
bconv = P[f"{name}_conv_b"]
N = 100
conv_out = np.zeros((N, 16, 6), np.float32)
for i in range(N):
    win = pad[i:i + 7]  # (7, F, C)
    # OIHW (O, I, 1, kw): out[f, o] = sum_i sum_t win[t, f, i] * w[o, i, 0, t]
    conv_out[i] = np.einsum("tfi,oit->fo", win, w[:, :, 0, :]) + bconv[None, :]
y = np.maximum(conv_out, 0)
z = F_in[:N] + y
def ln(v, wk, bk):
    m = v.mean(axis=(1, 2), keepdims=True)
    s = v.var(axis=(1, 2), keepdims=True)
    return P[wk] * (v - m) / np.sqrt(s + 1e-5) + P[bk]
z = ln(z, f"{name}_ln1_w", f"{name}_ln1_b")
flat = z.transpose(0, 2, 1).reshape(N, -1)  # (N, C*F) C-major
h = np.maximum(flat @ P[f"{name}_lin1_w"] + P[f"{name}_lin1_b"], 0)
h = h @ P[f"{name}_lin2_w"] + P[f"{name}_lin2_b"]
z2 = flat + h
z2 = z2.reshape(N, 6, 16).transpose(0, 2, 1)
z2 = ln(z2, f"{name}_ln2_w", f"{name}_ln2_b")
print("manual vs batch  :", np.abs(z2 - b).max(axis=(1, 2))[[0, 50, 96, 97, 98, 99]])
print("manual vs stream :", np.abs(z2 - sarr).max(axis=(1, 2))[[0, 50, 96, 97, 98, 99]])

# --- spy (unjitted) run output vs batch
print("\n-- unjitted chain output vs batch --")
s2 = np.concatenate(outs, axis=1)[0]
d3 = np.abs(s2 - b).max(axis=(1, 2))
bad = [i for i in range(len(d3)) if d3[i] > 1e-4]
print("bad frames:", [(i, float(d3[i])) for i in bad] or "NONE (unjitted matches)")

# --- hand-built state test: TDS.step(state=f93..f98, x=f99) vs batch frame 97
print("\n-- hand-built state TDS.step --")
tds = net2.layers[-1]
tds.step = orig_step if hasattr(tds, 'step') else tds.step
st_hand = jnp.asarray(bln[93:99][None])  # (1, 6, 16, 6)
x_hand = jnp.asarray(bln[99:100][None])  # (1, 1, 16, 6)
_, y97 = orig_step(net2.params, st_hand, x_hand)
y97 = np.asarray(y97)[0, 0]
print("hand frame97 vs batch:", np.abs(y97 - b[97]).max())
print("hand frame97 vs stream:", np.abs(y97 - sarr[97]).max())
# also: run the SAME window via a 7-frame fresh-state step (state=zeros(4) pad
# + f93..f95? no) — instead compare a mid-stream reproduction: step with
# state=f89..f94, x=f95..f99 (5 frames) -> frames 93..97
_, ym = orig_step(net2.params, jnp.asarray(bln[89:95][None]), jnp.asarray(bln[95:100][None]))
ym = np.asarray(ym)[0]
print("multi-frame step frames 93..97 vs batch:",
      np.abs(ym - b[93:98]).max(axis=(1, 2)))

# --- intra-step bisect: conv / ln1 / mlp for the two equivalent computations
print("\n-- intra-step bisect --")
import jax.lax as lax
Pj = net2.params
wj = Pj["l5_tds_conv_w"]
bj = Pj["l5_tds_conv_b"]
print("conv w dtype/shape:", wj.dtype, wj.shape, "param dtypes:",
      {k: str(v.dtype) for k, v in list(Pj.items())[:4]})
buf1 = jnp.concatenate([jnp.asarray(bln[93:99][None]), jnp.asarray(bln[99:100][None])], axis=1)
buf2 = jnp.concatenate([jnp.asarray(bln[89:95][None]), jnp.asarray(bln[95:100][None])], axis=1)
def conv(buf):
    inp = buf.transpose(0, 3, 2, 1)
    y = lax.conv_general_dilated(inp, wj.astype(inp.dtype), (1, 1),
        ((0, 0), (0, 0)), dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return (y + bj[None, :, None, None]).transpose(0, 3, 2, 1)
y1 = np.asarray(conv(buf1))[0]       # (1, F, C) — frame 97
y2 = np.asarray(conv(buf2))[0]       # (5, F, C) — frames 93..97
print("conv out diff (frame97):", np.abs(y1[0] - y2[4]).max())
print("buf windows equal:", np.abs(np.asarray(buf1)[0] - np.asarray(buf2)[0, 4:]).max())

# --- full sub-step trace
print("\n-- full sub-step trace --")
def substeps(buf, n_out):
    y = conv(buf)
    y = jnp.maximum(y, 0)
    res_in = buf[:, 4:4 + n_out]
    z = res_in + y
    def lnj(v, wk, bk):
        m = v.mean(axis=(2, 3), keepdims=True)
        s = v.var(axis=(2, 3), keepdims=True)
        return Pj[wk] * (v - m) * jax.lax.rsqrt(s + 1e-5) + Pj[bk]
    z = lnj(z, "l5_tds_ln1_w", "l5_tds_ln1_b")
    B, N, F, C = z.shape
    flat = z.transpose(0, 1, 3, 2).reshape(B, N, C * F)
    h = jnp.maximum(flat @ Pj["l5_tds_lin1_w"] + Pj["l5_tds_lin1_b"], 0)
    h = h @ Pj["l5_tds_lin2_w"] + Pj["l5_tds_lin2_b"]
    z2 = flat + h
    z2 = z2.reshape(B, N, C, F).transpose(0, 1, 3, 2)
    z2 = lnj(z2, "l5_tds_ln2_w", "l5_tds_ln2_b")
    return [np.asarray(t) for t in (y, z, flat, h, z2)]
a1 = substeps(buf1, 1)
a2 = substeps(buf2, 5)
for nm, t1, t2 in zip(("relu", "ln1", "flat", "mlp_h", "final"), a1, a2):
    print(f"  {nm}: {np.abs(t1[0, 0] - t2[0, 4]).max():.3e}")
print("ln1 w/b shapes:", Pj["l5_tds_ln1_w"].shape, Pj["l5_tds_ln1_b"].shape)

# --- matmul precision check
print("\n-- matmul precision --")
f1 = jnp.asarray(a1[2])  # (1,1,96)
f2 = jnp.asarray(a2[2])  # (1,5,96)
W1 = Pj["l5_tds_lin1_w"]
print("W1 dtype:", W1.dtype, "flat dtype:", f1.dtype, "mag h:", np.abs(a1[3]).max())
for prec in (None, "highest"):
    h1 = np.asarray(jnp.matmul(f1, W1, precision=prec))
    h2 = np.asarray(jnp.matmul(f2, W1, precision=prec))
    print(f"  precision={prec}: diff={np.abs(h1[0, 0] - h2[0, 4]).max():.3e}")
import numpy.linalg  # numpy reference
hn1 = np.asarray(a1[2])[0, 0] @ np.asarray(W1)
hn2 = np.asarray(a2[2])[0, 4] @ np.asarray(W1)
print("  numpy fp32: diff=", np.abs(hn1 - hn2).max())
print("  jax default_matmul_precision:", jax.config.jax_default_matmul_precision)
