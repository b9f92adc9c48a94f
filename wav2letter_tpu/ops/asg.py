"""Auto-Segmentation (ASG) criterion — TPU-native.

Reference: flashlight's ASG loss (upstream; interface evidenced by transition
use at ``inference/decoder/Decoder.cpp:104`` and transition-matrix-as-param-0
at ``tools/StreamingTDSModelConverter.cpp:310-324``) per Collobert et al.,
"Wav2Letter: an End-to-End ConvNet-based Speech Recognition System".

    loss = FCC - FAL
    FAL  (forced alignment): log-sum over alignments of the target sequence,
    FCC  (fully connected):  log-sum over ALL label sequences,
    both with bigram transition scores trans[i, j] = score(j -> i).

TPU design: both scores are ``lax.scan`` recursions over time. The FCC step
is a (B,N)x(N,N) log-space "matmul" (logsumexp over the previous label) —
for ASG's typical alphabets (chars + replabels, N ~ 30-40) this is a small
VPU op per frame; gradients flow by autodiff through the scan, which XLA
turns into the standard forward-backward (posterior) computation. Shapes are
static; padded frames/targets are masked.

viterbiPath for ASG = max-product FCC with backpointer backtrace (the greedy
decode used by Test.cpp:325).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _lse(*xs):
    m = xs[0]
    for x in xs[1:]:
        m = jnp.maximum(m, x)
    s = sum(jnp.exp(x - m) for x in xs)
    return m + jnp.log(s)


def fal_score(
    emissions: jnp.ndarray,  # (B, T, N) raw scores (NOT softmaxed; ASG uses raw)
    transitions: jnp.ndarray,  # (N, N) trans[i, j] = j -> i
    targets: jnp.ndarray,  # (B, U), -1 padded
    emis_len: jnp.ndarray,  # (B,)
    target_len: jnp.ndarray,  # (B,)
) -> jnp.ndarray:
    B, T, N = emissions.shape
    U = targets.shape[1]
    neg = jnp.asarray(NEG_INF, jnp.float32)
    em = emissions.astype(jnp.float32)
    tgt = jnp.where(targets < 0, 0, targets).astype(jnp.int32)

    # per-sample gathered emission scores at target labels: (T, B, U)
    em_tgt = jnp.take_along_axis(em, tgt[:, None, :], axis=2).transpose(1, 0, 2)
    # self transitions trans[y_u, y_u] and step transitions trans[y_u, y_{u-1}]
    self_tr = transitions[tgt, tgt]  # (B, U)
    prev = jnp.pad(tgt, ((0, 0), (1, 0)))[:, :U]
    step_tr = transitions[tgt, prev]  # (B, U); u=0 slot unused
    upos = jnp.arange(U)[None, :]
    uvalid = upos < target_len[:, None]

    init = jnp.where(upos == 0, em_tgt[0], neg)
    init = jnp.where(uvalid, init, neg)

    def step(alpha, em_t):
        stay = alpha + self_tr
        move = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :U] + step_tr
        move = jnp.where(upos == 0, neg, move)
        a = _lse(stay, move) + em_t
        return jnp.where(uvalid, a, neg), None

    def scan_step(carry, xs):
        alpha, t = carry
        em_t = xs
        new_alpha, _ = step(alpha, em_t)
        # freeze alpha for frames past emis_len
        active = (t < emis_len)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)
        return (alpha, t + 1), None

    (alpha, _), _ = jax.lax.scan(scan_step, (init, jnp.ones((), jnp.int32)), em_tgt[1:])
    last = jnp.clip(target_len - 1, 0, U - 1)
    return alpha[jnp.arange(B), last]


def fcc_score(
    emissions: jnp.ndarray,
    transitions: jnp.ndarray,
    emis_len: jnp.ndarray,
) -> jnp.ndarray:
    B, T, N = emissions.shape
    em = emissions.astype(jnp.float32).transpose(1, 0, 2)  # (T,B,N)
    trans = transitions.astype(jnp.float32)

    init = em[0]

    def scan_step(carry, xs):
        alpha, t = carry
        em_t = xs
        # logsumexp_m(alpha[m] + trans[n, m]) for each n
        z = alpha[:, None, :] + trans[None, :, :]  # (B, N_to, N_from)
        m = jnp.max(z, axis=-1)
        new_alpha = m + jnp.log(jnp.sum(jnp.exp(z - m[..., None]), axis=-1))
        new_alpha = new_alpha + em_t
        active = (t < emis_len)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)
        return (alpha, t + 1), None

    (alpha, _), _ = jax.lax.scan(scan_step, (init, jnp.ones((), jnp.int32)), em[1:])
    m = jnp.max(alpha, axis=-1)
    return m + jnp.log(jnp.sum(jnp.exp(alpha - m[:, None]), axis=-1))


def asg_loss(
    emissions: jnp.ndarray,
    transitions: jnp.ndarray,
    targets: jnp.ndarray,
    emis_len: jnp.ndarray,
    target_len: jnp.ndarray,
) -> jnp.ndarray:
    """Per-sample ASG loss = FCC - FAL (>= 0)."""
    fal = fal_score(emissions, transitions, targets, emis_len, target_len)
    fcc = fcc_score(emissions, transitions, emis_len)
    return fcc - fal


def linseg_loss(
    emissions: jnp.ndarray,
    transitions: jnp.ndarray,
    targets: jnp.ndarray,
    emis_len: jnp.ndarray,
    target_len: jnp.ndarray,
) -> jnp.ndarray:
    """LinSeg initialization loss (reference ``--linseg`` updates): the FAL
    term is replaced by the score of the single linear-segmentation alignment
    u(t) = floor(t * U / T_valid)."""
    B, T, N = emissions.shape
    em = emissions.astype(jnp.float32)
    tgt = jnp.where(targets < 0, 0, targets).astype(jnp.int32)
    t_idx = jnp.arange(T)[None, :]
    tl = jnp.maximum(target_len, 1)[:, None]
    el = jnp.maximum(emis_len, 1)[:, None]
    u_of_t = jnp.clip((t_idx * tl) // el, 0, tl - 1)  # (B, T)
    lbl = jnp.take_along_axis(tgt, u_of_t, axis=1)  # (B, T)
    em_sc = jnp.take_along_axis(em, lbl[:, :, None], axis=2)[..., 0]  # (B,T)
    prev_lbl = jnp.pad(lbl, ((0, 0), (1, 0)))[:, :T]
    tr_sc = transitions[lbl, prev_lbl]
    tr_sc = tr_sc.at[:, 0].set(0.0)
    valid = t_idx < emis_len[:, None]
    forced = jnp.sum(jnp.where(valid, em_sc + tr_sc, 0.0), axis=1)
    fcc = fcc_score(emissions, transitions, emis_len)
    return fcc - forced


def asg_viterbi(
    emissions: jnp.ndarray,
    transitions: jnp.ndarray,
    emis_len: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Max-product decode with transitions + backtrace. (B,T,N) -> (B,T)."""
    B, T, N = emissions.shape
    em = emissions.astype(jnp.float32).transpose(1, 0, 2)
    trans = transitions.astype(jnp.float32)
    if emis_len is None:
        emis_len = jnp.full((B,), T, jnp.int32)

    init = em[0]

    def scan_step(carry, xs):
        alpha, t = carry
        em_t = xs
        z = alpha[:, None, :] + trans[None, :, :]  # (B, to, from)
        best_prev = jnp.argmax(z, axis=-1).astype(jnp.int32)  # (B, N)
        new_alpha = jnp.max(z, axis=-1) + em_t
        active = (t < emis_len)[:, None]
        alpha_out = jnp.where(active, new_alpha, alpha)
        # frozen frames point to themselves (identity backpointer)
        bp = jnp.where(active, best_prev, jnp.arange(N)[None, :].astype(jnp.int32))
        return (alpha_out, t + 1), bp

    (alpha, _), bps = jax.lax.scan(
        scan_step, (init, jnp.ones((), jnp.int32)), em[1:]
    )  # bps: (T-1, B, N)
    last = jnp.argmax(alpha, axis=-1).astype(jnp.int32)  # (B,)

    def back_step(lbl, bp_t):
        prev = jnp.take_along_axis(bp_t, lbl[:, None], axis=1)[:, 0]
        return prev, lbl

    _, path_rev = jax.lax.scan(back_step, last, bps[::-1])
    # path_rev holds labels at t = T-1 .. 1; prepend label at t=0
    first = jnp.take_along_axis(bps[0], path_rev[-1][:, None], axis=1)[:, 0] if T > 1 else last
    path = jnp.concatenate([first[None], path_rev[::-1]], axis=0) if T > 1 else last[None]
    return path.transpose(1, 0)  # (B, T)


def asg_collapse(path, replabel: int = 0, base_dict_size: int = 0):
    """Host-side: collapse repeats and unpack replabels (reference ASG decode
    postprocessing, Decoder.cpp:189-225). Returns python lists."""
    import numpy as np

    from ..data.dictionary import unpack_replabels

    out = []
    for row in np.asarray(path):
        toks = []
        prev = None
        for t in row:
            t = int(t)
            if t != prev:
                toks.append(t)
            prev = t
        if replabel > 0:
            toks = unpack_replabels(toks, replabel, base_dict_size)
        out.append(toks)
    return out
