"""Connectionist Temporal Classification — TPU-native forward/backward.

Interface parity with the reference's ``CTCLoss`` (constructed at
``cpc/Train.cpp:524-525``; blank appended LAST to the token dict per
``cpc/Train.cpp:409-412``) and ``viterbiPath`` (greedy per-frame argmax for
CTC).

Design: the alpha recursion runs as a ``lax.scan`` over time on the extended
label sequence (blank-interleaved, length 2U+1), entirely in log space, fully
vectorized over batch and label positions — so each step is a handful of VPU
ops on a (B, 2U+1) block and XLA pipelines the scan. The backward pass is
analytic (``custom_vjp``): a beta scan plus the standard
``grad = softmax(logits) - posterior`` identity, which avoids differentiating
through the scan and halves peak memory.

Padded positions (target_len < U, logit_len < T) are handled with -inf masks;
all shapes are static.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _extended_labels(targets: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, U) -> (B, 2U+1) blank-interleaved; padded slots become blank."""
    B, U = targets.shape
    tgt = jnp.where(targets < 0, blank, targets)
    ext = jnp.full((B, 2 * U + 1), blank, dtype=targets.dtype)
    ext = ext.at[:, 1::2].set(tgt)
    return ext


def _ctc_masks(ext: jnp.ndarray, target_len: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (allow_skip (B,L), valid (B,L)) for the extended sequence."""
    B, L = ext.shape
    pos = jnp.arange(L)[None, :]
    # skip-connection s-2 -> s allowed when s is a label position and
    # label[s] != label[s-2]
    prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :L]
    is_label = (pos % 2) == 1
    allow_skip = is_label & (ext != prev2)
    valid = pos < (2 * target_len[:, None] + 1)
    return allow_skip, valid


def _forward_alphas(
    log_probs_ext: jnp.ndarray,  # (T, B, L) emission log-probs gathered at ext labels
    allow_skip: jnp.ndarray,  # (B, L)
    valid: jnp.ndarray,  # (B, L)
    logit_len: jnp.ndarray,  # (B,)
    target_len: jnp.ndarray,  # (B,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the alpha scan. Returns (alphas (T,B,L), logZ (B,))."""
    T, B, L = log_probs_ext.shape
    neg = jnp.asarray(NEG_INF, log_probs_ext.dtype)

    init = jnp.where(
        (jnp.arange(L)[None, :] < 2) & valid, log_probs_ext[0], neg
    )

    def step(alpha_prev, lp_t):
        a0 = alpha_prev
        a1 = jnp.pad(alpha_prev, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :L]
        a2 = jnp.pad(alpha_prev, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :L]
        a2 = jnp.where(allow_skip, a2, neg)
        m = jnp.maximum(jnp.maximum(a0, a1), a2)
        msafe = jnp.maximum(m, neg)
        comb = msafe + jnp.log(
            jnp.exp(a0 - msafe) + jnp.exp(a1 - msafe) + jnp.exp(a2 - msafe)
        )
        alpha = jnp.where(valid, comb + lp_t, neg)
        return alpha, alpha

    _, alphas_rest = jax.lax.scan(step, init, log_probs_ext[1:])
    alphas = jnp.concatenate([init[None], alphas_rest], axis=0)  # (T,B,L)

    # logZ: logsumexp of alpha at final frame over last two valid positions
    t_idx = jnp.clip(logit_len - 1, 0, T - 1)
    final_alpha = alphas[t_idx, jnp.arange(B)]  # (B, L)
    lastpos = 2 * target_len  # blank after last label
    lastpos2 = jnp.maximum(2 * target_len - 1, 0)
    aN = final_alpha[jnp.arange(B), lastpos]
    aN1 = jnp.where(target_len > 0, final_alpha[jnp.arange(B), lastpos2], neg)
    m = jnp.maximum(aN, aN1)
    logZ = m + jnp.log(jnp.exp(aN - m) + jnp.exp(aN1 - m))
    return alphas, logZ


def _backward_betas(
    log_probs_ext: jnp.ndarray,
    allow_skip: jnp.ndarray,
    valid: jnp.ndarray,
    logit_len: jnp.ndarray,
    target_len: jnp.ndarray,
) -> jnp.ndarray:
    """Beta scan (time-reversed). Returns betas (T,B,L).

    beta_t(s) = logsum over successors s' in {s, s+1, s+2} of
                beta_{t+1}(s') + lp_{t+1}(s'). Defined so that
                alpha_t(s) + beta_t(s) = log p(path through (t,s)).
    """
    T, B, L = log_probs_ext.shape
    neg = jnp.asarray(NEG_INF, log_probs_ext.dtype)
    pos = jnp.arange(L)[None, :]

    # successor skip mask: s -> s+2 allowed iff allow_skip at s+2
    skip_from = jnp.pad(allow_skip, ((0, 0), (0, 2)))[:, 2:]  # (B, L)

    # init at final frame (per-sample, via masking inside the scan):
    lastpos = 2 * target_len[:, None]
    is_final_state = (pos == lastpos) | (pos == jnp.maximum(lastpos - 1, 0))
    final_beta = jnp.where(is_final_state & valid, 0.0, neg)

    def step(beta_next, xs):
        lp_next, is_last_t = xs  # lp at t+1, and whether t+1 == logit_len (B,)
        b = beta_next + lp_next
        b0 = b
        b1 = jnp.pad(b, ((0, 0), (0, 1)), constant_values=NEG_INF)[:, 1:]
        b2 = jnp.pad(b, ((0, 0), (0, 2)), constant_values=NEG_INF)[:, 2:]
        b2 = jnp.where(skip_from, b2, neg)
        m = jnp.maximum(jnp.maximum(b0, b1), b2)
        msafe = jnp.maximum(m, neg)
        comb = msafe + jnp.log(
            jnp.exp(b0 - msafe) + jnp.exp(b1 - msafe) + jnp.exp(b2 - msafe)
        )
        comb = jnp.where(valid, comb, neg)
        # rows where t+1 is beyond this sample's last frame: beta resets to
        # the final-state init at t = logit_len-1, else propagates
        beta = jnp.where(is_last_t[:, None], final_beta, comb)
        return beta, beta

    t_range = jnp.arange(T - 1, 0, -1)  # t+1 values from T-1 down to 1
    lp_rev = log_probs_ext[::-1][: T - 1]  # lp at T-1 ... 1
    # the scan step consuming lp at time t+1 emits beta at time t; the reset
    # to the final-state init must land at t == logit_len-1, i.e. t+1 == len
    is_last = t_range[:, None] == logit_len[None, :]  # (T-1, B)

    init_beta = jnp.where(logit_len[:, None] == T, final_beta, neg)
    _, betas_rev = jax.lax.scan(step, init_beta, (lp_rev, is_last))
    betas = jnp.concatenate([init_beta[None], betas_rev], axis=0)[::-1]  # (T,B,L)
    return betas


def _gather_ext_logprobs(log_probs: jnp.ndarray, ext: jnp.ndarray) -> jnp.ndarray:
    """(B,T,N),(B,L) -> (T,B,L)"""
    lp = jnp.take_along_axis(
        log_probs, ext[:, None, :].astype(jnp.int32), axis=2
    )  # (B,T,L)
    return lp.transpose(1, 0, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _ctc_neglogp(logits, targets, logit_len, target_len):
    loss, _ = _ctc_fwd_impl(logits, targets, logit_len, target_len)
    return loss


def _ctc_fwd_impl(logits, targets, logit_len, target_len):
    """Takes RAW logits; the log-softmax is folded into the loss (forward:
    gathered-logits minus logsumexp; backward: the classic closed form
    softmax(logits) - posterior). Keeping the normalization inside the
    custom VJP avoids XLA's log_softmax-VJP materializing + re-layouting a
    full (B,T,N) f32 intermediate (0.9 ms/step on the flagship bench)."""
    B, T, N = logits.shape
    blank = N - 1
    ext = _extended_labels(targets, blank)
    allow_skip, valid = _ctc_masks(ext, target_len)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)  # (B,T)
    lp_ext = _gather_ext_logprobs(logits, ext) - lse.T[:, :, None]  # (T,B,L)
    alphas, logZ = _forward_alphas(lp_ext, allow_skip, valid, logit_len, target_len)
    return -logZ, (ext, allow_skip, valid, alphas, logZ, lse)


def _ctc_fwd(logits, targets, logit_len, target_len):
    loss, res = _ctc_fwd_impl(logits, targets, logit_len, target_len)
    return loss, (logits, targets, logit_len, target_len, res)


def _ctc_bwd(saved, g):
    (logits, targets, logit_len, target_len,
     (ext, allow_skip, valid, alphas, logZ, lse)) = saved
    B, T, N = logits.shape
    lp_ext = _gather_ext_logprobs(logits, ext) - lse.T[:, :, None]
    betas = _backward_betas(lp_ext, allow_skip, valid, logit_len, target_len)
    # posterior over extended states: gamma (T,B,L)
    gamma = alphas + betas - logZ[None, :, None]
    gamma = jnp.exp(jnp.clip(gamma, -80.0, 80.0))
    t_mask = (jnp.arange(T)[:, None] < logit_len[None, :])[:, :, None]
    gamma = jnp.where(t_mask & valid[None], gamma, 0.0)
    # scatter-add onto vocab: post(b,t,n) = sum_{s: ext[s]=n} gamma
    ext_onehot = jax.nn.one_hot(ext, N, dtype=logits.dtype)  # (B,L,N)
    post = jnp.einsum("tbl,bln->btn", gamma, ext_onehot)
    # d(-logZ)/d logits = softmax(logits) - post for valid frames, 0 beyond
    sm = jnp.exp(logits - lse[:, :, None])
    bt_mask = jnp.arange(T)[None, :] < logit_len[:, None]  # (B,T)
    grad = (sm - post) * jnp.where(bt_mask, g[:, None], 0.0)[:, :, None]
    return grad, None, None, None


_ctc_neglogp.defvjp(_ctc_fwd, _ctc_bwd)


def ctc_loss(
    logits: jnp.ndarray,  # (B, T, N) raw emissions
    targets: jnp.ndarray,  # (B, U) int32, -1 padded
    logit_len: jnp.ndarray,  # (B,)
    target_len: jnp.ndarray,  # (B,)
    blank: Optional[int] = None,
) -> jnp.ndarray:
    """Per-sample CTC negative log likelihood. Blank = last class (reference
    convention). Computed in float32 regardless of input dtype."""
    logits = logits.astype(jnp.float32)
    B, T, N = logits.shape
    if blank is not None and blank != N - 1:
        raise ValueError("reference convention requires blank == N-1")
    return _ctc_neglogp(logits, targets, logit_len, target_len)


def ctc_viterbi(logits: jnp.ndarray, logit_len: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Greedy per-frame argmax (reference CTC viterbiPath). (B,T,N)->(B,T);
    frames past logit_len are set to the blank (last) class."""
    B, T, N = logits.shape
    path = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if logit_len is not None:
        t_idx = jnp.arange(T)[None, :]
        path = jnp.where(t_idx < logit_len[:, None], path, N - 1)
    return path


def ctc_collapse(path, blank: int):
    """Host-side: collapse repeats then remove blanks (uniquify, reference
    decode postprocessing). Returns a python list per row."""
    import numpy as np

    path = np.asarray(path)
    out = []
    for row in path:
        toks = []
        prev = None
        for t in row:
            if t != prev:
                if t != blank:
                    toks.append(int(t))
                prev = t
        out.append(toks)
    return out
