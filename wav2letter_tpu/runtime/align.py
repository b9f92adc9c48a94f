"""Align executor — the reference's ``tools/Align`` binary (used by the
sota/2019 lm_analysis segmentation experiment, ``lm_analysis/README.md``
"Force alignment for dev-other"; consumed by filter/shuffle scripts that
parse per-word ``begin length word`` entries with ``$`` silence rows).

Loads an AM checkpoint, forced-aligns each utterance's transcript to its
emissions (``ops/align.py`` constrained Viterbi), and writes one line per
sample: ``audio_path\\t<entries>`` where entries are ``\\n``-joined
``token_idx word_idx begin_s length_s word``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import AsrDataset, PrefetchIterator
from ..ops.align import asg_forced_align, ctc_forced_align, path_to_word_segments
from .test import Evaluator


def run_align(cfg: Config, output_path: str) -> int:
    ev = Evaluator(cfg)
    ecfg = ev.cfg
    if ev.is_s2s:
        raise ValueError("forced alignment requires a ctc/asg criterion AM")
    ds = AsrDataset(
        ecfg.test, ev.token_dict, ev.lexicon, ecfg, batch_size=ecfg.batchsize
    )
    import jax

    if ecfg.criterion == "asg":
        align_fn = jax.jit(
            lambda em, el, tg, tl: asg_forced_align(em, ev.transitions, tg, el, tl)
        )
    else:
        align_fn = jax.jit(
            lambda em, el, tg, tl: ctc_forced_align(
                em, tg, el, tl, blank=ev.n_classes - 1
            )
        )

    sr = ecfg.samplerate
    blank = ev.n_classes - 1 if ecfg.criterion != "asg" else None
    n = 0
    it = PrefetchIterator(ds, ds.batch_specs(), num_threads=max(1, ecfg.nthread))
    with open(output_path, "w") as out:
        for batch in it:
            em, elen = ev.emissions(batch)
            tgt = jnp.asarray(batch["target"])
            tl = jnp.asarray(batch["target_len"])
            path, _score = align_fn(em, elen, tgt, tl)
            path = np.asarray(path)
            elen_np = np.asarray(elen)
            for i in range(path.shape[0]):
                si = int(batch["sample_idx"][i])
                if si < 0:
                    continue
                sample = ds.samples[si]
                T_i = int(elen_np[i])
                # seconds per emission frame = audio duration / n frames
                dur_s = float(batch["audio_len"][i]) / float(sr)
                frame_sec = dur_s / max(1, T_i)
                segs = path_to_word_segments(
                    path[i][:T_i], ev.token_dict, frame_sec,
                    wordsep=ecfg.wordseparator, blank=blank,
                )
                entries = "\\n".join(
                    f"{k} {k} {b:.3f} {l:.3f} {w}" for k, (b, l, w) in enumerate(segs)
                )
                out.write(f"{sample.audio_path}\t{entries}\n")
                n += 1
    print(f"[Align] wrote {n} alignments to {output_path}")
    return n
