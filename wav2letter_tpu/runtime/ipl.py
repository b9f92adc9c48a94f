"""IPL — Iterative Pseudo-Labeling orchestration driver.

The reference ships IPL as a documented workflow (``recipes/ipl/README.md``,
arXiv 2005.09267) over the self_training utilities
(``recipes/self_training/pseudo_labeling/generate_synthetic_data.py:27-60``
filtering, ``generate_synthetic_lexicon.py`` merge): repeatedly

    {train AM -> decode unlabeled (with LM) -> filter hypotheses ->
     merge synthetic lexicon -> retrain on labeled + pseudo-labeled}

This module is the missing driver: a checkpointed loop (state JSON in the
run dir, resumable mid-loop) built on the real Trainer / Evaluator /
beam-decoder stack.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import Config
from ..data import AsrDataset
from ..data.listfile import read_list_file
from ..data.targets import tokens_to_words
from ..tools.pseudo_label import (
    PLFilterConfig,
    filter_pseudo_labels,
    merge_synthetic_lexicon,
    write_pseudo_labeled_list,
)


@dataclasses.dataclass
class IPLOptions:
    unsup_lst: str  # unlabeled audio list (transcripts ignored/absent)
    rounds: int = 3  # IPL iterations after the seed round
    seed_iters: int = 500  # updates for the seed (labeled-only) round
    round_iters: int = 300  # updates per IPL round (fork from prev model)
    filter: PLFilterConfig = dataclasses.field(default_factory=PLFilterConfig)


def generate_pseudo_labels(
    am_path: str, unsup_lst: str, cfg: Config
) -> List[Tuple[str, List[str], float, bool]]:
    """Decode the unlabeled list with the current model; returns
    (sample_id, words, score, has_eos) per utterance. Uses the beam decoder
    with the LM when ``--lm`` is set (the IPL paper's configuration),
    greedy viterbi otherwise."""
    from .decode import build_decoder, result_to_words
    from .test import Evaluator

    dcfg = Config(**{})
    dcfg.update(cfg.asdict())
    dcfg.update({"am": am_path, "test": unsup_lst})
    ev = Evaluator(dcfg, am_path=am_path)
    ecfg = ev.cfg
    for k in ("lm", "lmweight", "wordscore", "silscore", "beamsize",
              "beamsizetoken", "beamthreshold", "smearing", "uselexicon",
              "decodertype", "lmtype", "lm_vocab", "lm_memory"):
        ecfg.update({k: cfg.get(k)})

    ds = AsrDataset(
        unsup_lst, ev.token_dict, ev.lexicon, ecfg,
        batch_size=ecfg.batchsize, allow_empty_targets=True,
    )
    use_beam = bool(ecfg.lm) and not ev.is_s2s
    dec = word_dict = None
    if use_beam:
        trans = np.asarray(ev.transitions) if ev.transitions is not None else None
        dec, word_dict = build_decoder(ecfg, ev.token_dict, ev.lexicon, trans)

    hyps: List[Tuple[str, List[str], float, bool]] = []
    for spec in ds.batch_specs():
        batch = ds.materialize(spec)
        em, elen = ev.emissions(batch)
        em = np.asarray(em)
        elen = np.asarray(elen)
        if not use_beam:
            vit, vlen = ev.viterbi(em, elen)
            vit, vlen = np.asarray(vit), np.asarray(vlen)
        for i, idx in enumerate(spec.indices):
            sid = ds.samples[idx].sample_id
            T = int(elen[i])
            if use_beam:
                res = dec.decode(em[i, :T], 1)[0]
                words = result_to_words(res, word_dict, ev.token_dict, ecfg,
                                        ev.n_classes)
                score = float(res.score) / max(1, T)
                has_eos = True
            else:
                toks = ev.collapse(vit[i], int(vlen[i]))
                words = tokens_to_words(
                    ev.token_dict.map_indices(toks), ecfg.wordseparator,
                    ecfg.usewordpiece,
                )
                # confidence proxy: mean best-frame log-prob
                lp = em[i, :T] - np.logaddexp.reduce(em[i, :T], axis=-1,
                                                     keepdims=True)
                score = float(lp.max(axis=-1).mean()) if T else -1e9
                has_eos = True  # CTC/ASG hyps always terminate
            hyps.append((sid, words, score, has_eos))
    return hyps


def _state_path(rundir: str) -> str:
    return os.path.join(rundir, "ipl_state.json")


def run_ipl(cfg: Config, opts: IPLOptions) -> Dict:
    """The IPL loop. Checkpointed: each completed phase updates
    ``ipl_state.json``; rerunning resumes after the last completed phase."""
    from .train import Trainer, _log

    rundir = os.path.join(cfg.rundir, cfg.runname) if cfg.runname else cfg.rundir
    os.makedirs(rundir, exist_ok=True)
    sp = _state_path(rundir)
    if os.path.exists(sp):
        state = json.load(open(sp))
        _log(f"[IPL] resuming from state: round {state['round']}")
    else:
        state = {
            "round": 0,  # 0 = seed round pending
            "model": "",
            "train_lst": cfg.train,  # labeled (+PL in later rounds)
            "lexicon": cfg.lexicon,
            "history": [],
        }

    def save_state():
        with open(sp, "w") as f:
            json.dump(state, f, indent=1)

    def train_round(rnd: int, train_lst: str, lexicon: str, n_iters: int,
                    init_model: str) -> str:
        rcfg = Config(**{})
        rcfg.update(cfg.asdict())
        rcfg.update({
            "train": train_lst, "lexicon": lexicon,
            "rundir": rundir, "runname": f"round{rnd:02d}",
            "iter": n_iters,
        })
        tr = Trainer(rcfg, mode="fork" if init_model else "train",
                     init_model_path=init_model)
        tr.run()
        return os.path.join(tr.rundir, "model_last.bin")

    while state["round"] <= opts.rounds:
        rnd = state["round"]
        if rnd == 0:
            _log(f"[IPL] seed round: {opts.seed_iters} updates on labeled data")
            state["model"] = train_round(0, cfg.train, cfg.lexicon,
                                         opts.seed_iters, "")
            state["history"].append({"round": 0, "n_pl": 0})
            state["round"] = 1
            save_state()
            continue

        _log(f"[IPL] round {rnd}: pseudo-labeling {opts.unsup_lst}")
        hyps = generate_pseudo_labels(state["model"], opts.unsup_lst, cfg)
        kept = filter_pseudo_labels(hyps, opts.filter)
        pl_lst = os.path.join(rundir, f"pl_round{rnd:02d}.lst")
        n_pl = write_pseudo_labeled_list(
            opts.unsup_lst, {sid: words for sid, words, _ in kept}, pl_lst
        )
        _log(f"[IPL] round {rnd}: kept {n_pl}/{len(hyps)} pseudo-labels")

        # synthetic lexicon: spellings for PL words outside the base lexicon
        lex = state["lexicon"]
        if lex:
            new_words = sorted({w for _, words, _ in kept for w in words})
            merged = os.path.join(rundir, f"lexicon_round{rnd:02d}.txt")
            n_new = merge_synthetic_lexicon(cfg.lexicon, new_words, merged,
                                            cfg.wordseparator)
            _log(f"[IPL] round {rnd}: +{n_new} synthetic lexicon words")
            lex = merged

        # merged train list: labeled + pseudo-labeled
        merged_lst = os.path.join(rundir, f"train_round{rnd:02d}.lst")
        with open(merged_lst, "w") as out:
            for p in (cfg.train, pl_lst):
                for s in read_list_file(p):
                    out.write(
                        f"{s.sample_id} {s.audio_path} {s.duration_ms} "
                        f"{' '.join(s.words)}\n"
                    )

        _log(f"[IPL] round {rnd}: fork-training {opts.round_iters} updates")
        state["model"] = train_round(rnd, merged_lst, lex, opts.round_iters,
                                     state["model"])
        state["train_lst"] = merged_lst
        state["lexicon"] = lex
        state["history"].append({"round": rnd, "n_pl": n_pl,
                                 "n_hyps": len(hyps)})
        state["round"] = rnd + 1
        save_state()

    _log(f"[IPL] done: {opts.rounds} rounds, final model {state['model']}")
    return state
