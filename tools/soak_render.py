"""Render the convergence soak's RESULTS.json into the BENCH.md markdown
tables (training trajectory, decode-vs-viterbi, lmweight sweep, streaming
parity). Run after tools/soak.py completes:

    python tools/soak_render.py [--root _local/soak]

Prints markdown to stdout; paste into BENCH.md's round-4 section.
"""

from __future__ import annotations

import argparse
import json
import os


def render(results: dict) -> str:
    out = []
    c = results.get("corpus", {})
    lm = results.get("lm", {})
    out.append(
        f"Corpus: {c.get('train_hours', '?')} h synthetic homophone audio "
        f"({c.get('vocab_size', '?')}-word vocab, {c.get('n_pairs', '?')} "
        f"acoustically-identical homophone pairs resolvable only from LM "
        f"context); 3-gram LM: {lm.get('arpa_mb', '?')} MB ARPA / "
        f"{lm.get('bin_mb', '?')} MB binary.\n")

    for run in ("train_b128", "train_b32"):
        t = results.get(run)
        if not t:
            continue
        wall = t.get("wall_s")
        out.append(
            f"**{run}** — batch {t.get('batch', '?')}, lr {t.get('lr', '?')}, "
            f"{t.get('iters', '?')} updates planned, "
            + (f"wall {wall:.0f} s, " if wall is not None else "wall ?, ")
            + f"{t.get('checkpoints', '?')} checkpoints"
            + (", mid-run SIGKILL + `continue` resume"
               if t.get("killed_and_resumed") else "") + ":\n")
        out.append("| updates | lr | loss | dev-WER % | run |")
        out.append("|---|---|---|---|---|")
        rows = t.get("trajectory", [])
        # index-based subsample to EXACTLY <= 14 rows incl. first and last
        if len(rows) <= 14:
            keep = rows
        else:
            idxs = sorted({round(i * (len(rows) - 1) / 13) for i in range(14)})
            keep = [rows[i] for i in idxs]
        for r in keep:
            lr = f"{r['lr']:.3f}" if r.get("lr") is not None else "-"
            wer = f"{r['dev_wer']:.2f}" if r.get("dev_wer") is not None else "-"
            loss = f"{r['loss']:.4f}" if r.get("loss") is not None else "-"
            out.append(f"| {r.get('updates', '?')} | {lr} | {loss} | {wer} "
                       f"| {r.get('run', 0):03d} |")
        out.append("")

    p = results.get("product")
    if p:
        out.append("**Product chain on the trained B=128 model** (all via "
                   "the real CLI binaries):\n")
        def slc(key):
            s = p.get(key) or {}
            if not s:
                return "-"
            return (f"{s.get('homophone_err_rate', '-')} "
                    f"({s.get('homophone_tokens', '?')} toks)")

        out.append("| stage | test WER % | homophone-slice err % |")
        out.append("|---|---|---|")
        out.append(f"| viterbi (`cli/test.py`) | {p.get('viterbi_test_wer')} "
                   f"| {slc('viterbi_slice')} |")
        out.append(f"| lexicon beam, no LM | {p.get('beam_nolm_test_wer')} "
                   f"| {slc('beam_nolm_slice')} |")
        out.append(f"| beam + 3-gram LM @ lmweight="
                   f"{p.get('best_lmweight')} ws={p.get('best_wordscore')} "
                   f"(dev-tuned) | {p.get('beam_lm_test_wer')} "
                   f"| {slc('beam_lm_slice')} |")
        r = p.get("rescore", {})
        if r:
            out.append(f"| beam-dump rescored (grid weights {r.get('grid_weights')}) "
                       f"| {r.get('rescored_wer')} (oracle {r.get('oracle_wer')}, "
                       f"{r.get('n_beams')} dumps) | — |")
        out.append("")
        h = p.get("homophone_slice_eval") or {}
        if h:
            out.append("**Homophone-heavy eval slice** (same Markov chain, "
                       "rejection-sampled to >= 2 pair tokens/sentence — "
                       "the corpus's structural ambiguity, concentrated):\n")
            out.append("| decode | overall WER % | homophone err % | pair toks |")
            out.append("|---|---|---|---|")
            for tag, label in (("viterbi", "viterbi"),
                               ("beam_nolm", "lexicon beam, no LM"),
                               ("beam_lm", "beam + LM (dev-tuned)")):
                s = h.get(tag) or {}
                out.append(f"| {label} | {s.get('wer_overall', '-')} "
                           f"| {s.get('homophone_err_rate', '-')} "
                           f"| {s.get('homophone_tokens', '-')} |")
            out.append("")
            hs = p.get("homophone_slice_sweep") or {}
            if hs:
                ws2 = sorted(hs, key=float)
                out.append("WER(lmweight) on the slice (diagnostic):\n")
                out.append("| " + " | ".join(f"w={w}" for w in ws2) + " |")
                out.append("|" + "---|" * len(ws2))
                out.append("| " + " | ".join(f"{hs[w]:.2f}" for w in ws2) + " |")
                out.append("")
        sw = p.get("lmweight_sweep_dev") or {}
        if sw:
            out.append("`--lmweight` × `--wordscore` sweep on dev (emission "
                       "cache reused across all runs):\n")
            ks = list(sw)
            if ks and isinstance(ks[0], str) and ks[0].startswith("lm"):
                # joint keys "lm<w>_ws<s>" -> one row per wordscore
                rows = {}
                for k, v in sw.items():
                    lw, wsv = k[2:].split("_ws")
                    rows.setdefault(wsv, {})[float(lw)] = v
                lws = sorted({float(k[2:].split("_ws")[0]) for k in ks})
                out.append("| ws \\ lmw | " + " | ".join(str(w) for w in lws)
                           + " |")
                out.append("|" + "---|" * (len(lws) + 1))
                for wsv in sorted(rows, key=float):
                    out.append(f"| {wsv} | " + " | ".join(
                        f"{rows[wsv].get(w, float('nan')):.2f}" for w in lws)
                        + " |")
            else:
                ws = sorted(sw, key=float)
                out.append("| " + " | ".join(f"lmw {w}" for w in ws) + " |")
                out.append("|" + "---|" * len(ws))
                out.append("| " + " | ".join(f"{sw[w]:.2f}" for w in ws) + " |")
            out.append("")
        st = p.get("streaming", {})
        if st:
            out.append(
                f"Streaming parity: convert → 500 ms-chunk online decode of "
                f"{st.get('n_utts')} test utts = **{st.get('streaming_wer')}% "
                f"WER** vs offline decode of the same utts = "
                f"**{st.get('offline_wer')}%** (carry-state protocol exact).")
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "_local", "soak"))
    a = ap.parse_args()
    results = json.load(open(os.path.join(a.root, "RESULTS.json")))
    print(render(results))


if __name__ == "__main__":
    main()
