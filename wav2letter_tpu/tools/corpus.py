"""LM corpus preparation: normalization, dedup, vocab building.

Reference: ``recipes/sota/2019/raw_lm_corpus/*`` — Gutenberg text
normalization and dedup of books that overlap LibriVox/LibriSpeech audio
sources by fuzzy title match (``levenshtein-word.pl``), then vocab + corpus
assembly for LM training; ``lm_corpus_and_PL_generation/*``.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, Iterable, List, Sequence, Tuple

from ..ops.editdistance import edit_distance


def normalize_lm_text(text: str, keep_apostrophe: bool = True) -> str:
    """Lowercase, strip punctuation (keeping in-word apostrophes), collapse
    whitespace — the corpus normalization the LM recipes apply."""
    text = text.lower()
    if keep_apostrophe:
        text = re.sub(r"[^a-z' ]+", " ", text)
        text = re.sub(r"(?<![a-z])'|'(?![a-z])", " ", text)
    else:
        text = re.sub(r"[^a-z ]+", " ", text)
    return " ".join(text.split())


def normalize_title(title: str) -> List[str]:
    return normalize_lm_text(title, keep_apostrophe=False).split()


def title_match(a: str, b: str, max_dist_frac: float = 0.25) -> bool:
    """Fuzzy title equality via word-level levenshtein
    (``levenshtein-word.pl`` analog)."""
    wa, wb = normalize_title(a), normalize_title(b)
    if not wa or not wb:
        return False
    d = edit_distance(wa, wb)
    return d <= max_dist_frac * max(len(wa), len(wb))


def dedup_corpus_titles(
    corpus_titles: Sequence[str], exclude_titles: Sequence[str],
    max_dist_frac: float = 0.25,
) -> List[int]:
    """Indices of corpus entries that do NOT fuzzily match any excluded
    title (e.g. drop Gutenberg books whose audio appears in LibriSpeech)."""
    keep = []
    for i, t in enumerate(corpus_titles):
        if not any(title_match(t, e, max_dist_frac) for e in exclude_titles):
            keep.append(i)
    return keep


def build_vocab(
    corpus_lines: Iterable[str], max_words: int = 200000, min_count: int = 1
) -> List[str]:
    counts: Counter = Counter()
    for line in corpus_lines:
        counts.update(normalize_lm_text(line).split())
    items = [(w, c) for w, c in counts.items() if c >= min_count]
    items.sort(key=lambda x: (-x[1], x[0]))
    return [w for w, _ in items[:max_words]]


def write_lm_corpus(
    in_paths: Sequence[str], out_path: str, shuffle_seed: int = 0
) -> int:
    """Concatenate + normalize + shuffle sentence lines (reference
    ``prepare.py:124-147`` LM corpus shuffle)."""
    import random

    lines: List[str] = []
    for p in in_paths:
        with open(p) as f:
            for line in f:
                n = normalize_lm_text(line)
                if n:
                    lines.append(n)
    random.Random(shuffle_seed).shuffle(lines)
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return len(lines)
