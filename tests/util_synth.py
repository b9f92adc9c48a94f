"""Synthetic tiny ASR dataset for end-to-end tests.

Generates audio where each "word" is a pure tone whose frequency encodes the
letter, so a small model can actually learn the mapping — giving tests a
real learning signal (loss decreases, TER drops) without external data.
"""

from __future__ import annotations

import os

import numpy as np

LETTERS = ["a", "b", "c", "d"]
TONES = {"a": 400.0, "b": 800.0, "c": 1600.0, "d": 2800.0}
SR = 16000


def synth_utterance(rng: np.random.RandomState, n_letters: int):
    letters = [LETTERS[rng.randint(len(LETTERS))] for _ in range(n_letters)]
    seg = int(0.08 * SR)
    audio = []
    for l in letters:
        t = np.arange(seg) / SR
        tone = 0.3 * np.sin(2 * np.pi * TONES[l] * t)
        audio.append(tone + 0.01 * rng.randn(seg))
    wav = np.concatenate(audio).astype(np.float32)
    return wav, letters


def make_dataset(root: str, n_utts: int = 32, seed: int = 0, min_len=2, max_len=5):
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    lines = []
    for i in range(n_utts):
        wav, letters = synth_utterance(rng, rng.randint(min_len, max_len + 1))
        path = os.path.join(root, f"utt{i:03d}.npy")
        np.save(path, wav)
        dur_ms = 1000.0 * len(wav) / SR
        # each letter is a word
        lines.append(f"utt{i:03d} {path} {dur_ms:.1f} {' '.join(letters)}")
    lst = os.path.join(root, "data.lst")
    with open(lst, "w") as f:
        f.write("\n".join(lines) + "\n")
    tokens = os.path.join(root, "tokens.txt")
    with open(tokens, "w") as f:
        f.write("|\n" + "\n".join(LETTERS) + "\n")
    lexicon = os.path.join(root, "lexicon.txt")
    with open(lexicon, "w") as f:
        for l in LETTERS:
            f.write(f"{l}\t{l} |\n")
    return lst, tokens, lexicon
