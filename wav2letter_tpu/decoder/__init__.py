from .lm import LM, ZeroLM, KenLM, ArpaLM
from .trie import Trie, TrieNode, SmearingMode
from .beam import (
    CriterionType,
    DecodeResult,
    DecoderOptions,
    LexiconDecoder,
    LexiconFreeDecoder,
)

__all__ = [
    "LM",
    "ZeroLM",
    "KenLM",
    "ArpaLM",
    "Trie",
    "TrieNode",
    "SmearingMode",
    "CriterionType",
    "DecodeResult",
    "DecoderOptions",
    "LexiconDecoder",
    "LexiconFreeDecoder",
]
