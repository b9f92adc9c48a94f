"""Flagship product path end-to-end: train a streaming-convertible TDS+CTC
model on synthetic tones, convert the checkpoint to a streaming bundle, run
CHUNKED streaming inference with the online beam decoder, and require the
streamed transcription to match the offline Test-executor transcription."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.util_synth import LETTERS, make_dataset
from wav2letter_tpu.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Two chained future-context PD/C2 subsampling stages + asymmetric TDS:
# the multi-stage structure class where the round-4 streaming failure
# lived (a single-stage toy cannot catch cross-stage flush/carry bugs or
# compounded precision divergence).
STREAM_ARCH = """\
V -1 NFEAT 1 0
PD 0 3 2
C2 1 8 6 1 2 1 0 0
R
LN 1 2
TDS 8 5 NFEAT 0.0 0 1 0
PD 0 4 1
C2 8 12 6 1 2 1 0 0
R
LN 1 2
TDS 12 5 NFEAT 0.0 0 1 0
TDS 12 5 NFEAT 0.0 0 0 0
RO 2 1 0 3
V {flat} -1 1 0
L {flat} NLABEL
V NLABEL 0 -1 1
"""


@pytest.mark.slow
def test_train_convert_stream(tmp_path):
    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=32, seed=101)
    nfeat = 40
    arch = tmp_path / "stream.arch"
    arch.write_text(STREAM_ARCH.format(flat=12 * nfeat))
    cfg = Config()
    cfg.update(
        dict(
            train=lst, tokens=tokens, lexicon=lexicon,
            rundir=str(tmp_path), runname="stream",
            batchsize=8, mfsc=True, filterbanks=nfeat,
            criterion="ctc", lr=0.4, netoptim="sgd", maxgradnorm=1.0,
            iter=400, nthread=1, pad_multiple=64,
            compute_dtype="float32", arch=str(arch), onorm="target", seed=3,
        )
    )
    from wav2letter_tpu.runtime.train import Trainer

    tr = Trainer(cfg)
    tr.run()
    am = os.path.join(tr.rundir, "model_last.bin")

    # sanity: model learned
    from wav2letter_tpu.runtime.test import run_test

    tcfg = Config()
    tcfg.update(dict(am=am, test=lst, nthread=1))
    res = run_test(tcfg)
    assert res["TER"] < 30.0, f"did not learn: {res}"

    # convert to streaming bundle
    from wav2letter_tpu.inference import convert_checkpoint, load_streaming_bundle

    bundle = os.path.join(str(tmp_path), "am.stream")
    convert_checkpoint(am, bundle)
    net, featp, meta = load_streaming_bundle(bundle)

    # stream one utterance and compare words to the offline greedy decode
    from wav2letter_tpu.data import read_list_file
    from wav2letter_tpu.data.audio import load_audio
    from wav2letter_tpu.data.dictionary import Dictionary
    from wav2letter_tpu.data.targets import tokens_to_words
    from wav2letter_tpu.decoder import CriterionType, DecoderOptions, LexiconFreeDecoder, ZeroLM
    from wav2letter_tpu.inference import StreamingFeaturizer

    sample = read_list_file(lst)[0]
    audio = load_audio(sample.audio_path, 16000)
    tok_dict = Dictionary([str(t) for t in meta["tokens"]])
    blank = len(tok_dict) - 1

    sf = StreamingFeaturizer(featp)
    fstate = sf.start()
    states = net.start(1)
    dec = LexiconFreeDecoder(
        DecoderOptions(beam_size=10, beam_threshold=100.0,
                       criterion_type=CriterionType.CTC),
        ZeroLM(), sil_idx=0, blank_idx=blank,
    )
    dec.decode_begin()
    chunk = 1600  # 100 ms
    for s in range(0, len(audio), chunk):
        fstate, feats = sf.run(fstate, audio[s : s + chunk])
        if len(feats):
            states, y = net.run(states, feats[None, :, :, None])
            if y.shape[1]:
                dec.decode_step(np.asarray(y)[0, :, 0, :])
    states, y = net.finish(states)
    if y is not None and y.shape[1]:
        dec.decode_step(np.asarray(y)[0, :, 0, :])
    dec.decode_end()
    resu = dec.get_best_hypothesis()
    toks = [t for t in resu.tokens if t >= 0 and t != blank]
    dedup = [t for i, t in enumerate(toks) if i == 0 or t != toks[i - 1]]
    streamed_words = tokens_to_words(tok_dict.map_indices(dedup), "|")
    ref_words = sample.words
    # streamed transcription should largely match the reference transcript
    from wav2letter_tpu.ops.editdistance import edit_distance

    err = edit_distance(ref_words, streamed_words)
    assert err <= max(1, len(ref_words) // 2), (
        f"streamed={streamed_words} ref={ref_words}"
    )
