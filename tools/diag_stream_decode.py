"""Reproduce the soak streaming decode path (the 100% WER) on a few utts.

Compares three decodes of the SAME streaming emissions:
  A. online: decode_begin / per-chunk decode_step + prune(0) / decode_end
  B. online, no prune
  C. batch: one decode() over the concatenated emissions
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from wav2letter_tpu.data import read_list_file
    from wav2letter_tpu.data.audio import load_audio
    from wav2letter_tpu.data.dictionary import Dictionary, Lexicon, make_word_dict
    from wav2letter_tpu.decoder import CriterionType, DecoderOptions
    from wav2letter_tpu.decoder.native import NativeBeamDecoder, NativeLM, NativeTrie
    from wav2letter_tpu.inference import StreamingFeaturizer, load_streaming_bundle
    from wav2letter_tpu.ops.editdistance import edit_distance

    root = "_local/soak"
    net, featp, meta = load_streaming_bundle(os.path.join(root, "am.stream"))
    tok_dict = Dictionary([str(t) for t in meta["tokens"]])
    n_tokens = len(tok_dict)
    blank = n_tokens - 1
    sil = tok_dict.get_index("|")
    lexicon = Lexicon.from_file("_local/corpora/soak20h/lexicon.txt")
    word_dict = make_word_dict(lexicon)
    lm = NativeLM(os.path.join(root, "lm3.arpa"), usr_vocab=word_dict.entries())
    trie = NativeTrie(n_tokens)
    for w, sps in lexicon.entries.items():
        widx = word_dict.get_index(w)
        for sp in sps:
            ids = [tok_dict.get_index(t) for t in sp if tok_dict.contains(t)]
            if ids:
                trie.insert(ids, widx, 0.0)
    trie.smear("max")
    opts = DecoderOptions(
        beam_size=50, beam_threshold=100.0, lm_weight=0.0,
        word_score=0.5, criterion_type=CriterionType.CTC)
    unk = word_dict.get_index("<unk>") if word_dict.contains("<unk>") else -1

    samples = read_list_file(os.path.join(root, "test_sub.lst"))[:5]
    chunk = int(0.5 * 16000)
    for s in samples:
        audio = load_audio(s.audio_path, 16000)
        # collect per-chunk emissions
        sf = StreamingFeaturizer(featp)
        fstate = sf.start()
        states = net.start(1)
        ems = []
        for off in range(0, len(audio), chunk):
            fstate, feats = sf.run(fstate, audio[off:off + chunk])
            if len(feats):
                states, y = net.run(states, feats[None, :, :, None])
                if y.shape[1]:
                    ems.append(np.asarray(y)[0, :, 0, :])
        states, y = net.finish(states)
        if y is not None and y.shape[1]:
            ems.append(np.asarray(y)[0, :, 0, :])

        def words_of(res):
            return [word_dict.get_entry(w) for w in res.words if w >= 0]

        # A: online with prune(0)
        dec = NativeBeamDecoder(opts, trie, lm, sil, blank, unk, n_tokens)
        dec.decode_begin()
        for e in ems:
            dec.decode_step(e)
            dec.prune(0)
        dec.decode_end()
        hyp_a = words_of(dec.get_results(1)[0])

        # B: online without prune
        dec = NativeBeamDecoder(opts, trie, lm, sil, blank, unk, n_tokens)
        dec.decode_begin()
        for e in ems:
            dec.decode_step(e)
        dec.decode_end()
        hyp_b = words_of(dec.get_results(1)[0])

        # C: batch over full emissions
        dec = NativeBeamDecoder(opts, trie, lm, sil, blank, unk, n_tokens)
        full = np.concatenate(ems, axis=0)
        hyp_c = words_of(dec.decode(full)[0])

        # D: reference pattern — consume best words per chunk, then prune
        # (AudioToWords.cpp:64-105)
        dec = NativeBeamDecoder(opts, trie, lm, sil, blank, unk, n_tokens)
        dec.decode_begin()
        hyp_d = []
        for e in ems:
            dec.decode_step(e)
            hyp_d += words_of(dec.get_results(1)[0])
            dec.prune(0)
        dec.decode_end()
        hyp_d += words_of(dec.get_results(1)[0])

        ref = s.transcript.split()
        for tag, hyp in (("A prune", hyp_a), ("B noprune", hyp_b),
                         ("C batch", hyp_c), ("D consume", hyp_d)):
            e = edit_distance(ref, hyp)
            print(f"{s.sample_id} [{tag:9s}] err={e}/{len(ref)} hyp={' '.join(hyp)}")
        print(f"{s.sample_id} [ref      ] {s.transcript}")


if __name__ == "__main__":
    main()
