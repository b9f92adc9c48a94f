"""Full pipeline e2e: train on synthetic tones until it learns, then run the
Test executor (viterbi WER) and Decode executor (lexicon beam + tiny LM) and
require beam decode to work and Test WER to be low."""

import os

import numpy as np
import pytest

from tests.util_synth import LETTERS, make_dataset
from wav2letter_tpu.config import Config


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    lst, tokens, lexicon = make_dataset(str(root), n_utts=32, seed=7)
    arch = os.path.join(str(root), "tiny.arch")
    with open(arch, "w") as f:
        f.write(
            "V -1 1 NFEAT 0\nC NFEAT 64 8 4 4\nGLU 2\nRO 2 0 3 1\nL 32 NLABEL\n"
        )
    cfg = Config()
    cfg.update(
        dict(
            train=lst,
            valid=f"dev:{lst}",
            tokens=tokens,
            lexicon=lexicon,
            rundir=str(root),
            runname="run",
            batchsize=8,
            mfsc=True,
            filterbanks=40,
            criterion="ctc",
            lr=0.4,
            netoptim="sgd",
            maxgradnorm=1.0,
            iter=300,
            reportiters=0,
            nthread=1,
            pad_multiple=64,
            compute_dtype="float32",
            arch=arch,
            onorm="target",
            seed=5,
        )
    )
    from wav2letter_tpu.runtime.train import Trainer

    tr = Trainer(cfg)
    tr.run()
    return root, lst, tokens, lexicon, arch, tr


def test_test_executor(trained):
    root, lst, tokens, lexicon, arch, tr = trained
    cfg = Config()
    cfg.update(
        dict(
            am=os.path.join(tr.rundir, "model_last.bin"),
            test=lst,
            nthread=1,
        )
    )
    from wav2letter_tpu.runtime.test import run_test

    res = run_test(cfg)
    assert res["TER"] < 25.0, f"model did not learn: TER={res['TER']}"


def test_decode_executor_zerolm(trained):
    root, lst, tokens, lexicon, arch, tr = trained
    cfg = Config()
    cfg.update(
        dict(
            am=os.path.join(tr.rundir, "model_last.bin"),
            test=lst,
            nthread=1,
            nthread_decoder=2,
            beamsize=20,
            beamthreshold=100.0,
            uselexicon=True,
            smearing="max",
            sclite=os.path.join(str(root), "sclite"),
        )
    )
    from wav2letter_tpu.runtime.decode import run_decode

    res = run_decode(cfg)
    assert res["WER"] < 40.0
    assert os.path.exists(
        os.path.join(str(root), "sclite", os.path.basename(lst) + ".hyp")
    )


def test_decode_with_lm(trained, tmp_path):
    root, lst, tokens, lexicon, arch, tr = trained
    # uniform unigram LM over letters
    arpa = "\\data\\\nngram 1=6\n\n\\1-grams:\n"
    for l in LETTERS:
        arpa += f"-0.7\t{l}\n"
    arpa += "-1.0\t<s>\n-1.0\t</s>\n\n\\end\\\n"
    lmp = tmp_path / "uni.arpa"
    lmp.write_text(arpa)
    cfg = Config()
    cfg.update(
        dict(
            am=os.path.join(tr.rundir, "model_last.bin"),
            test=lst,
            nthread=1,
            nthread_decoder=1,
            beamsize=20,
            beamthreshold=100.0,
            uselexicon=True,
            smearing="max",
            lm=str(lmp),
            lmweight=0.5,
            wordscore=0.2,
            # < n_classes: exercises the device-side top-k emission
            # compression path in the producer
            beamsizetoken=5,
        )
    )
    from wav2letter_tpu.runtime.decode import run_decode

    res = run_decode(cfg)
    assert res["WER"] < 45.0


def test_decode_with_convlm_native(trained, tmp_path):
    """--lmtype=convlm end-to-end through the decode executor: the native
    beam core drives scoring through the deferred (state, word) request
    protocol with the ConvLM resolved in batched device calls (reference
    cpc/Decode.cpp:489-624). Also asserts the executor actually selects the
    native decoder for convlm (round-2 gap: convlm pinned the Python beam)."""
    import jax
    import jax.numpy as jnp

    root, lst, tokens, lexicon, arch, tr = trained
    from wav2letter_tpu.config import Config
    from wav2letter_tpu.runtime.checkpoint import Checkpoint, save_checkpoint

    vocab = LETTERS + ["</s>", "<unk>"]
    vfile = tmp_path / "lm_vocab.txt"
    vfile.write_text("\n".join(vocab) + "\n")
    lm_arch = tmp_path / "lm.arch"
    lm_arch.write_text(
        "V -1 0 1 1\n"
        f"E 8 {len(vocab)}\n"
        "RO 1 3 0 2\n"
        "WN 3 AC 8 16 3 1 -1 0\n"
        "GLU 2\n"
        "RO 2 0 3 1\n"
        f"WN 0 L 8 {len(vocab)}\n"
    )
    from wav2letter_tpu.models.lm import build_lm_model

    m = build_lm_model(str(lm_arch), len(vocab))
    p = m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 4), jnp.int32))
    lm_cfg = Config()
    lm_cfg.update(dict(arch=str(lm_arch)))
    save_checkpoint(
        str(tmp_path / "lm_model.bin"),
        Checkpoint(config=lm_cfg.serialize(), epoch=0, updates=1,
                   model_params=p["params"], model_state={}, crit_params={},
                   opt_state={}, crit_opt_state={}, extra={}),
    )

    cfg = Config()
    cfg.update(
        dict(
            am=os.path.join(tr.rundir, "model_last.bin"),
            test=lst,
            nthread=1,
            # 2 consumer threads: concurrent deferred-LM scoring (each
            # thread owns a decoder + ConvLM; device calls interleave)
            nthread_decoder=2,
            beamsize=12,
            beamthreshold=100.0,
            uselexicon=True,
            smearing="max",
            lm=str(tmp_path / "lm_model.bin"),
            lmtype="convlm",
            lm_vocab=str(vfile),
            lm_memory=500,
            lmweight=0.3,
            wordscore=0.2,
        )
    )
    # the executor must pick the native decoder for convlm now
    from wav2letter_tpu.decoder.native import NativeBeamDecoder, native_available
    from wav2letter_tpu.runtime.decode import build_decoder, run_decode
    from wav2letter_tpu.data.dictionary import Dictionary, Lexicon

    if native_available():
        td = Dictionary.from_file(tokens)
        td.add_entry("<blank>")
        lex = Lexicon.from_file(lexicon)
        dcfg = Config()
        dcfg.update(dict(cfg._values))
        dcfg.update(dict(criterion="ctc", wordseparator="|"))
        dec, _ = build_decoder(dcfg, td, lex)
        assert isinstance(dec, NativeBeamDecoder), type(dec)

    res = run_decode(cfg)
    assert res["WER"] < 60.0  # untrained LM at low weight: sanity bound


def test_continue_mode(trained):
    root, lst, tokens, lexicon, arch, tr = trained
    cfg = Config()
    cfg.update(
        dict(
            rundir=str(root),
            runname="run",
            iter=tr.updates + 4,
            train=lst,
            valid="",
            tokens=tokens,
            lexicon=lexicon,
            batchsize=8,
            mfsc=True,
            filterbanks=40,
            arch=arch,
            nthread=1,
            pad_multiple=64,
            compute_dtype="float32",
        )
    )
    from wav2letter_tpu.runtime.train import Trainer

    tr2 = Trainer(cfg, mode="continue")
    assert tr2.updates == tr.updates  # resumed counters
    tr2.run()
    assert tr2.updates == tr.updates + 4


def test_fork_mode(trained):
    root, lst, tokens, lexicon, arch, tr = trained
    from wav2letter_tpu.config import Config
    from wav2letter_tpu.runtime.train import Trainer

    cfg = Config()
    cfg.update(
        dict(
            rundir=str(root), runname="forked", iter=3,
            train=lst, tokens=tokens, lexicon=lexicon,
            batchsize=8, mfsc=True, filterbanks=40, arch=arch,
            nthread=1, pad_multiple=64, compute_dtype="float32",
        )
    )
    ckpt_path = os.path.join(tr.rundir, "model_last.bin")
    tr2 = Trainer(cfg, mode="fork", init_model_path=ckpt_path)
    # fork: weights loaded from the checkpoint, counters fresh
    assert tr2.updates == 0 and tr2.epoch == 0
    import jax
    import numpy as np
    from wav2letter_tpu.runtime.checkpoint import load_checkpoint

    ck = load_checkpoint(ckpt_path)
    a = jax.tree_util.tree_leaves(ck.model_params)[0]
    b = jax.tree_util.tree_leaves(tr2.model_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    tr2.run()
    assert tr2.updates == 3
