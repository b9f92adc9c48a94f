"""Full CLI integration: the train/test/decode binaries run end-to-end via
subprocess with a flagsfile, exactly as a user would (BASELINE configs[0]
slice: small conv AM + ASG + greedy + beam decode with a trained n-gram LM)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.util_synth import LETTERS, make_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def run(args, **kw):
    # force CPU inside the subprocess via a sitecustomize-proof wrapper
    script = args[0]
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        f"g = {{'__name__': '__main__', '__file__': {script!r}}}; "
        f"exec(compile(open({script!r}).read(), {script!r}, 'exec'), g)"
    )
    return subprocess.run(
        [sys.executable, "-c", code] + args[1:],
        capture_output=True, text=True, env=ENV, timeout=900, cwd=REPO, **kw
    )


@pytest.mark.slow
def test_cli_train_test_decode(tmp_path):
    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=24, seed=91)
    arch = tmp_path / "net.arch"
    arch.write_text("V -1 1 NFEAT 0\nC NFEAT 64 8 4 4\nGLU 2\nRO 2 0 3 1\nL 32 NLABEL\n")
    cfg = tmp_path / "train.cfg"
    cfg.write_text(
        f"--train={lst}\n--tokens={tokens}\n--lexicon={lexicon}\n"
        f"--rundir={tmp_path}\n--runname=cli\n--batchsize=8\n--mfsc=true\n"
        f"--filterbanks=40\n--criterion=ctc\n--lr=0.4\n--netoptim=sgd\n"
        f"--maxgradnorm=1.0\n--iter=250\n--nthread=1\n--pad_multiple=64\n"
        f"--compute_dtype=float32\n--arch={arch}\n--onorm=target\n--seed=5\n"
    )
    r = run([os.path.join(REPO, "cli/train.py"), "train", f"--flagsfile={cfg}"])
    assert r.returncode == 0, r.stderr[-2000:]
    am = tmp_path / "cli" / "model_last.bin"
    assert am.exists()

    r = run([os.path.join(REPO, "cli/test.py"), f"--am={am}", f"--test={lst}"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "WER" in r.stdout

    # train a tiny word LM from the transcripts and beam-decode with it
    corpus = tmp_path / "corpus.txt"
    with open(lst) as f:
        corpus.write_text(
            "\n".join(l.split(None, 3)[3] if len(l.split(None, 3)) > 3 else ""
                      for l in f) + "\n"
        )
    from wav2letter_tpu.tools.ngram_lm import train_ngram_lm

    arpa = tmp_path / "lm.arpa"
    train_ngram_lm(str(corpus), str(arpa), order=2)
    r = run([
        os.path.join(REPO, "cli/decode.py"), f"--am={am}", f"--test={lst}",
        f"--lm={arpa}", "--lmweight=1.0", "--wordscore=0.5", "--beamsize=50",
        "--beamthreshold=100", "--smearing=max", "--nthread_decoder=2",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "WER" in r.stdout
    # beam+LM should be at least as accurate as random
    wer = float(r.stdout.split("WER: ")[1].split("%")[0])
    assert wer < 60.0
