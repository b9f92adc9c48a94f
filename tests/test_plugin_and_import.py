"""Plugin system (mling-style LID plugin) + ConvLM torch import tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_mling_plugin_loads_and_runs():
    from wav2letter_tpu.models.plugin import load_plugin_module

    m = load_plugin_module(
        os.path.join(REPO, "recipes/mls/mling_plugin.py"), 40, 100
    )
    x = jnp.zeros((2, 64, 40))
    xl = jnp.asarray([64, 32], jnp.int32)
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, xl)
    (em, elen), inter = m.apply(
        variables, x, xl, mutable=["intermediates"]
    )
    assert em.shape[-1] == 100
    lid = inter["intermediates"]["encoder"]["lid_logits"] if "encoder" in inter["intermediates"] else inter["intermediates"]["lid_logits"]
    lid = lid[0] if isinstance(lid, (list, tuple)) else lid
    assert np.asarray(lid).shape == (2, 60)


def test_plugin_in_trainer(tmp_path):
    from tests.util_synth import make_dataset
    from wav2letter_tpu.config import Config
    from wav2letter_tpu.runtime.train import Trainer

    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=8, seed=61)
    plugin = tmp_path / "plug.py"
    plugin.write_text(
        "from flax import linen as nn\n"
        "import jax.numpy as jnp\n"
        "class M(nn.Module):\n"
        "    n_feat: int\n"
        "    n_label: int\n"
        "    @nn.compact\n"
        "    def __call__(self, feats, feat_len=None, train=False):\n"
        "        h = nn.Dense(32)(feats)\n"
        "        h = nn.relu(h)\n"
        "        em = nn.Dense(self.n_label)(h)\n"
        "        return em, feat_len\n"
        "def create_module(n_feat, n_label):\n"
        "    return M(n_feat, n_label)\n"
    )
    cfg = Config()
    cfg.update(
        dict(train=lst, tokens=tokens, lexicon=lexicon, rundir=str(tmp_path),
             runname="plug", batchsize=8, mfsc=True, filterbanks=40,
             criterion="ctc", lr=0.1, iter=4, nthread=1, pad_multiple=64,
             arch=str(plugin), compute_dtype="float32")
    )
    tr = Trainer(cfg)
    tr.run()
    assert tr.updates == 4


def test_convlm_torch_import(tmp_path):
    torch = pytest.importorskip("torch")
    from wav2letter_tpu.models.arch import parse_arch_lines
    from wav2letter_tpu.models.lm import LMArchModel
    from wav2letter_tpu.tools.convlm_import import import_convlm

    V = 16
    lines = ["V -1 0 1 1", f"E 8 {V}", "RO 1 3 0 2", "RO 2 0 3 1", f"L 8 {V}"]
    m = LMArchModel(tuple(parse_arch_lines(lines)), V, V)
    ids = jnp.zeros((1, 4), jnp.int32)
    params = m.init({"params": jax.random.PRNGKey(0)}, ids)

    # fake fairseq-style checkpoint with matching shapes
    sd = {
        "decoder.embed_tokens.weight": torch.randn(V, 8),
        "decoder.fc_out.weight": torch.randn(V, 8),  # (out,in) - transposed
        "decoder.fc_out.bias": torch.randn(V),
    }
    p = tmp_path / "fairseq.pt"
    torch.save(sd, p)
    new = import_convlm(str(p), params["params"])
    y, _ = m.apply({"params": new}, ids)
    assert np.isfinite(np.asarray(y)).all()
    # imported params actually differ from the random init
    before = jax.tree_util.tree_leaves(params["params"])
    after = jax.tree_util.tree_leaves(new)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )
