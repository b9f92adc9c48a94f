"""Every shipped recipe arch must build and run; every cfg must parse."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from wav2letter_tpu.config import Config, parse_cfg_file
from wav2letter_tpu.models.arch import build_arch_module

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARCHS = [
    ("recipes/timit/network.arch", 40, 40, 64),
    ("recipes/conv_glu/network.arch", 40, 30, 64),
    ("recipes/seq2seq_tds/network.arch", 80, 1024, 64),
    ("recipes/streaming_convnets/network.arch", 80, 5000, 64),
    ("recipes/transformer_ctc/network.arch", 80, 5000, 32),
    ("recipes/transformer_s2s/network.arch", 80, 512, 32),
    ("recipes/resnet_ctc/network.arch", 80, 5000, 32),
    ("recipes/conformer_ctc/network.arch", 80, 5000, 32),
    ("recipes/learnable_frontend/network.arch", 40, 40, 64),
    ("recipes/cpc/encoder.arch", 1, 512, 2048),
    ("recipes/cpc/context.arch", 512, 768, 16),
    ("recipes/cpc/predict.arch", 768, 32, 16),
]


@pytest.mark.parametrize("path,nfeat,nlabel,T", ARCHS)
def test_recipe_arch_builds(path, nfeat, nlabel, T):
    m = build_arch_module(os.path.join(REPO, path), nfeat, nlabel)
    x = jnp.zeros((1, T, nfeat))
    xl = jnp.asarray([T], jnp.int32)
    p = m.init({"params": jax.random.PRNGKey(0)}, x, xl)
    y, yl = m.apply(p, x, xl)
    assert y.shape[-1] == nlabel


def test_all_cfgs_parse():
    cfgs = glob.glob(os.path.join(REPO, "recipes", "*", "*.cfg"))
    assert len(cfgs) >= 8
    for c in cfgs:
        flags = parse_cfg_file(c)
        cfg = Config()
        cfg.update(flags)  # raises on unknown flags
