"""Multilingual CTC acoustic model plugin with a language-ID head.

The python-plugin analog of the reference's compiled C++ plugin
(``recipes/mling_pl/mling_large.cpp``: a large transformer AM with an
auxiliary LID classifier head at ``:52-89``, loaded via ``--arch=arch.so``).
Use with ``--arch=recipes/mls/mling_plugin.py``; the LID logits are exposed
as an extra output attribute for the MTL loss
(``wav2letter_tpu.criterions.cpc.MTLLoss``).
"""

import jax.numpy as jnp
from flax import linen as nn

from wav2letter_tpu.models.arch import build_arch_from_lines

N_LANGS = 60

ENCODER_LINES = [
    "V -1 1 {nfeat} 0",
    "WN 3 C {nfeat} 512 3 1 -1",
    "GLU 2",
    "DO 0.1",
    "M 1 1 2 1",
    "RO 2 0 3 1",
    "TR 256 1024 4 240 0.1 0.05",
    "TR 256 1024 4 240 0.1 0.05",
    "TR 256 1024 4 240 0.1 0.05",
    "TR 256 1024 4 240 0.1 0.05",
]


class MultilingualAM(nn.Module):
    n_feat: int
    n_label: int
    n_langs: int = N_LANGS

    def setup(self):
        lines = [l.format(nfeat=self.n_feat) for l in ENCODER_LINES]
        self.encoder = build_arch_from_lines(lines, 256)
        self.ctc_head = nn.Dense(self.n_label)
        self.lid_head = nn.Dense(self.n_langs)

    def __call__(self, feats, feat_len=None, train: bool = False):
        h, hlen = self.encoder(feats, feat_len, train=train)
        em = self.ctc_head(h.astype(jnp.float32))
        # mean-pooled LID logits stored for the MTL loss
        t = jnp.arange(h.shape[1])[None, :, None]
        m = (t < hlen[:, None, None]).astype(h.dtype)
        pooled = (h * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        self.sow("intermediates", "lid_logits",
                 self.lid_head(pooled.astype(jnp.float32)))
        return em, hlen


def create_module(n_feat: int, n_label: int):
    return MultilingualAM(n_feat, n_label)
