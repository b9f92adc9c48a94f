#!/usr/bin/env python
"""Neural LM training (GCNN/transformer LM archs; the reference trained
these in fairseq — recipes/sota/2019/lm/README.md — here trained natively).

    python cli/train_lm.py --arch=gcnn.arch --train=corpus.txt \\
        --tokens=vocab.txt --rundir=lm_run --lr=0.1 --iter=10000 \\
        [--batchsize=16 --bptt=64]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from wav2letter_tpu.config import Config, parse_argv
    from wav2letter_tpu.data.dictionary import Dictionary
    from wav2letter_tpu.models.lm import build_lm_model, lm_cross_entropy

    raw = parse_argv(sys.argv[1:])
    bptt = int(raw.pop("bptt", 64))
    cfg = Config.from_sources(argv=[f"--{k}={v}" for k, v in raw.items()])

    vocab = Dictionary.from_file(cfg.tokens)
    eos = vocab.add_entry("</s>")
    unk = vocab.add_entry("<unk>")
    V = len(vocab)
    model = build_lm_model(cfg.arch, V)

    # stream corpus into (B, bptt) id blocks
    ids = []
    with open(cfg.train) as f:
        for line in f:
            for w in line.split():
                ids.append(vocab.get_index(w) if w in vocab else unk)
            ids.append(eos)
    ids = np.asarray(ids, np.int32)
    B = cfg.batchsize
    n_blocks = len(ids) // (B * bptt)
    ids = ids[: n_blocks * B * bptt].reshape(B, -1)

    rng = jax.random.PRNGKey(cfg.seed)
    params = model.init({"params": rng, "dropout": rng}, jnp.zeros((B, bptt), jnp.int32))
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.maxgradnorm or 5.0),
        optax.sgd(cfg.lr, momentum=cfg.momentum),
    )
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch, rng):
        def loss_fn(p):
            logits, _ = model.apply(p, batch, train=True, rngs={"dropout": rng})
            return lm_cross_entropy(logits, batch).mean() / bptt

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    upd_count = 0
    while upd_count < cfg.iter:
        for blk in range(ids.shape[1] // bptt):
            if upd_count >= cfg.iter:
                break
            batch = jnp.asarray(ids[:, blk * bptt : (blk + 1) * bptt])
            rng, k = jax.random.split(rng)
            params, opt, loss = step(params, opt, batch, k)
            upd_count += 1
            if upd_count % max(1, cfg.reportiters or 100) == 0:
                ppl = float(jnp.exp(loss))
                print(f"update {upd_count}: loss {float(loss):.4f} ppl {ppl:.2f}",
                      flush=True)

    if cfg.rundir:
        os.makedirs(cfg.rundir, exist_ok=True)
        # self-describing checkpoint (arch stored in the config) so decode
        # can rebuild the model from --lm alone (reference ConvLM binaries
        # are cereal-self-describing the same way)
        from wav2letter_tpu.runtime.checkpoint import Checkpoint, save_checkpoint

        save_checkpoint(
            os.path.join(cfg.rundir, "lm_model.bin"),
            Checkpoint(
                config=cfg.serialize(), epoch=0, updates=upd_count,
                model_params=params.get("params", params), model_state={},
                crit_params={}, opt_state={}, crit_opt_state={}, extra={},
            ),
        )
        vocab.save(os.path.join(cfg.rundir, "lm_vocab.txt"))
        print(f"saved LM to {cfg.rundir}")


if __name__ == "__main__":
    main()
