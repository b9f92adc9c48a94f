"""On-device HLO-category profile of the bench training step.

Runs a few flagship-bench training steps under ``jax.profiler.trace`` and
prints per-HLO-category totals (ms, GB/s-or-TF/s where derivable) parsed out
of the xplane via xprof's ``hlo_stats`` converter. This is the tool behind
BENCH.md's profile tables.

Usage:  python tools/tpu_profile.py [out.csv]
Env:    BENCH_MODEL/BENCH_BATCH/BENCH_SECS as for bench.py.
"""

import csv
import glob
import io
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step():
    """Replicates bench.py's jitted full training step + inputs."""
    import jax
    import jax.numpy as jnp
    import optax

    from wav2letter_tpu.features import FeatureParams, Featurizer
    from wav2letter_tpu.ops.ctc import ctc_loss
    from __graft_entry__ import _build_model

    n_feat, n_label = 80, 9998
    which = os.environ.get("BENCH_MODEL", "tds")
    if which == "transformer":
        from wav2letter_tpu.models.arch import build_arch_module

        arch = "/root/reference/recipes/sota/2019/am_arch/am_transformer_ctc.arch"
        model = build_arch_module(arch, n_feat, n_label)
    elif which == "conv_glu":
        from wav2letter_tpu.models.arch import build_arch_module

        n_label = 30
        arch = "/root/reference/recipes/conv_glu/librispeech/network.arch"
        model = build_arch_module(arch, n_feat, n_label)
    elif which == "conformer":
        import tempfile as _tf

        from wav2letter_tpu.models.arch import build_arch_module

        frontend = [
            "V -1 1 NFEAT 0",
            "WN 3 C NFEAT 1024 3 1 -1", "GLU 2", "DO 0.2", "M 1 1 2 1",
            "WN 3 C 512 1024 3 1 -1", "GLU 2", "DO 0.2", "M 1 1 2 1",
            "WN 3 C 512 2048 3 1 -1", "GLU 2", "DO 0.2", "M 1 1 2 1",
            "RO 2 0 3 1",
        ]
        blocks = ["CFR 1024 4096 4 460 31 0.2"] * 20
        tail = ["DO 0.2", "L 1024 NLABEL"]
        af = _tf.NamedTemporaryFile("w", suffix=".arch", delete=False)
        af.write("\n".join(frontend + blocks + tail) + "\n")
        af.close()
        model = build_arch_module(af.name, n_feat, n_label)
    elif which == "tds_s2s":
        return build_s2s_step()
    else:
        model = _build_model(n_feat, n_label)
    featurizer = Featurizer(FeatureParams(n_filterbanks=n_feat))
    tx = optax.sgd(1e-3, momentum=0.9)

    B = int(os.environ.get("BENCH_BATCH", "32"))
    S = int(16000 * float(os.environ.get("BENCH_SECS", "15")))
    U = 160

    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, jnp.zeros((1, 128, n_feat)), jnp.asarray([128]))
    opt_state = tx.init(params)

    audio = jax.random.normal(rng, (B, S)) * 0.1
    audio_len = jnp.full((B,), S, jnp.int32)
    targets = jax.random.randint(rng, (B, U), 0, n_label - 1)
    target_len = jnp.full((B,), U, jnp.int32)

    @jax.jit
    def step(p, o, au, alen, tg, tlen):
        def loss_fn(p):
            feats, flen = featurizer(au, alen)
            feats = feats.astype(jnp.bfloat16)
            em, elen = model.apply(p, feats, flen)
            return ctc_loss(em.astype(jnp.float32), tg, elen, tlen).mean() / 1000.0

        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    args = (params, opt_state, audio, audio_len, targets, target_len)
    return step, args


def build_s2s_step():
    """seq2seq_tds family step (encoder + GRU attention-decoder criterion),
    matching bench.py's s2s_bench."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from wav2letter_tpu.config import Config
    from wav2letter_tpu.criterions import make_criterion
    from wav2letter_tpu.features import FeatureParams, Featurizer
    from wav2letter_tpu.models.arch import build_arch_module

    n_feat, n_label, enc_dim = 80, 9998, 512
    arch = "/root/reference/recipes/sota/2019/am_arch/am_tds_s2s.arch"
    model = build_arch_module(arch, n_feat, enc_dim, force_label_dim=False)
    cfg = Config()
    cfg.update(dict(
        criterion="seq2seq", attention="keyvalue", encoderdim=enc_dim,
        eostoken=True, labelsmooth=0.05,
        pctteacherforcing=float(os.environ.get("BENCH_TF", "99")),
        maxdecoderoutputlen=120, attnWindow="softPretrain", softwstd=4.0,
        trainWithWindow=True, pretrainWindow=3,
    ))
    criterion = make_criterion(cfg, n_label)
    featurizer = Featurizer(FeatureParams(n_filterbanks=n_feat))
    tx = optax.sgd(1e-3, momentum=0.9)
    B = int(os.environ.get("BENCH_BATCH", "32"))
    S = int(16000 * float(os.environ.get("BENCH_SECS", "15")))
    U = int(os.environ.get("BENCH_TGT", "80"))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, jnp.zeros((1, 128, n_feat)),
                        jnp.asarray([128]))
    em_d, el_d = model.apply(params, jnp.zeros((1, 128, n_feat)),
                             jnp.asarray([128]))
    crit_params = criterion.init(
        rng, em_d, jnp.zeros((1, 8), jnp.int32), el_d,
        jnp.full((1,), 8, jnp.int32))["params"]
    opt_state = tx.init((params, crit_params))
    audio = jax.random.normal(rng, (B, S)) * 0.1
    audio_len = jnp.full((B,), S, jnp.int32)
    targets = jax.random.randint(rng, (B, U), 0, n_label - 2)
    target_len = jnp.full((B,), U, jnp.int32)

    @jax.jit
    def step(ps, o, au, alen, tg, tlen):
        p, cp = ps

        def loss_fn(p, cp):
            feats, flen = featurizer(au, alen)
            em, elen = model.apply(p, feats.astype(jnp.bfloat16), flen)
            losses = criterion.apply(
                {"params": cp}, em.astype(jnp.float32), tg, elen, tlen,
                train=True, rngs={"dropout": rng})
            return losses.mean() / 100.0

        l, g = jax.value_and_grad(loss_fn, argnums=(0, 1))(p, cp)
        up, o = tx.update(g, o, (p, cp))
        return optax.apply_updates((p, cp), up), o, l

    return step, ((params, crit_params), opt_state, audio, audio_len,
                  targets, target_len)


def main():
    import jax

    step, (params, opt_state, *rest) = build_step()
    # warm up / compile
    params, opt_state, l = step(params, opt_state, *rest)
    float(l)
    tdir = tempfile.mkdtemp(prefix="tpuprof_")
    with jax.profiler.trace(tdir):
        for _ in range(3):
            params, opt_state, l = step(params, opt_state, *rest)
        float(l)

    xs = glob.glob(tdir + "/**/*.xplane.pb", recursive=True)
    assert xs, f"no xplane under {tdir}"
    from xprof.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data(xs, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    gviz = json.loads(data)
    cols = [c["id"] for c in gviz["cols"]]
    rows = [
        {cols[i]: (cell or {}).get("v") for i, cell in enumerate(r["c"])}
        for r in gviz["rows"]
    ]
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(rows, f, indent=1)
    tkey = next(
        (k for k in cols if "time" in k.lower() and "total" in k.lower()), None
    ) or next(k for k in cols if "time" in k.lower())
    agg = defaultdict(lambda: [0.0, 0.0])  # cat -> [occ_us, flops]
    name_agg = defaultdict(float)
    for r in rows:
        cat = r.get("category") or "?"
        t = float(r.get(tkey) or 0)
        agg[cat][0] += t
        nm = str(r.get("hlo_op_expression") or r.get("hlo_op_name") or "")[:110]
        name_agg[(cat, nm)] += t
    nsteps = 3.0
    total = sum(v[0] for v in agg.values())
    print(f"\n== HLO categories (per step, {len(rows)} ops, total {total/1e3/nsteps:.2f} ms) ==")
    for cat, (t, _) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"  {cat:<40s} {t/1e3/nsteps:8.2f} ms  {100*t/total:5.1f}%")
    print("\n== top 15 ops ==")
    for (cat, nm), t in sorted(name_agg.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {t/1e3/nsteps:8.2f} ms  [{cat}] {nm}")
    print("\ncolumns available:", list(rows[0].keys()) if rows else None)


if __name__ == "__main__":
    main()
