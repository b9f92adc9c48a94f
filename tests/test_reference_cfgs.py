"""Flag-inventory compliance (SURVEY.md Appendix A): every flag used by any
of the reference's 151 .cfg flagsfiles must be consumed by this framework —
by the core Config, by a recipe binary's flag set (CPC / slimIPL / LPM), or
by an explicitly documented deprecated/ignored alias. A flag nobody accepts
is a missing capability."""

import glob
import os

import pytest

REF = "/root/reference/recipes"


def _cfg_flags(path):
    out = {}
    for line in open(path, errors="replace"):
        line = line.strip()
        if not line.startswith("--"):
            continue
        name = line[2:].split("=", 1)[0].strip()
        if name:
            out[name] = line
    return out


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_every_reference_cfg_flag_is_consumed():
    from wav2letter_tpu.config import FLAG_DEFS, _DEPRECATED
    from wav2letter_tpu.runtime.train_cpc import CPC_DEFAULTS
    from wav2letter_tpu.runtime.train_lpm import LPM_DEFAULTS
    from wav2letter_tpu.runtime.train_slimipl import SLIMIPL_DEFAULTS

    known = set(FLAG_DEFS) | set(_DEPRECATED)
    known |= set(CPC_DEFAULTS) | set(LPM_DEFAULTS) | set(SLIMIPL_DEFAULTS)

    cfgs = sorted(glob.glob(os.path.join(REF, "**", "*.cfg"), recursive=True))
    assert len(cfgs) >= 140, len(cfgs)
    unknown = {}
    for c in cfgs:
        for name, line in _cfg_flags(c).items():
            if name not in known:
                unknown.setdefault(name, []).append(os.path.relpath(c, REF))
    assert not unknown, f"unconsumed reference flags: {unknown}"
