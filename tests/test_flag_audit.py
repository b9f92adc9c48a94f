"""Enforces docs/flag_audit.md: every config flag is either behaviorally
tested (the referenced test exists) or explicitly documented-ignored with a
reason — no silent no-op flags (VERDICT r1 weak #5)."""

import os
import re

from wav2letter_tpu.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AUDIT = os.path.join(REPO, "docs", "flag_audit.md")


def parse_audit():
    rows = {}
    for line in open(AUDIT):
        m = re.match(r"\|\s*([A-Za-z0-9_]+)\s*\|(.*)\|\s*(.*?)\s*\|\s*$", line)
        if not m or m.group(1) in ("flag",):
            continue
        flag, _, evidence = m.groups()
        rows[flag] = evidence.strip()
    return rows


def test_audit_covers_every_flag():
    rows = parse_audit()
    fields = set(Config().asdict().keys())
    missing = fields - set(rows)
    extra = set(rows) - fields
    assert not missing, f"flags missing from docs/flag_audit.md: {sorted(missing)}"
    assert not extra, f"audit rows for unknown flags: {sorted(extra)}"


def test_audit_evidence_resolves():
    rows = parse_audit()
    for flag, ev in rows.items():
        if ev.startswith("ignore:"):
            assert len(ev) > len("ignore: x"), f"{flag}: ignore needs a reason"
            continue
        assert ev.startswith("test:"), f"{flag}: evidence must be test: or ignore: ({ev})"
        ref = ev[len("test:"):]
        assert "::" in ref, f"{flag}: test reference needs file::name ({ref})"
        path, name = ref.split("::", 1)
        full = os.path.join(REPO, path)
        assert os.path.exists(full), f"{flag}: missing test file {path}"
        src = open(full).read()
        assert re.search(rf"def {re.escape(name)}\b", src), (
            f"{flag}: test {name} not found in {path}"
        )


def test_ignore_list_is_bounded():
    """The documented-ignore set is a closed list — additions must be
    deliberate (update this test with the reason)."""
    rows = parse_audit()
    ignored = sorted(f for f, ev in rows.items() if ev.startswith("ignore:"))
    assert ignored == [
        "attnconvchannel",
        "attndim",
        "fl_optim_mode",
        "max_devices_per_node",
        "maxrate",
        "maxsil",
        "minrate",
        "minsil",
        "numattnhead",
        "outputbinsize",
        "rndv_filepath",
        "world_rank",
    ], ignored
