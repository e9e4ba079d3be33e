"""Police the rotation ledger (VERDICT r13 #8 / r14 #2).

The driver records only the FIRST 50 registry entries each round, so parked
entries rely on (a) a named in-window verifier and (b) periodic rotation
back IN.  Before this test existed, staleness policing depended on the
judge reading COVERAGE.md by hand; now the suite FAILS when

- the ledger and the registry drift (missing/extra entries),
- a ledger ``window`` flag disagrees with ``QuerySpec.driver_visible``,
- a parked hash entry's last driver-green age exceeds 4 rounds
  (``tools/ledger.MAX_PARKED_AGE``), judged against the round currently
  being built (1 + newest CORRECTNESS_r{N}.json),
- a parked entry has no named verifier,
- COVERAGE.md's rendered table drifts from the JSON source of truth.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools import ledger as L  # noqa: E402


def _registry():
    from hedera_etl_spark.queries import load_registry

    return load_registry()


def test_ledger_clean():
    errs = L.validate(L.load(), _registry())
    assert not errs, "rotation-ledger violations:\n" + "\n".join(errs)


def test_ledger_staleness_rule_actually_bites():
    """The staleness check must FAIL for an artificially aged row — guards
    against the rule rotting into a tautology."""
    ledger = L.load()
    reg = _registry()
    victim = next(
        n for n, r in ledger.items()
        if not r.get("window") and not r.get("bench_only_rows_only")
    )
    aged = {**ledger, victim: {**ledger[victim], "last_driver_green": L.current_round() - L.MAX_PARKED_AGE - 1}}
    errs = L.validate(aged, reg)
    assert any(victim in e and "rotate it IN" in e for e in errs)


def test_ledger_never_checked_parked_entry_bites():
    ledger = L.load()
    victim = next(
        n for n, r in ledger.items()
        if not r.get("window") and not r.get("bench_only_rows_only")
    )
    aged = {**ledger, victim: {**ledger[victim], "last_driver_green": None}}
    errs = L.validate(aged, _registry())
    assert any(victim in e and "never driver-checked" in e for e in errs)


def test_coverage_md_table_in_sync():
    """COVERAGE.md's ledger table must be exactly what tools/ledger.py
    emits from the JSON — the prose doc cannot drift from the machine row."""
    txt = (Path(L.COVERAGE)).read_text()
    block = L.emit_md(L.load())
    assert L.BEGIN in txt and L.END in txt, "COVERAGE.md lost its LEDGER markers"
    start = txt.index(L.BEGIN)
    end = txt.index(L.END) + len(L.END)
    assert txt[start:end] == block, (
        "COVERAGE.md ledger table drifted from tools/coverage_ledger.json — "
        "run `python tools/ledger.py --emit-md`"
    )
