"""Guard the driver contract (__spark_entry__.py) — the integration point
the whole correctness gate hangs on.  Round 1 shipped a working engine the
driver couldn't see because this file was a stub; this test fails loudly
if that ever regresses.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import pytest

ENTRY = Path(__file__).resolve().parent.parent / "__spark_entry__.py"


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location("__spark_entry__", ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_queries_and_oracles_align(entry_mod):
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    # EXACTLY 50: the driver records only the FIRST 50 registry entries in
    # CORRECTNESS_r{N}.json, so entry #51 is silently unverified (this is
    # how q20-q25 vanished from the r5 report).  Adding a new entry means
    # consolidating or removing an old one first — see COVERAGE.md.
    assert len(q) == 50, (
        f"registry has {len(q)} entries; the driver verifies only the first "
        "50 — consolidate before adding (COVERAGE.md 'Registry budget')"
    )
    assert set(o) <= set(q)
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in o.values())


def test_every_oracle_is_valid_duckdb_sql(entry_mod):
    """Catch oracle syntax errors without waiting for the driver: DuckDB
    must at least PREPARE every oracle against the real views."""
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.execute(f"PREPARE q AS {sql}")
            con.execute("DEALLOCATE q")
        except Exception as e:  # pragma: no cover
            pytest.fail(f"oracle for {name} does not parse/bind: {e}")


def test_entry_runs_on_unconfigured_session(entry_mod, spark):
    """entry() must self-configure whatever session the driver hands it
    and return rows with a stable schema."""
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["r_name", "n_name", "total_price", "num_orders"]
