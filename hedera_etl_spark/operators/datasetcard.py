"""Dataset card: the machine-readable datasheet a prepared corpus
ships with ("Datasheets for Datasets", Gebru et al., CACM 2021 — the
practice every released training corpus follows).

One JSON document summarizing WHAT shipped and WHY the rest did not:

- content: row count, token totals, per-``group_cols`` mixes (source /
  language shares by docs AND tokens);
- quality: the one-pass exact table profile (nulls, cardinalities,
  ranges) restricted to portable statistic kinds;
- provenance: the removal-ledger drop report aggregated by
  (stage, reason) — every dropped doc accounted once;
- integrity: the shard manifest totals + checksum verification
  verdict, when the corpus was exported with ``export_shards``.

Everything derives from operators that already exist (profile_table,
read_ledger_path, verify_shards) — this module is the composition and
the stable JSON shape.  All aggregates are dimension-sized (groups,
stages, shards, columns); the corpus is scanned twice (content +
profile) plus once per shard verification — no driver-side state
beyond the card itself."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dataset_card(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_cols: tuple[str, ...] = (),
    ledger_dir: str | None = None,
    shards_dir: str | None = None,
    name: str = "corpus",
) -> dict:
    """Build the card as a plain dict (JSON-ready; no timestamps — the
    caller stamps release metadata, keeping the build deterministic)."""
    toks = F.size(F.split(F.col(text_col), " "))
    agg = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum(toks), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.sum(F.length(text_col)), F.lit(0))
        .cast("long")
        .alias("n_chars"),
    ).collect()[0]
    card: dict = {
        "name": name,
        "schema": [
            {"column": f.name, "type": f.dataType.simpleString()}
            for f in docs.schema.fields
        ],
        "content": {
            "n_docs": int(agg["n_docs"]),
            "n_tokens": int(agg["n_tokens"]),
            "n_chars": int(agg["n_chars"]),
        },
        "mixes": {},
        "quality_profile": [],
        "removals": None,
        "shards": None,
    }
    for g in group_cols:
        rows = (
            docs.groupBy(g)
            .agg(
                F.count("*").cast("long").alias("docs"),
                F.coalesce(F.sum(toks), F.lit(0)).cast("long").alias("tokens"),
            )
            .orderBy(F.col("docs").desc(), F.col(g))
            .collect()
        )
        card["mixes"][g] = [
            {
                "value": r[g],
                "docs": int(r["docs"]),
                "tokens": int(r["tokens"]),
            }
            for r in rows
        ]
    from hedera_etl_spark.operators.profile import profile_table

    prof = profile_table(docs)
    keep = (
        "column", "dtype", "n_rows", "n_nulls", "approx_distinct",
        "min", "max",
    )
    for r in prof.collect():
        d = r.asDict()
        card["quality_profile"].append({k: d.get(k) for k in keep if k in d})
    if ledger_dir is not None:
        from hedera_etl_spark.operators.provenance import read_ledger_path

        led = read_ledger_path(spark, ledger_dir)
        rows = (
            led.groupBy("stage", "reason")
            .agg(F.count("*").cast("long").alias("dropped"))
            .orderBy(F.col("dropped").desc(), "stage", "reason")
            .collect()
        )
        card["removals"] = {
            "total_dropped": int(sum(r["dropped"] for r in rows)),
            "by_stage": [
                {
                    "stage": r["stage"],
                    "reason": r["reason"],
                    "dropped": int(r["dropped"]),
                }
                for r in rows
            ],
        }
    if shards_dir is not None:
        from hedera_etl_spark.operators.export import verify_shards

        checks = verify_shards(spark, shards_dir).collect()
        card["shards"] = {
            "n_shards": len(checks),
            "n_rows": int(sum(r["n_rows"] for r in checks)),
            "all_checksums_ok": bool(all(r["ok"] for r in checks)),
        }
    return card


def write_dataset_card(card: dict, path: str) -> None:
    """Atomic single-file write (tmp + rename — the fsutil discipline)."""
    import os

    tmp = path + ".__new"
    with open(tmp, "w") as fh:
        json.dump(card, fh, indent=2, sort_keys=True)
    os.replace(tmp, path)
