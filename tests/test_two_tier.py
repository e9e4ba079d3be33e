"""The reference's whole design in one test: at-least-once streaming
ingest (duplicates land in the table) + the scheduled dedup job healing
them — docs/design/1_hedera_etl.md:109-125's two-tier exactly-once.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from hedera_etl_spark.operators.dedupe import DedupeJob, StateStore
from hedera_etl_spark.streaming.ingest import IngestPipeline


def tx_line(i: int) -> str:
    return json.dumps(
        {
            "consensusTimestamp": 1_570_800_000_000_000_000 + i * 1_000_000_000,
            "transactionType": 7 + i % 21,
            "transaction": {"body": {"transactionFee": str(100 + i), "memo": f"m{i}"}},
        }
    )


def test_at_least_once_ingest_healed_by_dedupe_job(spark, tmp_path):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    lines = [tx_line(i) for i in range(30)]
    replays = [tx_line(i) for i in range(0, 30, 5)]  # redelivered messages
    corrupt = ['{"consensusTimestamp": broken']
    (input_dir / "f1.json").write_text("\n".join(lines + replays + corrupt))

    table = str(tmp_path / "table")
    pipe = IngestPipeline(
        spark,
        str(input_dir),
        table,
        str(tmp_path / "errors"),
        str(tmp_path / "ckpt"),
        dedupe_in_stream=False,  # tier 0 off: pure at-least-once
    )
    pipe.run_to_completion()

    ingested = spark.read.parquet(table)
    assert ingested.count() == 36  # 30 + 6 replays all landed
    assert ingested.select("consensusTimestamp").distinct().count() == 30
    assert spark.read.parquet(str(tmp_path / "errors")).count() == 1

    # tier 2: the scheduled dedup job heals the replays (byte-identical
    # rows, so the arbitrary-within-group keep matches the reference's
    # ARRAY_AGG(x LIMIT 1) semantics)
    job = DedupeJob(
        spark,
        table,
        StateStore(spark, str(tmp_path / "state")),
        key="consensusTimestamp",
        tiebreak="consensusTimestamp",
    )
    result = job.run_incremental()
    assert result.duplicates_removed == 6

    healed = spark.read.parquet(table)
    assert healed.count() == 30
    assert healed.select("consensusTimestamp").distinct().count() == 30
    # typed payload survived the rewrite
    fees = {
        r["transactionFee"]
        for r in healed.select("transaction.body.transactionFee").collect()
    }
    assert fees == {100 + i for i in range(30)}
    # second run: nothing left to heal
    assert job.run_incremental().duplicates_removed == 0
