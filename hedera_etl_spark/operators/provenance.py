"""Per-document removal provenance for the curation pipeline.

Every production curation pipeline eventually faces the question "why
did my document disappear?"; per-stage COUNTS (``stage_observations``)
answer how many, never which or why.  The ledger records, for every
document the pipeline drops, one row

    (doc_id, stage, reason, ref_id)

where ``ref_id`` carries the stage's attribution when it has one — the
keeper a duplicate collapsed into (exact / near / semantic dedup) or
the eval item that contaminated the doc (exact decontamination) — and
NULL where the stage has none (sampling, quality floors, the Bloom
decontamination path whose whole point is never materializing
reference postings).

Design (VERDICT r10 #3): the ledger is built from data each stage
ALREADY computes — keeper decisions, contamination profiles, filter
predicates — never from a second pass over text.  Stages without a
decision frame log their drops as one (pre anti-join post) on the id
column; because the ledger makes every stage boundary a two-consumer
subtree (the next stage AND the anti-join), the pipeline lazily
``localCheckpoint``s each recorded boundary when a ledger is attached
(the checkpoint-vs-rescan discipline, docs/PERF_NOTES.md) — without
that, materializing the ledger would re-run the dedup chain once per
recorded stage.

Scale: each recorded frame is ids + constants (text never enters the
ledger); the unions are metadata-only; the anti-joins reuse the
checkpointed boundaries.  At 100 TB the ledger costs one narrow
id-keyed anti-join per stage — the same shape as the stage's own
semi-join — and the output is proportional to DROPPED docs, not the
corpus.

A ledger instance is single-use: attach a fresh one per
``prepare_training_corpus`` call (mirroring ``stage_observations``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class RemovalLedger:
    """Accumulates per-document removal records across pipeline stages.

    ``df()`` returns the union: (doc_id, stage, reason, ref_id) — one
    row per dropped document, ``doc_id`` keeping the input id type and
    ``ref_id`` cast to string (it may hold a doc id or an eval id).
    """

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def record(
        self,
        stage: str,
        reason: str,
        dropped: DataFrame,
        id_col: str = "doc_id",
        ref_col: str | None = None,
    ) -> None:
        """Append drop records: one per row of ``dropped``.

        ``dropped`` must carry ``id_col``; ``ref_col`` optionally names
        the attribution column (keeper doc id, eval id).  Lazy: nothing
        executes until ``df()`` is acted on.
        """
        ref = (
            F.col(ref_col).cast("string")
            if ref_col is not None
            else F.lit(None).cast("string")
        )
        self._frames.append(
            dropped.select(
                F.col(id_col).alias("doc_id"),
                F.lit(stage).alias("stage"),
                F.lit(reason).alias("reason"),
                ref.alias("ref_id"),
            )
        )

    @property
    def n_stages(self) -> int:
        return len(self._frames)

    def df(self) -> DataFrame:
        """The full ledger.  Raises if no stage ever recorded (the
        pipeline was not run with this ledger attached)."""
        if not self._frames:
            raise ValueError(
                "empty RemovalLedger: pass it to prepare_training_corpus "
                "(removal_ledger=...) and run the pipeline first"
            )
        out = self._frames[0]
        for f in self._frames[1:]:
            out = out.unionByName(f)
        return out


def read_ledger_path(spark, path: str) -> DataFrame:
    """Read a ledger written by either pipeline: the batch path (one
    parquet dir from ``prepare --removal-ledger-out``) or the streaming
    layout (``batch-<epoch>`` subdirectories from
    ``CorpusIngestPipeline(ledger_dir=...)``)."""
    import os

    batch_dirs = sorted(
        d
        for d in (os.listdir(path) if os.path.isdir(path) else [])
        if d.startswith("batch-")
    )
    if batch_dirs:
        return spark.read.parquet(*[os.path.join(path, d) for d in batch_dirs])
    return spark.read.parquet(path)


def drop_chain(
    ledger: DataFrame,
    doc_id: int,
    max_hops: int = 10,
    no_follow_stages: tuple = ("decontam",),
) -> DataFrame:
    """"Why did doc X disappear": the doc's own removal records plus the
    transitive fate of every referenced keeper (VERDICT r11 #5).

    A dropped doc's ``ref_id`` names the doc it collapsed into — but
    that keeper may itself have been dropped by a LATER stage (or a
    later epoch), so the full answer is a chain: loser → keeper →
    keeper's own fate → …  Returns the ledger rows along the chain with
    a ``hop`` column (0 = the queried doc); a referenced doc with no
    ledger rows survived (or was never ingested) — the chain ends there.

    Scale shape: each hop is ONE filter over the ledger on a handful of
    literal ids (parquet min/max pruning applies) and the per-doc output
    is bounded by the doc's own drop records — a lookup, not a scan-all
    join.  ``ref_id`` values that are not doc ids (NULL, non-numeric,
    or any stage in ``no_follow_stages`` — decontamination's ref lives
    in the EVAL-item id namespace, not the corpus namespace) are
    reported but not followed; cycles cannot occur (a keeper reference
    always points at the id that WON a deterministic min-id election,
    and a doc's rows are recorded at most once per stage) but the
    ``seen`` set and ``max_hops`` bound the walk anyway."""
    cols = ["doc_id", "stage", "reason", "ref_id"]
    has_epoch = "epoch" in ledger.columns
    if has_epoch:
        cols.append("epoch")
    # doc ids keep the CORPUS id type (RemovalLedger preserves it —
    # string-keyed corpora are legal), so the output schema inherits it
    # and refs are followed numerically only for numeric id types
    id_type = ledger.schema["doc_id"].dataType
    numeric_ids = isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    schema = T.StructType(
        [
            T.StructField("hop", T.IntegerType()),
            T.StructField("doc_id", id_type),
            T.StructField("stage", T.StringType()),
            T.StructField("reason", T.StringType()),
            T.StructField("ref_id", T.StringType()),
        ]
        + ([T.StructField("epoch", T.StringType())] if has_epoch else [])
    )
    spark = ledger.sparkSession
    out_rows: list[tuple] = []
    seed = int(doc_id) if numeric_ids else doc_id
    seen = {seed}
    frontier = [seed]
    for hop in range(max_hops):
        if not frontier:
            break
        hits = (
            ledger.filter(F.col("doc_id").isin(frontier))
            .select(*cols)
            .collect()
        )
        nxt: list = []
        for r in hits:
            out_rows.append((hop, *[r[c] for c in cols]))
            if r["stage"] in no_follow_stages:
                continue  # ref is not a corpus doc id
            ref_doc = r["ref_id"]
            if numeric_ids:
                try:
                    ref_doc = int(ref_doc)
                except (TypeError, ValueError):
                    continue  # NULL / non-numeric attribution: report only
            elif ref_doc is None:
                continue
            if ref_doc not in seen:
                seen.add(ref_doc)
                nxt.append(ref_doc)
        frontier = nxt
    # reason joins the sort: one stage can record several sub-reasons
    # for a doc (quality_floor), and the chain must print determinately
    return spark.createDataFrame(out_rows, schema).orderBy(
        "hop", "doc_id", "stage", "reason"
    )
