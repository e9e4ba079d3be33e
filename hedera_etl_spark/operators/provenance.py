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
