"""sf0.1-scale soak of the r11 corpus-ingest additions: canonical-URL
dedup (persistent URL store), per-epoch removal-provenance ledger,
versioned eval rotation, and the compaction replay heal — with crash
injections in the NEW windows (the soak ritual — every store soak so
far has found a real bug).

Corpus: sf0.1 documents, each given a syntactic URL VARIANT of a
canonical URL derived from its id (case / default port / tracking
params / trailing slash / fragment — the urlnorm rule surface); a 1/53
slice doubles as eval v1.

Epochs and injections:

1. epoch 1 baseline (URL store + ledger + eval v1): accepted and
   ledgered ids PARTITION the input exactly-once at corpus scale;
   contaminated docs reach neither the corpus nor any store; in-batch
   URL-variant groups keep exactly their min-id doc with the keeper
   named in the ledger.
2. epoch 2 recrawl wave: the same canonical URLs under fresh variants
   with DIFFERENT content (the recrawl case only the URL stage can
   catch) plus genuinely new URLs — recrawls drop with the epoch-1
   claiming doc named; new URLs accept.
3. CRASH WINDOW (new in r11): the signature-store batch dir of epoch 2
   is deleted while the URL store kept its commit — dying between the
   URL-store commit and the signature-store commit.  The replay must
   re-derive the IDENTICAL decision (the URL stage excludes its own
   batch; the content stage re-decides deterministically) and leave the
   corpus byte-identical.
4. eval rotation to v2 at the drained boundary: an epoch-3 doc clean
   under v1 but contaminated under v2 drops; the per-epoch version
   records show v1 for epochs 1-2 and v2 for epoch 3; a replay of
   epoch 1 AFTER the rotation re-applies v1 (byte-identical corpus).
5. compaction of ALL stores (corpus + signature + paragraph-less here
   + URL), then a replay of epoch 1 (the replay heal at sf0.1 scale)
   and one more recrawl epoch — history still cuts post-compaction.

Run: python tools/soak_corpus_r11.py [sf_dir] [workdir]
Prints one JSON line per check; exits 1 on any violated invariant.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from hedera_etl_spark.session import get_spark
from hedera_etl_spark.streaming.corpus import CorpusIngestPipeline
from hedera_etl_spark.tables import load_table


def log(**kw):
    print(json.dumps(kw), flush=True)


def write_jsonl(path: str, rows) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        for doc_id, text, url in rows:
            fh.write(
                json.dumps({"doc_id": doc_id, "text": text, "url": url}) + "\n"
            )
    os.rename(tmp, path)


def variant_url(doc_id: int, recrawl: int = 0) -> str | None:
    """A syntactic variant of the canonical URL for ``doc_id``; every
    (doc_id, recrawl) pair canonicalizes to the same URL.  1/29 of docs
    have NO url (the rule-7 passthrough population)."""
    if doc_id % 29 == 0:
        return None
    sel = (doc_id + recrawl) % 4
    scheme = "HTTPS" if sel == 0 else "https"
    host = f"h{doc_id % 7}.example.com" + (":443" if sel == 1 else "")
    path = f"/page-{doc_id}" + ("/" if sel == 2 else "")
    query = "?b=2&utm_source=f&a=1" if sel == 3 else "?a=1&b=2"
    frag = "#top" if sel == 0 else ""
    return f"{scheme}://{host}{path}{query}{frag}"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus_soak_r11"
    shutil.rmtree(work, ignore_errors=True)
    inp = os.path.join(work, "in")
    os.makedirs(inp)
    spark = get_spark("corpus-soak-r11")
    spark.sparkContext.setLogLevel("ERROR")
    failures: list[str] = []

    def check(name: str, ok: bool, **detail):
        if not ok:
            failures.append(name)
        log(check=name, ok=ok, **detail)

    docs = [
        (int(r["doc_id"]), str(r["text"]))
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    n_docs = len(docs)
    eval_rows = [(10_000_000 + i, t) for i, t in docs if i % 53 == 0]
    eval_v1 = spark.createDataFrame(eval_rows, ["doc_id", "text"])
    # a doc shorter than the 13-gram window has no shingles and CANNOT
    # be contaminated (decontam.py semantics) — exclude it from the
    # hygiene expectation
    contaminated_ids = {
        i for i, t in docs if i % 53 == 0 and len(t.split()) >= 13
    }

    def pipeline(eval_docs=eval_v1, version="v1"):
        return CorpusIngestPipeline(
            spark,
            input_dir=inp,
            corpus_table=os.path.join(work, "corpus"),
            store_path=os.path.join(work, "store"),
            checkpoint=os.path.join(work, "ckpt"),
            url_field="url",
            ledger_dir=os.path.join(work, "ledger"),
            eval_docs=eval_docs,
            eval_version=version,
            max_files_per_trigger=1,
        )

    # ---- epoch 1: baseline -------------------------------------------------
    # every 11th doc also arrives as a URL VARIANT duplicate (same
    # canonical URL, different content) under a shifted id
    e1 = [(i, t, variant_url(i)) for i, t in docs]
    url_dupes = [
        (1_000_000 + i, "recrawl body " + t[:60], variant_url(i, recrawl=1))
        for i, t in docs
        if i % 11 == 0 and i % 29 != 0
    ]
    e1 += url_dupes
    write_jsonl(os.path.join(inp, "e1.jsonl"), e1)
    p = pipeline()
    t0 = time.time()
    m = p.run_until_drained()
    log(epoch=1, sec=round(time.time() - t0, 1), rows_in=m.rows_in,
        accepted=m.accepted, dropped_url=m.dropped_url,
        dropped_contaminated=m.dropped_contaminated)

    corpus1 = {r["doc_id"] for r in p.read_corpus().collect()}
    ledger1 = [
        (r["doc_id"], r["stage"], r["reason"], r["ref_id"])
        for r in p.read_ledger().collect()
    ]
    input_ids = {i for i, _, _ in e1}
    led_ids = [d for d, *_ in ledger1]
    check(
        "epoch1_partition_exactly_once",
        len(led_ids) == len(set(led_ids))
        and (corpus1 | set(led_ids)) == input_ids
        and not (corpus1 & set(led_ids)),
        corpus=len(corpus1), ledgered=len(led_ids), input=len(input_ids),
    )
    check("epoch1_url_dupes_dropped", m.dropped_url == len(url_dupes),
          dropped=m.dropped_url, expected=len(url_dupes))
    url_led = {d: ref for d, st, re_, ref in ledger1 if st == "url_dedup"}
    check(
        "epoch1_url_ledger_names_keeper",
        all(url_led.get(1_000_000 + i) == str(i)
            for i, _ in docs if i % 11 == 0 and i % 29 != 0),
    )
    check("epoch1_no_contaminated_in_corpus",
          not (corpus1 & contaminated_ids))

    # ---- epoch 2: recrawl wave --------------------------------------------
    recrawls = [
        (2_000_000 + i, "second recrawl content " + t[:40], variant_url(i, 2))
        for i, t in docs
        if i % 13 == 0 and i % 29 != 0 and i % 53 != 0
    ]
    fresh = [
        # texts must be mutually DISSIMILAR or the in-batch near-dup
        # stage (correctly) collapses them — vary most tokens by j
        (3_000_000 + j,
         " ".join(f"fresh{j}w{k}" for k in range(10)),
         f"https://new{j % 5}.example.com/n/{j}")
        for j in range(40)
    ]
    write_jsonl(os.path.join(inp, "e2.jsonl"), recrawls + fresh)
    p = pipeline()
    m = p.run_until_drained()
    log(epoch=2, rows_in=m.rows_in, accepted=m.accepted,
        dropped_url=m.dropped_url)
    corpus2 = {r["doc_id"] for r in p.read_corpus().collect()}
    check("epoch2_recrawls_dropped_fresh_accepted",
          m.dropped_url == len(recrawls)
          and {d for d, _, _ in fresh} <= corpus2,
          dropped=m.dropped_url, expected=len(recrawls))
    # shared checkpoint lineage: epoch 2 is stream-1
    led2 = {
        r["doc_id"]: (r["reason"], r["ref_id"])
        for r in p.read_ledger().filter(
            "epoch = 'stream-1' AND stage = 'url_dedup'"
        ).collect()
    }
    check(
        "epoch2_vs_store_ledger_names_epoch1_doc",
        all(led2.get(2_000_000 + i) == ("url_duplicate_vs_store", str(i))
            for i, _ in docs
            if i % 13 == 0 and i % 29 != 0 and i % 53 != 0),
    )

    # ---- crash window: sig-store commit lost, URL store kept ---------------
    sig_batch = os.path.join(work, "store", "content", "batch=stream-1")
    sig_batch_s = os.path.join(work, "store", "sigs", "batch=stream-1")
    shutil.rmtree(sig_batch)
    shutil.rmtree(sig_batch_s)
    corpus_batch = os.path.join(work, "corpus", "batch-stream-1")
    shutil.rmtree(corpus_batch)  # corpus append also lost
    batch2 = spark.createDataFrame(
        recrawls + fresh, "doc_id long, text string, url string"
    )
    p._process_batch(batch2, 1)
    corpus2b = {r["doc_id"] for r in p.read_corpus().collect()}
    check("crash_replay_byte_identical", corpus2b == corpus2,
          delta=len(corpus2b ^ corpus2))

    # ---- eval rotation to v2 ------------------------------------------------
    target_id, target_text = next(
        (i, t) for i, t in docs if i % 53 != 0 and i % 29 != 0
    )
    eval_v2 = spark.createDataFrame(
        [(20_000_000, "brand new benchmark item " + target_text)],
        ["doc_id", "text"],
    )
    p.set_eval_docs(eval_v2, "v2")
    e3 = [
        (4_000_000, "under v2 contaminated " + target_text,
         "https://v2.example.com/a"),
        (4_000_001, "clean doc for epoch three entirely new words",
         "https://v2.example.com/b"),
    ]
    write_jsonl(os.path.join(inp, "e3.jsonl"), e3)
    m = p.run_until_drained()
    corpus3 = {r["doc_id"] for r in p.read_corpus().collect()}
    check("epoch3_v2_contamination_applies",
          4_000_000 not in corpus3 and 4_000_001 in corpus3)
    versions = p._epoch_eval_versions()
    check("epoch_versions_recorded",
          versions.get("stream-0") == "v1"
          and versions.get("stream-1") == "v1"
          and versions.get("stream-2") == "v2",
          versions=versions)

    # replay epoch 1 AFTER the rotation: must re-apply v1
    shutil.rmtree(os.path.join(work, "corpus", "batch-stream-0"))
    batch1 = spark.createDataFrame(
        e1, "doc_id long, text string, url string"
    )
    p._process_batch(batch1, 0)
    corpus_after = {r["doc_id"] for r in p.read_corpus().collect()}
    check("replay_after_rotation_keeps_v1_decision",
          corpus_after == corpus3, delta=len(corpus_after ^ corpus3))

    # ---- compaction + replay heal -------------------------------------------
    folded = (p.compact_corpus(), p.store.compact(), p.url_store.compact())
    log(step="compaction", folded=folded)
    # the epoch-1 corpus dir is now FOLDED (retired batches count as
    # present), so the heal under test is store-side: has_batch /
    # exclusion must resolve the folded epoch, the replay must change
    # nothing, and the retired corpus dir must NOT resurrect
    p._process_batch(batch1, 0)
    corpus_healed = {r["doc_id"] for r in p.read_corpus().collect()}
    check(
        "post_compaction_replay_heals",
        corpus_healed == corpus3
        and p.store.has_batch("stream-0")
        and p.url_store.has_batch("stream-0")
        and not os.path.exists(
            os.path.join(work, "corpus", "batch-stream-0")
        ),
        delta=len(corpus_healed ^ corpus3),
    )

    # one more recrawl epoch after compaction: history still cuts
    e4 = [(5_000_000 + i, "post compaction recrawl " + t[:30],
           variant_url(i, 3))
          for i, t in docs if i % 17 == 0 and i % 29 != 0]
    write_jsonl(os.path.join(inp, "e4.jsonl"), e4)
    base_dropped = p.metrics.dropped_url  # instance metrics accumulate
    m = p.run_until_drained()
    check("post_compaction_recrawls_still_cut",
          m.dropped_url - base_dropped == len(e4),
          dropped=m.dropped_url - base_dropped, expected=len(e4))

    log(verdict="FAIL" if failures else "PASS", failures=failures,
        n_docs=n_docs)
    shutil.rmtree(work, ignore_errors=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
