"""URL canonicalization + canonical-URL deduplication.

The first stage of every web-crawl curation pipeline (CCNet / RefinedWeb
/ Dolma all dedup by normalized URL before touching content): the same
page is crawled under syntactic variants — scheme/host case, explicit
default ports, tracking parameters, shuffled query order, fragments,
trailing slashes — and canonical-URL dedup removes the bulk of recrawl
duplicates for the cost of one string projection + one keyed aggregate,
BEFORE any content hashing runs.

Canonicalization rules (each a deliberate, documented choice — the rule
set is the operator's contract, mirrored exactly by the DuckDB oracle):

1. the fragment (``#...``) is dropped — never sent to the server;
2. the scheme and authority lowercase; the PATH keeps its case
   (paths are case-sensitive on most origins);
3. an explicit default port (``:80``/``:443``) is dropped.  The simple
   rule drops both regardless of scheme — the ``http://x:443`` corner a
   scheme-aware rule would preserve is a misconfiguration in practice
   and merging it is the safer dedup direction;
4. tracking parameters are removed: any key starting ``utm_``, plus
   ``fbclid``/``gclid``/``msclkid`` — the standard strip-list.  The
   exact keys match both the ``k=v`` form and the bare value-less key
   (``?fbclid``) — ad-click landers emit both shapes (ADVICE r10);
5. surviving query parameters sort lexicographically (param order is
   almost never significant; sorting merges the shuffled-order
   variants), and an emptied query drops its ``?``;
6. trailing slashes on the path are dropped (a bare-root ``host/``
   collapses to ``host``);
7. a NULL or empty ``url`` NEVER participates in dedup: ``concat``
   null-propagates, so without a rule every missing-URL doc would
   collapse into ONE group and all but the min-id doc would silently
   vanish (ADVICE r10 medium).  Real crawl frames commonly lack URLs;
   the dedup functions key those rows by a per-doc NUL-prefixed
   sentinel so each passes through unchanged, and decision rows
   surface them with ``canonical_url`` NULL.

Scale shape: canonicalization is a pure per-row string projection
(regexp / split / filter / array_sort — all JVM expressions, zero
Python), and the dedup is ONE hash aggregate keyed by the canonical
URL with map-side partial aggregation — the same single-exchange shape
as exact content dedup.  At 100 TB the exchange moves one narrow
(url, doc_id) pair per row, nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: query keys stripped as tracking noise (rule 4): ``utm_`` by prefix,
#: the rest by exact key
TRACKING_EXACT = ("fbclid", "gclid", "msclkid")


def canonical_url_sql(col_sql: str) -> str:
    """Spark-SQL expression string computing the canonical URL of the
    expression ``col_sql`` — also the template the DuckDB oracle mirrors
    (regexp_replace / regexp_extract / split / filter / sort / concat
    agree across the two engines for these patterns; the house
    cross-engine discipline, queries/__init__.py)."""
    no_frag = f"regexp_replace({col_sql}, '#.*$', '')"
    base = f"regexp_extract({no_frag}, '^([^?]*)', 1)"
    query = f"regexp_extract({no_frag}, '\\\\?(.*)$', 1)"
    auth = f"regexp_extract({base}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1)"
    # rules 2+3: lowercase scheme://authority, strip explicit default port
    auth_c = f"regexp_replace(lower({auth}), ':(80|443)$', '')"
    # the path is base minus the authority prefix (length arithmetic —
    # an anchored regexp alternative backtracks on long paths)
    path = f"substring({base}, length({auth}) + 1)"
    path_c = f"regexp_replace({path}, '/+$', '')"  # rule 6
    keep = " AND ".join(
        ["NOT startswith(p, 'utm_')"]
        + [f"NOT (p = '{k}' OR startswith(p, '{k}='))" for k in TRACKING_EXACT]
    )
    params = (
        f"array_join(array_sort(filter(split({query}, '&'), "
        f"p -> p != '' AND {keep})), '&')"
    )
    return (
        f"concat({auth_c}, {path_c}, "
        f"CASE WHEN {params} = '' THEN '' ELSE concat('?', {params}) END)"
    )


def canonical_urls(
    docs: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """``docs`` plus ``out_col`` holding the canonical form of
    ``url_col`` (pure projection, zero shuffle)."""
    return docs.withColumn(out_col, F.expr(canonical_url_sql(url_col)))


#: per-doc sentinel prefix for missing URLs (rule 7).  A NUL byte cannot
#: appear in a crawl URL, so sentinel keys can never collide with a real
#: canonical URL.
_MISSING_URL_PREFIX = "\x00doc:"


def url_dedup_decisions(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """One row per canonical URL: the min-``id_col`` keeper and the
    variant count — the crawl-recrawl dedup decision.  One projection +
    one partial-aggregated exchange keyed by the canonical URL.

    Rule 7: rows whose URL is NULL or canonicalizes to '' group under a
    per-doc sentinel (never with each other), so every missing-URL doc
    is its own keeper with ``canonical_url`` NULL in the output —
    missing a URL is not evidence of duplication."""
    canon = canonical_urls(docs, url_col)
    missing = F.col("canonical_url").isNull() | (F.col("canonical_url") == "")
    key = F.when(
        missing,
        F.concat(F.lit(_MISSING_URL_PREFIX), F.col(id_col).cast("string")),
    ).otherwise(F.col("canonical_url"))
    return (
        canon.groupBy(key.alias("__url_key"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select(
            F.when(
                F.col("__url_key").startswith(_MISSING_URL_PREFIX), F.lit(None)
            )
            .otherwise(F.col("__url_key"))
            .alias("canonical_url"),
            "keeper_id",
            "n_dups",
        )
    )


def url_dedup(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """``docs`` reduced to one row per canonical URL (the min-id
    keeper), original schema preserved — the apply form of
    :func:`url_dedup_decisions`."""
    keepers = url_dedup_decisions(docs, url_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return docs.join(keepers, id_col, "left_semi")
