"""PQ encode / ADC-scan throughput probe — the measured datapoint
behind docs/SCALE.md's PQ claims.

Synthesizes n vectors IN THE PLAN (spark.range + xxhash64-derived
dims — deterministic, no RNG, no files), then times:
- encode: zero-shuffle in-row argmins -> codes;
- ADC top-k: 5 broadcast queries scanning the full code table.

Usage: python tools/pq_throughput.py [n_vectors] [dims] [m] [k]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DIMS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
M = int(sys.argv[3]) if len(sys.argv) > 3 else 8
K = int(sys.argv[4]) if len(sys.argv) > 4 else 16


def main() -> int:
    from pyspark.sql import functions as F

    from hedera_etl_spark.operators.pquant import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )
    from hedera_etl_spark.session import get_spark

    spark = get_spark("pq-throughput")
    vec = F.array(
        *[
            (
                F.xxhash64(F.col("id"), F.lit(d)).bitwiseAND(F.lit((1 << 32) - 1))
                / F.lit(float(1 << 32))
                - F.lit(0.5)
            )
            for d in range(DIMS)
        ]
    )
    emb = (
        spark.range(N)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .repartition(32)
        .localCheckpoint()  # materialize so timings exclude synthesis
    )
    books = pq_codebooks(M, K, DIMS, scale=0.35)

    t0 = time.time()
    codes = pq_encode(emb, books).localCheckpoint()
    n = codes.count()
    enc_s = time.time() - t0

    t0 = time.time()
    rows = pq_adc_topk(
        emb, [0, 1, 2, 3, 4], 10, dims=DIMS, codebooks=books,
        codes_df=codes,
    ).collect()
    adc_s = time.time() - t0

    print(
        {
            "n_vectors": n,
            "dims": DIMS,
            "m": M,
            "k": K,
            "encode_sec": round(enc_s, 2),
            "encode_vectors_per_sec": int(n / enc_s),
            "adc_scan_sec": round(adc_s, 2),
            "adc_candidates_per_sec": int(5 * n / adc_s),
            "topk_rows": len(rows),
        }
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
