"""Scale-path stress: corpus-wide line dedup over a synthetic corpus.

Builds multi-line documents Spark-side: each doc gets ``lines_per_doc``
hash-mixed unique lines, and every doc additionally carries one of
``n_boiler`` shared BOILERPLATE lines (the CCNet target: navigation /
banner text repeated across the whole corpus). Runs
``operators.line_dedup.duplicated_line_stats`` end-to-end and checks
that exactly the boilerplate occurrences are flagged (every doc has
exactly one) while unique lines survive.

Evidence for PERF.md that the md5(line) frequency shuffle, the
sort-merge mark join, and the doc-id reassembly hold at corpus scale.

Usage: python tools/stress_line_dedup.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.line_dedup import (
    duplicated_line_stats,
)
from etl_sentinel_imagery_spark.session import get_spark
from tools.stress_minhash import VOCAB


def synth_multiline_docs(
    spark, n_docs: int, lines_per_doc: int = 8, n_boiler: int = 50
):
    """doc i = lines_per_doc unique hash-mixed lines + one of n_boiler
    shared boilerplate lines inserted at a hash-chosen position."""
    v = len(VOCAB)
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])

    def line_at(doc_id_col, j):
        # 7 hash-mixed words + an embedded (doc,line) token: realistic
        # shuffle bytes, but PROVABLY no accidental corpus duplicates —
        # at 8M lines, purely hash-mixed 8-word lines produced a
        # handful of birthday collisions (measured: 3 pairs at 1M docs)
        # that made the exactness check ambiguous
        return F.concat_ws(
            " ",
            F.concat(
                F.lit("u"),
                doc_id_col.cast("string"),
                F.lit("x"),
                j.cast("string"),
            ),
            F.transform(
                F.sequence(F.lit(0), F.lit(6)),
                lambda w: F.element_at(
                    vocab_arr,
                    (
                        F.pmod(
                            F.xxhash64(doc_id_col, j, w), F.lit(v)
                        )
                        + 1
                    ).cast("int"),
                ),
            ),
        )

    boiler = F.concat(
        F.lit("boilerplate banner variant number "),
        F.pmod(F.col("doc_id"), F.lit(n_boiler)).cast("string"),
        F.lit(" subscribe today for updates"),
    )
    pos = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(lines_per_doc))
    lines = F.transform(
        F.sequence(F.lit(0), F.lit(lines_per_doc - 1)),
        lambda j: F.when(j == pos, boiler).otherwise(
            line_at(F.col("doc_id"), j)
        ),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(lines, "\n").alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")
    spark = get_spark(
        "stress-line-dedup", extra_conf={"spark.driver.memory": mem}
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_multiline_docs(spark, n_docs)
    t0 = time.time()
    stats = duplicated_line_stats(docs, min_chars=20)
    agg = stats.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_lines").alias("lines"),
        F.sum("n_dup_lines").alias("dup_lines"),
        F.sum("k1_n_dup_lines").alias("k1_dup_lines"),
        F.sum(
            (F.col("n_dup_lines") == 1).cast("long")
        ).alias("docs_with_one_dup"),
    ).collect()[0]
    wall = time.time() - t0
    n_boiler = 50
    ok = (
        agg["docs"] == n_docs
        and agg["dup_lines"] == n_docs  # exactly one boiler line per doc
        and agg["docs_with_one_dup"] == n_docs
        and agg["k1_dup_lines"] == n_docs - n_boiler  # firsts survive
    )
    print(
        f"n_docs={agg['docs']} lines={agg['lines']} "
        f"dup_lines={agg['dup_lines']} k1_dup_lines={agg['k1_dup_lines']} "
        f"exact={'OK' if ok else 'MISMATCH'} "
        f"wall={wall:.1f}s docs_per_sec={n_docs / wall:.0f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
