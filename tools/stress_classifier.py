"""Scale-path stress: quality-classifier training at 1M docs with
1000 partitions (round-4 verdict #6).

The risk being probed is GRADIENT-PARTIAL TRAFFIC: each training
iteration collects one dense (dim+1)-double partial per Arrow batch —
at dim 2^16 that is ~512 KB per partial, so 1000 partitions × 5
iterations ≈ 2.6 GB through the driver ACROSS the whole run but only
~512 MB per iteration, arriving as a streamed collect of
1000 × 512 KB rows (never one giant task result). The stress measures
the per-iteration wall at that partition count and proves the learned
model still separates (held-out-quality AUC), i.e. partial summation
stays exact under 1000-way partial ordering.

Corpus: Spark-generated docs of 12 hash-mixed VOCAB words; even ids
additionally carry two 'golden' quality tokens and are labeled 1 —
linearly separable by construction, so a healthy train loop reaches
AUC ≈ 1 in a handful of full-batch steps.

Usage: python tools/stress_classifier.py [n_docs] [n_partitions] [n_iter]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.classifier import (
    auc,
    hash_features,
    score_logreg,
    train_logreg,
)
from etl_sentinel_imagery_spark.session import get_spark
from tools.stress_minhash import VOCAB

DIM = 1 << 16


def synth_docs(spark, n: int, n_partitions: int):
    v = len(VOCAB)
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    words = [
        F.element_at(
            vocab_arr,
            (F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(v)) + 1).cast(
                "int"
            ),
        )
        for j in range(12)
    ]
    text = F.concat_ws(" ", *words)
    golden = F.concat_ws(
        " ", text, F.lit("lucid prose careful sourcing")
    )
    return spark.range(n).repartition(n_partitions).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, golden).otherwise(text).alias("text"),
        (F.col("id") % 2 == 0).cast("int").alias("label"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    # shuffle_partitions = n_parts so the feature-label JOIN keeps the
    # claimed partition count (at the default 32 the join silently
    # collapses 1000 → 32 and the traffic claim tests nothing); the
    # first run at the 1 GB default heap OOMed in the eager
    # localCheckpoint — 16g is the stress-tool convention
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(
        "stress_classifier",
        shuffle_partitions=n_parts,
        extra_conf={"spark.driver.memory": mem},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n, n_parts).localCheckpoint()
    t0 = time.time()
    feats = hash_features(docs, dim=DIM).repartition(n_parts)
    feats = feats.localCheckpoint()
    t_feat = time.time() - t0
    print(f"feature pass n={n}: {t_feat:.1f}s ({n_parts} partitions)")

    labels = docs.select("doc_id", "label")
    t0 = time.time()
    w = train_logreg(
        feats, labels, dim=DIM, n_iter=n_iter, lr=2.0
    )
    t_train = time.time() - t0
    partial_mb = n_parts * (DIM + 1) * 8 / 2**20
    print(
        f"train n={n} parts={n_parts} iters={n_iter}: {t_train:.1f}s "
        f"({t_train / n_iter:.1f}s/iter; >= {partial_mb:.0f} MB of "
        f"gradient partials per iter through the driver)"
    )

    t0 = time.time()
    scored = score_logreg(feats, w).join(labels, "doc_id")
    a = auc(scored)
    print(f"score+exact-AUC pass: {time.time() - t0:.1f}s  AUC={a:.4f}")
    assert a > 0.99, f"separable corpus must reach AUC ~1, got {a}"
    spark.stop()


if __name__ == "__main__":
    main()
