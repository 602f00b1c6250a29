"""Per-leg timings for ann_deterministic_battery (round-13): each tier
timed separately with the noop sink (guide §1.4), twice, on a warm JVM.

Usage: python tools/profile_ann_det.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.session import get_spark
from etl_sentinel_imagery_spark.sources.tables import load_table


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-ann-det", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_sentinel_imagery_spark.operators.similarity import (
        dequantize_topk,
        ivf_topk_expr,
        quantize_embeddings_int8,
        with_normalized,
    )
    from etl_sentinel_imagery_spark.queries import vectors_q as vq

    emb = load_table(spark, sf_dir, "embeddings")

    for rep in range(2):
        t0 = time.time()
        normed = with_normalized(
            emb, "vec_id", "embedding", "vid", "vn"
        ).localCheckpoint(eager=True)
        print(f"rep{rep} normalize+checkpoint: {time.time()-t0:.3f}s")

        def leg(name, thunk):
            spark.sparkContext.setJobDescription(f"leg {name}")
            t = time.time()
            noop(thunk())
            print(f"rep{rep} {name}: {time.time()-t:.3f}s")

        cand = normed.select(
            F.col("vid").alias("cand_id"), F.col("vn").alias("cand_vec")
        )
        qry = normed.filter(F.col("vid") < vq.N_QUERIES).select(
            F.col("vid").alias("query_id"), F.col("vn").alias("query_vec")
        )
        from pyspark.sql import Window

        from etl_sentinel_imagery_spark.operators.similarity import dot

        bw = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("cand_id")
        )
        leg(
            "brute",
            lambda: (
                cand.join(F.broadcast(qry))
                .filter(F.col("cand_id") != F.col("query_id"))
                .select(
                    "query_id",
                    "cand_id",
                    dot(F.col("query_vec"), F.col("cand_vec")).alias(
                        "cos_sim"
                    ),
                )
                .withColumn("rnk", F.row_number().over(bw))
                .filter(F.col("rnk") <= vq.TOP_K)
            ),
        )
        leg(
            "near_dup",
            lambda: vq._near_dup_pairs(spark, sf_dir, normed=normed),
        )
        leg(
            "seeded_expr",
            lambda: ivf_topk_expr(
                emb,
                F.col("vec_id") < vq.N_QUERIES,
                n_centroids=vq.N_CENTROIDS,
                k=vq.TOP_K,
                normed=normed,
            ),
        )

        def int8():
            quantized, scale = quantize_embeddings_int8(emb)
            qids = emb.filter(F.col("vec_id") < vq.N_QUERIES)
            return dequantize_topk(
                quantized, qids.select("vec_id"), scale, k=vq.TOP_K
            )

        leg("int8", int8)
        leg(
            "certified",
            lambda: vq._certified_leg(
                spark, sf_dir, emb, lambda df, m: df, normed=normed
            ),
        )
        leg("quant", lambda: vq._quant_battery(spark, sf_dir))
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
