"""Distributed PageRank over an edge DataFrame.

Spark ships PageRank only in GraphX (Scala); a DataFrame engine needs
it as a plain operator (Page et al. 1999 — link analysis for dedup
authority, source weighting, citation ranking). Power iteration as
joins, nothing driver-side but the dangling-mass scalar:

    contrib(dst) = Σ_{src→dst} rank(src) / outdeg(src)
    rank' = (1−d)/N + d · (contrib + dangling_mass/N)

- out-degrees compute once (one combinable groupBy) and join into the
  edge table once, OUTSIDE the loop — the per-iteration work is one
  join (edges ⋈ ranks on src) + one combinable groupBy(dst) + a left
  join back onto the vertex set (so sink-only vertices keep receiving
  rank).
- dangling (out-degree-0) vertices redistribute their rank uniformly —
  the standard stochastic-matrix fix; their total mass is a one-scalar
  aggregate per iteration (control-plane, like the k-means partials).
- every iteration ends in localCheckpoint: the lineage would otherwise
  double per round (the iterative-algorithm recompute trap the
  connected-components rounds also pin).

Deterministic float caveat: per-vertex sums shuffle, so last-ulp
ordering differs run to run — accuracy is pinned in pytest against a
dense numpy power iteration (1e-9), not the hash battery (same policy
as every ln/iterative operator here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """(node, rank) over the directed graph ``edges``; ranks sum to 1.

    Unweighted (default): parallel edges count once (the edge set is
    made distinct). With ``weight_col``: each edge carries rank
    proportional to weight / Σ(out-weights) — parallel edges are
    meaningful and kept (their weights add)."""
    if weight_col is None:
        e = edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.lit(1.0).alias("w"),
        ).distinct()
    else:
        e = (
            edges.select(
                F.col(src_col).alias("src"),
                F.col(dst_col).alias("dst"),
                F.col(weight_col).cast("double").alias("w"),
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.sum("w").alias("deg"))
    # (src, dst, deg) fixed for the whole run — compute once, checkpoint
    # so iterations reuse the materialized table instead of re-joining
    fan = e.join(outdeg, "src").localCheckpoint()
    # the dangling NODE SET is also run-constant: checkpoint it so the
    # per-iteration mass collect doesn't re-run the edge distinct +
    # out-degree aggregation from lineage every round (review finding)
    dangling_nodes = nodes.join(
        outdeg, nodes["node"] == outdeg["src"], "anti"
    ).localCheckpoint()

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        dangling = (
            ranks.join(dangling_nodes, "node", "semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contrib = (
            fan.join(ranks, fan["src"] == ranks["node"])
            .select(
                "dst",
                (F.col("rank") * F.col("w") / F.col("deg")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.lit(dangling / n)
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
