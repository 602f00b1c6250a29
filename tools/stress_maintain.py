"""Cross-process proof that the lock-free matrix covers the whole
MAINTENANCE LADDER (round-6 verdict #7): one process runs
``maintain_table`` (analyze → fold DV chains → bin-pack small files →
vacuum) in a loop while a SECOND real process writes continuously —
appends of small files (feeding the bin-packer), DV deletes and
merge upserts (feeding the DV folder) — with no coordination beyond
the claim protocol itself.

Invariant at the end: the table's content is BIT-STABLE against the
writer's local model — exact integer signatures (count, sum of keys,
sum of values, sum of key*value mod a prime) over both the untouched
seed range and the writer's churned range — and no TxConflict ever
surfaced in either process. Both sessions are deliberately small
(local[8]/local[4]) so two JVMs coexist on one box; the race surface
is the protocol, not the data volume.

Usage: python tools/stress_maintain.py [n_seed] [writer_rounds]
       (internal) --writer <table> <rounds> <out_json>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

OFF = 10_000_000  # writer keys live at doc_id >= OFF; seed below
P = (1 << 61) - 1


def _sig(rows):
    n = s_k = s_v = s_kv = 0
    for k, v in rows:
        n += 1
        s_k += k
        s_v += v
        s_kv = (s_kv + (k % P) * (v % P)) % P
    return {"n": n, "sum_k": s_k, "sum_v": s_v, "sum_kv": s_kv}


def _df_sig(df):
    from pyspark.sql import functions as F

    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("doc_id").alias("sum_k"),
        F.sum("val").alias("sum_v"),
    ).collect()[0]
    # sum_kv needs modular arithmetic — exact in int python, collected
    # per-partition via an int sum of (k%P)*(v%P)%P then folded mod P
    parts = (
        df.selectExpr(
            f"(doc_id % {P}) * (val % {P}) % {P} as kv"
        )
        .groupBy()
        .agg(F.sum("kv").alias("s"))
        .collect()[0]["s"]
    )
    return {
        "n": int(r["n"]),
        "sum_k": int(r["sum_k"] or 0),
        "sum_v": int(r["sum_v"] or 0),
        "sum_kv": int(parts or 0) % P,
    }


def _session(threads: int, mem: str):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{threads}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", mem)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def writer_main(table: str, rounds: int, out_json: str) -> None:
    spark = _session(4, "2g")
    from pyspark.sql import functions as F

    from etl_sentinel_imagery_spark.operators.txlog import (
        append,
        delete_rows_dv,
        merge_upsert,
    )

    model: dict[int, int] = {}
    nxt = OFF
    for rnd in range(rounds):
        # append a block of small files
        fresh = list(range(nxt, nxt + 2000))
        nxt += 2000
        df = (
            spark.range(fresh[0], fresh[-1] + 1)
            .select(
                F.col("id").alias("doc_id"),
                (F.col("id") * 7 + rnd).alias("val"),
            )
            .coalesce(2)
        )
        append(spark, table, df)
        for k in fresh:
            model[k] = k * 7 + rnd
        # DV-delete a slice of earlier writer keys
        if rnd >= 1:
            dead = [OFF + (rnd - 1) * 2000 + i for i in range(0, 600)]
            delete_rows_dv(spark, table, "doc_id", dead)
            for k in dead:
                model.pop(k, None)
        # merge-upsert: update some survivors, insert a few fresh
        if rnd >= 1:
            upd = [
                OFF + (rnd - 1) * 2000 + i for i in range(600, 900)
            ]
            ins = list(range(nxt, nxt + 100))
            nxt += 100
            src_rows = [(k, k + rnd * 13) for k in upd + ins]
            src = spark.createDataFrame(
                src_rows, "doc_id long, val long"
            )
            merge_upsert(spark, table, src, "doc_id")
            for k, v in src_rows:
                model[k] = v
    with open(out_json + ".tmp", "w") as f:
        json.dump(_sig(model.items()), f)
    os.replace(out_json + ".tmp", out_json)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--writer":
        writer_main(sys.argv[2], int(sys.argv[3]), sys.argv[4])
        return
    n_seed = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    import tempfile

    from pyspark.sql import functions as F

    spark = _session(8, "4g")
    from etl_sentinel_imagery_spark.operators.txlog import (
        init_table,
        maintain_table,
        set_properties,
        snapshot,
    )

    base = tempfile.mkdtemp(prefix="stress_maintain_")
    t = os.path.join(base, "t")
    seed = spark.range(n_seed).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7).alias("val")
    )
    init_table(spark, t, seed.repartition(32))  # NO stat_cols: analyze backfills
    set_properties(
        t,
        {
            "analyze.cols": "doc_id",
            "dv.max_chain": "2",
            "optimize.small_bytes": str(1 << 20),
            "retention.min_age_seconds": "300",
        },
    )
    out_json = os.path.join(base, "writer_sig.json")
    t0 = time.time()
    writer = subprocess.Popen(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--writer",
            t,
            str(rounds),
            out_json,
        ]
    )
    ladder_runs = 0
    rewritten = folds = 0
    analyzed: list[str] = []
    try:
        while writer.poll() is None:
            rep = maintain_table(spark, t)
            ladder_runs += 1
            rewritten += rep["files_rewritten"]
            folds += int(rep["dv_chains_folded"])
            analyzed += rep["analyzed_cols"]
    finally:
        writer.wait(timeout=600)
    assert writer.returncode == 0, "writer process failed"
    rep = maintain_table(spark, t)  # one quiet final pass
    ladder_runs += 1
    rewritten += rep["files_rewritten"]
    wall = time.time() - t0

    snap = snapshot(spark, t)
    got_seed = _df_sig(snap.filter(F.col("doc_id") < OFF))
    want_seed = {
        "n": n_seed,
        "sum_k": n_seed * (n_seed - 1) // 2,
        "sum_v": 7 * n_seed * (n_seed - 1) // 2,
        "sum_kv": sum((k % P) * ((k * 7) % P) % P for k in range(n_seed))
        % P,
    }
    assert got_seed == want_seed, (got_seed, want_seed)
    with open(out_json) as f:
        want_writer = json.load(f)
    got_writer = _df_sig(snap.filter(F.col("doc_id") >= OFF))
    assert got_writer == want_writer, (got_writer, want_writer)
    print(
        json.dumps(
            {
                "n_seed": n_seed,
                "writer_rounds": rounds,
                "ladder_runs": ladder_runs,
                "files_rewritten": rewritten,
                "dv_folds": folds,
                "analyzed_cols": sorted(set(analyzed)),
                "rows_final": got_seed["n"] + got_writer["n"],
                "bit_stable": True,
                "wall_s": round(wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
