"""Streaming MinHash-LSH near-dup candidates — dedup as data arrives.

The batch dedup recipe (operators.dedup) assumes the corpus is at rest;
an ingestion pipeline wants candidates AS DOCUMENTS LAND so a new
near-duplicate is flagged against everything already ingested. The LSH
structure makes this stateful-streamable: the only memory needed is the
per-(band, band_key) bucket membership, which is exactly a keyed state
store. Signatures and banding stay the batch operators' JVM expressions
(same constants, same hash family — a doc gets the same buckets in
either mode); only bucket membership lives in
``applyInPandasWithState``.

Cap semantics vs batch: the batch operator drops an over-cap bucket
ENTIRELY (it sees final sizes); the stream can't know a bucket's future
size, so it stops pairing/admitting once a bucket reaches ``max_bucket``
members — the same quadratic-regime bound, prefix-of-arrival flavored.
Idle buckets expire via processing-time timeout, bounding state size.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_sentinel_imagery_spark.operators.dedup import (
    BAND_SIZE,
    MAX_BUCKET,
    N_PERM,
    minhash_signature,
)

#: Idle-bucket state TTL (processing-time).
BUCKET_TTL_MS = 60 * 60 * 1000


def band_key_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, band_idx, band_key) — one row per band, identical keys to
    the batch operator (same signature expression, same banding)."""
    n_bands = N_PERM // BAND_SIZE
    sig = minhash_signature(F.col(text_col))
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "_",
                    *[
                        F.element_at("_sig", b * BAND_SIZE + i + 1)
                        for i in range(BAND_SIZE)
                    ],
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return (
        docs.withColumn("_sig", sig)
        .select(F.col(id_col).alias("doc"), F.explode(bands).alias("b"))
        .select("doc", "b.band_idx", "b.band_key")
    )


def lsh_candidate_pairs_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = MAX_BUCKET,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming candidate pairs (id_a < id_b, band_idx): each arriving
    doc pairs against every doc already in its bucket's state. Emit is
    per-band; downstream consumers ``dropDuplicates(['id_a','id_b'])``
    or aggregate shared-band counts exactly like the batch path.

    ``ttl_ms`` arms a processing-time timeout that expires idle buckets
    (the state bound for an UNBOUNDED ingest — pass BUCKET_TTL_MS in
    production). Leave it None for bounded/backfill runs: with a
    processing-time timeout armed, Spark keeps scheduling no-data
    micro-batches to fire expirations, so ``processAllAvailable`` on a
    bounded source never sees the stream go quiet (measured: hangs)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band_idx, _band_key = key
        if state.hasTimedOut:
            state.remove()
            return
        (ids,) = state.get if state.exists else ([],)
        ids = list(ids)
        out_a, out_b = [], []
        for pdf in pdfs:
            for doc in pdf["doc"]:
                doc = int(doc)
                if doc in ids:
                    continue
                if len(ids) >= max_bucket:
                    break
                for other in ids:
                    lo, hi = (doc, other) if doc < other else (other, doc)
                    out_a.append(lo)
                    out_b.append(hi)
                ids.append(doc)
        state.update((ids,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if out_a:
            yield pd.DataFrame(
                {
                    "id_a": out_a,
                    "id_b": out_b,
                    "band_idx": [band_idx] * len(out_a),
                }
            )

    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        band_key_rows(docs, id_col, text_col)
        .groupBy("band_idx", "band_key")
        .applyInPandasWithState(
            update,
            outputStructType="id_a bigint, id_b bigint, band_idx int",
            stateStructType="ids array<bigint>",
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def run_incremental_dedup_stream(
    stream_docs: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket: int | None = MAX_BUCKET,
):
    """Continuous ingest dedup whose ONLY state is the persisted
    parquet LSH index (operators.incremental_dedup) — the unification
    of the streaming and batch dedup paths.

    :func:`lsh_candidate_pairs_stream` keeps bucket membership in the
    state store: fast, but the state dies with the checkpoint and
    never sees the at-rest corpus. This runner instead processes each
    micro-batch with the batch classifier against the shared index —
    arrivals dedup against the original corpus AND every earlier
    micro-batch, restart recovery is free (the index IS the state, any
    engine can read it), and the batch/stream paths cannot drift
    (same code object).

    Exactly-once: `incremental_dedup` is replay-idempotent (self-
    matches excluded, appends anti-joined against indexed ids), and
    status rows land in an ``epoch_id=`` partition with dynamic
    overwrite — a replayed batch rewrites exactly its own partition
    (the engine's additive-sketch recipe).

    Returns the StreamingQuery; classifications accumulate under
    ``out_dir`` as (id, status, dup_of, epoch_id).
    """
    from etl_sentinel_imagery_spark.operators.incremental_dedup import (
        incremental_dedup,
    )

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        status = incremental_dedup(
            batch_df,
            index_dir,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            max_bucket=max_bucket,
            append=True,
        )
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                status.withColumn("epoch_id", F.lit(epoch_id))
                .write.mode("overwrite")
                .partitionBy("epoch_id")
                .parquet(out_dir)
            )
        finally:
            if prev is not None:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )

    return (
        stream_docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
