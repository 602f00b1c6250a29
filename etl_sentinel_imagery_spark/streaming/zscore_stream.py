"""Streaming rolling z-score — the batch anomaly signal as keyed state.

The batch pipeline (`operators.timeseries.rolling_zscore` over
`resample_counts`) answers "is this bucket's count unusual vs its
trailing baseline" nightly; a monitoring pipeline wants the same signal
AS BUCKETS CLOSE. The reference has no streaming surface; this extends
the streaming family (streaming.funnel_stream, streaming.dedup_stream)
with the rolling-statistics shape, and the batch operator is its
semantic oracle (the same pattern every other stream module follows).

Design — bucket finality via event-time watermark:

- State per key: the next axis bucket to finalize (``axis_next``), the
  trailing ring of the last ``n_buckets - 1`` finalized counts, and a
  pending (bucket → count) map for buckets the watermark has not yet
  passed. Pending counts keep ACCUMULATING across micro-batches, so a
  late event that respects the watermark delay lands in its true bucket
  — the emitted row equals the batch row exactly, not approximately.
- Spark itself drops operator-input rows at or below the watermark
  (the standard stateful late-data discard) — an event older than the
  delay is gone BEFORE the operator sees it, so finalized buckets are
  immutable by construction, not by convention.
- A bucket ``b`` finalizes once the watermark passes ``b + step`` and
  ``b`` is not beyond the key's max observed bucket. Finalization walks
  the axis IN ORDER, emitting zero-count rows for gap buckets — the
  streaming twin of `resample_counts`' complete axis (the axis is the
  key's own [min, max] bucket range, exactly like batch).
- The z statistics replay the batch formula on the ring: exact integer
  Σv / Σv² folded to double in the same operation order, so the emitted
  doubles are bit-identical to `rolling_zscore`'s (asserted in tests).
  Bound, stated honestly: bit-parity holds while the window's Σv stays
  under 2^26.5 (so s·s is exact in a double, ~90M events per bucket at
  the default 4-bucket frame) — beyond that Python's exact-int s*s and
  the batch side's double-squared s can differ by 1 ulp. Statistical
  agreement is unaffected.
- Drain without new per-key data uses ``EventTimeTimeout``: after each
  update the key arms a timeout at its next finalization boundary, so a
  key whose events stopped still emits its trailing buckets when OTHER
  keys advance the watermark. No wall-clock dependence — fully
  deterministic under test.

Scale: state per key is O(n_buckets + pending buckets within the
watermark delay) — bounded by delay/step, independent of event volume.
Events reach the state operator row-wise (a streaming pre-aggregation
before a python stateful operator would chain two stateful operators —
a shape Structured Streaming only supports for window aggregations, so
the bucketization folds vectorized inside the pandas update instead);
at very high event rates put a coarse upstream reduction (e.g. an
epoch-keyed foreachBatch count sink feeding this monitor) in front.

Output (append-per-finalized-bucket): one row per (key, bucket) with
``n_events``, ``roll_mean``, ``roll_z`` — each bucket exactly once.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _zstats(ring: list[int]) -> tuple[float, float]:
    """(mean, z) of the LAST ring element vs the whole ring — the batch
    formula (timeseries.rolling_zscore) replayed in identical IEEE
    operation order: all sums are exact ints, folded to double only at
    the final divisions."""
    c = len(ring)
    s = sum(ring)
    s2 = sum(v * v for v in ring)
    mean = s / c
    if c > 1:
        var = (s2 - (s * s) / c) / (c - 1)
        if var > 0:
            return mean, (ring[-1] - mean) / math.sqrt(var)
    return mean, 0.0


def rolling_zscore_stream(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    step_seconds: int = 21600,
    n_buckets: int = 4,
) -> DataFrame:
    """Streaming (key, bucket, n_events, roll_mean, roll_z), one row per
    finalized bucket. ``events`` must carry ``withWatermark(ts_col, …)``
    — the watermark IS the bucket-finality clock."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            axis_next, ring, pend_b, pend_n = state.get
            ring = list(ring)
            pend = dict(zip(pend_b, pend_n))
        else:
            axis_next, ring, pend = -1, [], {}
        for pdf in pdfs:
            if len(pdf):
                for b, n in (
                    pdf["bucket"].astype(int).value_counts().items()
                ):
                    pend[int(b)] = pend.get(int(b), 0) + int(n)
        if axis_next < 0 and pend:
            axis_next = min(pend)

        wm_ms = state.getCurrentWatermarkMs()
        out: list[dict] = []
        hi = max(pend) if pend else axis_next - step_seconds
        # walk the axis in order; gap buckets emit as zeros (the
        # resample_counts complete-axis contract)
        while axis_next >= 0 and axis_next <= hi and (
            (axis_next + step_seconds) * 1000 <= wm_ms
        ):
            v = pend.pop(axis_next, 0)
            ring.append(v)
            if len(ring) > n_buckets:
                ring.pop(0)
            mean, z = _zstats(ring)
            out.append(
                {
                    key_col: k,
                    "bucket": axis_next,
                    "n_events": v,
                    "roll_mean": mean,
                    "roll_z": z,
                }
            )
            axis_next += step_seconds

        state.update(
            (
                axis_next,
                ring,
                list(pend.keys()),
                list(pend.values()),
            )
        )
        # arm the drain clock: wake this key when the watermark passes
        # its next finalization boundary (must stay strictly above the
        # current watermark or Spark rejects the timestamp)
        if pend:
            boundary = (min(pend) + step_seconds) * 1000
            state.setTimeoutTimestamp(max(boundary, wm_ms + 1))
        yield pd.DataFrame(
            out,
            columns=[key_col, "bucket", "n_events", "roll_mean", "roll_z"],
        )

    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds).cast("long")
        * step_seconds
    )
    # epoch-second bucket computed JVM-side; the watermarked timestamp
    # column itself is kept — dropping it would strip the watermark
    # metadata getCurrentWatermarkMs reads
    keyed = events.select(
        F.col(key_col).alias("_k"), bucket.alias("bucket"), F.col(ts_col)
    )
    return keyed.groupBy("_k").applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} string, bucket bigint, n_events bigint, "
            "roll_mean double, roll_z double"
        ),
        stateStructType=(
            "axis_next bigint, ring array<bigint>, "
            "pend_b array<bigint>, pend_n array<bigint>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
