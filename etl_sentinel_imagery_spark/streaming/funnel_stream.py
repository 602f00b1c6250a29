"""Streaming funnel — the per-level DP as keyed state.

The batch funnel (operators.funnel) folds a user's full event history;
an ingestion pipeline wants funnel state maintained AS EVENTS LAND so
"who just completed the purchase funnel" is a stream, not a nightly
job. The DP state is exactly the per-level latest-timestamp array, so
it moves into ``applyInPandasWithState`` unchanged: per micro-batch,
each entity's new events (time-sorted within the batch) advance the
stored levels with the same transition rule the batch operator uses —
making the batch funnel the semantic oracle (same pattern as
streaming.dedup_stream vs the batch LSH operator).

Ordering semantics, stated honestly: the DP is order-sensitive. Two
modes:

- ``ordered=False`` (default): events apply in ARRIVAL order across
  micro-batches (time-sorted only within a batch). With a time-ordered
  source the result equals the batch funnel exactly (asserted in
  tests); an event arriving late — after a later-timestamped event was
  already folded — is applied against the state as-is (its timestamp
  still participates via the `t >= prev` guard, so a stale straggler
  cannot corrupt levels, it can only fail to advance them).
- ``ordered=True``: events BUFFER in state and fold only once the
  event-time watermark passes them — restoring global time order for
  any out-of-order feed whose skew respects the watermark delay, at
  the cost of watermark latency. The caller must put
  ``withWatermark(ts_col, ...)`` on the stream. Boundary caveat:
  equal-timestamp events arriving in different batches around a
  watermark boundary fold in drain order, not (t, type) order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def funnel_progress_stream(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_seconds: int | None = None,
    ordered: bool = False,
) -> DataFrame:
    """Streaming (entity, steps_completed, level_ts, n_buffered) —
    updated state emitted for every entity that saw events (or drained
    buffered ones) in the micro-batch."""
    k = len(steps)
    step_levels = {
        s: [j for j, t in enumerate(steps) if t == s] for s in set(steps)
    }

    def fold(levels: list, rows: list) -> list:
        for t, e in rows:
            matches = step_levels.get(e)
            if not matches:
                continue
            new = list(levels)
            # same transition as operators.funnel: every level reads the
            # PRE-event state, so one event never advances two levels
            # (repeated step types update every matching level from the
            # old state, exactly like the batch transform)
            for j in matches:
                if j == 0:
                    new[0] = max(new[0], t)
                elif (
                    levels[j - 1] >= 0
                    and t >= levels[j - 1]
                    and (
                        window_seconds is None
                        or t - levels[j - 1] <= window_seconds
                    )
                ):
                    new[j] = max(new[j], t)
            levels = new
        return levels

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (entity,) = key
        if state.exists:
            levels, buf_t, buf_e = state.get
            levels, buf = list(levels), list(zip(buf_t, buf_e))
        else:
            levels, buf = [-1] * k, []
        rows: list[tuple[int, str]] = []
        for pdf in pdfs:
            rows.extend(zip(pdf["t"].astype(int), pdf["e"]))
        if ordered:
            wm = state.getCurrentWatermarkMs()
            buf.extend(rows)
            ready = sorted((t, e) for t, e in buf if t * 1000 < wm)
            buf = [(t, e) for t, e in buf if t * 1000 >= wm]
            levels = fold(levels, ready)
        else:
            rows.sort()
            levels = fold(levels, rows)
        state.update(
            (levels, [t for t, _ in buf], [e for _, e in buf])
        )
        yield pd.DataFrame(
            [
                {
                    "entity": entity,
                    "steps_completed": sum(1 for x in levels if x >= 0),
                    "level_ts": levels,
                    "n_buffered": len(buf),
                }
            ]
        )

    return (
        events.select(
            F.col(entity_col).alias("entity"),
            F.unix_timestamp(F.col(ts_col)).alias("t"),
            F.col(type_col).alias("e"),
            # keep the watermarked event-time column itself: dropping it
            # would strip the watermark metadata the ordered mode reads
            # via getCurrentWatermarkMs
            F.col(ts_col),
        )
        .groupBy("entity")
        .applyInPandasWithState(
            update,
            outputStructType="entity bigint, steps_completed int, "
            "level_ts array<bigint>, n_buffered int",
            stateStructType="levels array<bigint>, buf_t array<bigint>, "
            "buf_e array<string>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
