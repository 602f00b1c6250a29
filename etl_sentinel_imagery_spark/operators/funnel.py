"""Funnel analysis — ordered step matching per entity.

"How many users did A, then B, then C (in order, each step within T of
the previous)?" is the workhorse question of event analytics. The scale
shape: ONE shuffle on the entity key (the same partitioning every
per-user op wants), then per-user matching as a JVM expression over the
collected, time-sorted event array — no Python, no self-joins (the
naive k-step funnel as a k-way self-join shuffles the event table k
times and explodes on hot users).

Matching is the per-level dynamic program (the windowFunnel shape):
scan events in time order keeping, per funnel level, the LATEST
timestamp at which any valid chain reaches that level. An event of step
i extends a chain iff level i-1 is reached and the pairwise gap fits
the window; extending from the latest level-(i-1) time is optimal
because feasibility only constrains `t - prev ≤ window` — larger prev
is strictly more permissive. (A greedy earliest-anchor scan is WRONG
here: with A(0), A(95), B(100) and window 10 it anchors at A(0) and
misses the A(95)→B(100) completion — the DP finds it.)

Window semantics: PAIRWISE gaps — each step within ``window_seconds``
of the previous step's match, not of the funnel start. Repeated step
types ([click, click, purchase]) work: every level reads the PREVIOUS
scan state, so one event never advances two levels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_progress(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_seconds: int | None = None,
) -> DataFrame:
    """Per-entity funnel state: (entity, steps_completed, level_ts).

    ``steps_completed`` = deepest level reached (levels always fill as
    a prefix); ``level_ts[i]`` = latest epoch-second at which any valid
    chain reaches level i+1 (-1 = unreached)."""
    k = len(steps)
    sorted_evts = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_timestamp(F.col(ts_col)).alias("t"),
                F.col(type_col).alias("e"),
            )
        )
    )
    init = F.transform(
        F.sequence(F.lit(1), F.lit(k)), lambda _: F.lit(-1).cast("bigint")
    )

    def step_fold(acc: Column, ev: Column) -> Column:
        def level(j: Column) -> Column:
            # j is the 1-based level index as a lambda variable
            want = F.element_at(F.array(*[F.lit(s) for s in steps]), j)
            prev = F.element_at(acc, j - 1)  # j=1 → element_at(acc, 0)
            old = F.element_at(acc, j)
            gap_ok = (
                F.lit(True)
                if window_seconds is None
                else (ev["t"] - prev <= F.lit(window_seconds))
            )
            can_extend = F.when(
                j == 1, F.lit(True)
            ).otherwise((prev >= 0) & (ev["t"] >= prev) & gap_ok)
            return F.when(
                (ev["e"] == want) & can_extend, F.greatest(old, ev["t"])
            ).otherwise(old)

        return F.transform(F.sequence(F.lit(1), F.lit(k)), level)

    state = F.aggregate(sorted_evts, init, step_fold)
    return (
        events.groupBy(F.col(entity_col).alias("entity"))
        .agg(state.alias("_lv"))
        .select(
            "entity",
            F.size(F.filter(F.col("_lv"), lambda x: x >= 0)).alias(
                "steps_completed"
            ),
            F.col("_lv").alias("level_ts"),
        )
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_seconds: int | None = None,
) -> DataFrame:
    """The funnel chart: EXACTLY one row per step (zero-count steps
    included — a consumer zipping against the steps list must never
    misalign) with the entity count that reached at least that step —
    monotonically non-increasing."""
    prog = funnel_progress(
        events, steps, entity_col, type_col, ts_col, window_seconds
    )
    step_rows = F.explode(
        F.sequence(F.lit(1), F.lit(len(steps)))
    ).alias("step")
    counts = (
        prog.select(step_rows, "steps_completed")
        .filter(F.col("steps_completed") >= F.col("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("n_entities"))
    )
    axis = events.sparkSession.range(1).select(
        F.explode(F.sequence(F.lit(1), F.lit(len(steps)))).alias("step")
    )
    return (
        axis.join(counts, "step", "left")
        .select(
            "step",
            F.coalesce("n_entities", F.lit(0).cast("long")).alias("n_entities"),
            F.element_at(
                F.array(*[F.lit(s) for s in steps]), F.col("step")
            ).alias("step_name"),
        )
        .orderBy("step")
    )
