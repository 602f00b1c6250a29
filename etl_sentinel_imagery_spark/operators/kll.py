"""KLL mergeable quantile sketch — the missing member of the sketch
family (operators.sketches has HLL distinct, top-k heavy hitters, and
fixed-edge histograms; none answers "what is p99 of value over an
arbitrary slice" without pre-chosen edges).

KLL (Karnin–Lang–Liberty 2016) keeps a hierarchy of levels; items at
level ℓ carry weight 2^ℓ. When a level overflows its (geometrically
shrinking, 2/3 ratio) capacity, it is sorted and every other item is
promoted one level up — halving count, doubling weight, bounding rank
error at O(1/k) with O(k · log(n/k)) space. Merge = concatenate levels
+ recompress, so the sketch composes with the engine's rollup pattern:
sketch once at the finest grain, answer any slice by merging a handful
of rows.

DETERMINISTIC VARIANT: the textbook compactor keeps odd/even positions
by a random bit (which makes every estimate unbiased). This engine's
replay-safety contract (streaming sinks re-run batches; speculation
re-runs tasks) needs identical bytes from identical input, so the
keep-parity comes from a per-sketch compaction counter instead —
alternating parity cancels the systematic drift the bound relies on,
the empirical rank error at k=200 sits well inside the randomized
bound (pinned in tests), and rebuilding from the same input is
bit-identical.

Spark shape (the 100 TB story): phase 1 builds per-PARTITION per-group
sketches in one mapInPandas pass (memory: groups × O(k) doubles per
task — the rollup-grain assumption every sketch here shares); phase 2
merges partition sketches per group (rows entering phase 2 number
partitions × groups, NOT corpus rows). No stage ever holds a group's
raw values.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default capacity parameter: rank error ≈ 1.65/k randomized; the
#: deterministic variant measures well under 1.5% at k=200.
KLL_K = 200
_C = 2.0 / 3.0

KLL_FIELD = "struct<k:int,n:bigint,parity:bigint,levels:array<array<double>>>"


class KllSketch:
    """In-memory KLL state (serialized to a plain struct for Spark)."""

    __slots__ = ("k", "n", "parity", "levels")

    def __init__(self, k: int = KLL_K):
        self.k = int(k)
        self.n = 0
        self.parity = 0
        self.levels: list[list[float]] = [[]]

    # -- construction ----------------------------------------------------
    def _cap(self, lev: int) -> int:
        depth = len(self.levels) - lev - 1
        return max(2, int(math.ceil(self.k * (_C**depth))))

    def update(self, v: float) -> None:
        self.levels[0].append(float(v))
        self.n += 1
        if len(self.levels[0]) > self._cap(0):
            self._compress()

    def _compress(self) -> None:
        while True:
            for lev in range(len(self.levels)):
                if len(self.levels[lev]) > self._cap(lev):
                    self._compact(lev)
                    break
            else:
                return

    def _compact(self, lev: int) -> None:
        lv = sorted(self.levels[lev])
        keep = self.parity & 1
        self.parity += 1
        promoted = lv[keep::2]
        self.levels[lev] = []
        if lev + 1 == len(self.levels):
            self.levels.append([])
        self.levels[lev + 1].extend(promoted)

    # -- merge / query ---------------------------------------------------
    def merge(self, other: "KllSketch") -> "KllSketch":
        if other.k != self.k:
            raise ValueError("cannot merge KLL sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for lev, lv in enumerate(other.levels):
            self.levels[lev].extend(lv)
        self.n += other.n
        self.parity += other.parity
        self._compress()
        return self

    def weighted_items(self) -> list:
        out = []
        for lev, lv in enumerate(self.levels):
            w = 1 << lev
            out.extend((v, w) for v in lv)
        out.sort()
        return out

    def quantile(self, q: float):
        if self.n == 0:
            return None
        items = self.weighted_items()
        target = max(1.0, q * self.n)
        cum = 0
        for v, w in items:
            cum += w
            if cum >= target:
                return v
        return items[-1][0]

    # -- (de)serialization ----------------------------------------------
    def to_row(self) -> dict:
        return {
            "k": self.k,
            "n": self.n,
            "parity": self.parity,
            "levels": [list(lv) for lv in self.levels],
        }

    @classmethod
    def from_row(cls, row) -> "KllSketch":
        sk = cls(int(row["k"]))
        sk.n = int(row["n"])
        sk.parity = int(row["parity"])
        sk.levels = [list(lv) for lv in row["levels"]] or [[]]
        return sk


def kll_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = KLL_K,
) -> DataFrame:
    """Per-group KLL sketch rows: (group_cols..., kll).

    Two phases (see module docstring): per-partition build, per-group
    merge of the partition sketches. NULL values are excluded
    (COUNT(value) semantics — same policy as histogram_sketch); a group
    whose values are all NULL does not emit a row, so rollup joins on
    this output should be LEFT joins (the rollup_tables lesson)."""
    src = df.select(
        *group_cols,
        F.col(value_col).cast("double").alias("_v"),
        F.spark_partition_id().alias("_pid"),
    ).filter(F.col("_v").isNotNull())
    # group keys keep their source dtypes, so the sketch table joins
    # back against fact/rollup tables without casts
    ftypes = {f.name: f.dataType.simpleString() for f in src.schema.fields}
    out_schema = ", ".join(
        [f"`{c}` {ftypes[c]}" for c in group_cols]
        + ["_pid int", f"kll {KLL_FIELD}"]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketches: dict = {}
        pid = -1
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["_pid"].iloc[0])
            vals = pdf["_v"].to_numpy()
            keycols = [pdf[c].to_numpy() for c in group_cols]
            for i in range(len(pdf)):
                key = tuple(kc[i] for kc in keycols)
                sk = sketches.get(key)
                if sk is None:
                    sk = sketches[key] = KllSketch(k)
                sk.update(float(vals[i]))
        rows = []
        for key, sk in sketches.items():
            rows.append((*key, pid, sk.to_row()))
        yield pd.DataFrame(
            rows, columns=[*group_cols, "_pid", "kll"]
        )

    part = src.mapInPandas(build, schema=out_schema)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic merge order: by partition id
        pdf = pdf.sort_values("_pid")
        acc = None
        for row in pdf["kll"]:
            sk = KllSketch.from_row(row)
            acc = sk if acc is None else acc.merge(sk)
        keys = [pdf[c].iloc[0] for c in group_cols]
        return pd.DataFrame(
            [(*keys, acc.to_row())], columns=[*group_cols, "kll"]
        )

    final_schema = ", ".join(
        [f"`{c}` {ftypes[c]}" for c in group_cols] + [f"kll {KLL_FIELD}"]
    )
    return part.groupBy(*group_cols).applyInPandas(merge_group, final_schema)


def kll_merge_rows(rows) -> KllSketch:
    """Merge sketch structs (e.g. a slice of a rollup table) driver-side
    — deterministic given row order; sort by your slice key first.
    NULL rows (a rollup cell whose values were all NULL) are skipped."""
    acc = None
    for row in rows:
        if row is None:
            continue
        sk = KllSketch.from_row(row)
        acc = sk if acc is None else acc.merge(sk)
    return acc if acc is not None else KllSketch()


def kll_quantiles(sketch_row, qs: list) -> list:
    """Quantile estimates from one sketch struct."""
    sk = KllSketch.from_row(sketch_row)
    return [sk.quantile(q) for q in qs]
