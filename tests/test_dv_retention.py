"""DV-sidecar retention lifecycle (round-5 verdict, missing #4): at
heavy delete churn, per-entry sidecar chains grow; compact_dvs folds
them metadata-only, old chains stay on disk for time travel, and the
documented reclamation path — truncate_history then vacuum — actually
shrinks the ``_dv/`` directory down to the live compacted sidecars
while the snapshot stays bit-identical."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    compact_dvs,
    current_version,
    delete_rows_dv,
    init_table,
    resolve_files,
    snapshot,
    truncate_history,
    vacuum,
    _entry_dvs,
)


def test_dv_chain_reclamation_lifecycle(spark, tmp_path):
    d = str(tmp_path / "t")
    init_table(
        spark,
        d,
        spark.range(0, 100)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .coalesce(1),
        stat_cols=["k"],
    )
    # heavy churn: 8 separate deletes on the same file → 8-link chain
    for k in range(8):
        delete_rows_dv(spark, d, "k", [k * 10, k * 10 + 1])
    (entry,) = resolve_files(d)
    assert len(_entry_dvs(entry)) == 8
    n_sidecars_before = len(os.listdir(os.path.join(d, "_dv")))
    assert n_sidecars_before == 8
    expected = sorted(tuple(r) for r in snapshot(spark, d).collect())
    assert len(expected) == 100 - 16

    compact_dvs(spark, d, max_chain=2)
    (entry,) = resolve_files(d)
    assert len(_entry_dvs(entry)) == 1  # folded to one sidecar
    # old chains persist for TIME TRAVEL until history is truncated
    assert len(os.listdir(os.path.join(d, "_dv"))) == 9
    v_pre = current_version(d) - 1
    assert snapshot(spark, d, v_pre).count() == 100 - 16

    # the reclamation path: retire history, then sweep
    truncate_history(d, keep_versions=0)
    removed = vacuum(d, min_age_seconds=0)
    assert sum(1 for r in removed if r.startswith("_dv")) == 8
    left = os.listdir(os.path.join(d, "_dv"))
    assert len(left) == 1  # exactly the live compacted sidecar
    assert sorted(
        tuple(r) for r in snapshot(spark, d).collect()
    ) == expected
    # pre-horizon time travel is gone by contract
    with pytest.raises(ValueError, match="not exist|retired"):
        snapshot(spark, d, 0).count()
