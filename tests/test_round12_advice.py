"""Round-12 regressions: the four round-11 ADVICE findings.

1. COPY ledger keys are INVOCATION-INVARIANT — a direct-dir call and
   a directory-wildcard pattern over the same landing area never
   re-ingest each other's history (ADVICE medium); legacy key forms
   still dedup.
2. sample_token_budget's order key uses a fixed-width md5 tiebreak —
   string keys longer than the old 20-char pad stay unique, and the
   selection stays the exact budget prefix (ADVICE low).
3. ALTER TABLE SET TBLPROPERTIES mixing protocol keys with plain
   properties lands in ONE commit (ADVICE low).
4. upgrade_protocol refuses integer minimums above the issuing
   build's own SUPPORTED levels (ADVICE low).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    copy_into,
    current_version,
    init_table,
    read_manifest,
    resolve_copy_ledger,
    resolve_properties,
    resolve_protocol,
    snapshot,
    upgrade_protocol,
)


def _src_file(d: str, name: str, ids):
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, name)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(ids), pa.int64()),
                "body": pa.array([f"b{i}" for i in ids], pa.string()),
            }
        ),
        p,
    )
    return p


def _seed(spark, n=5, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("body"),
    )


# ---------------------------------------------------------------- #
# 1. COPY ledger keys — invocation-invariant                        #
# ---------------------------------------------------------------- #


def test_copy_ledger_key_invocation_invariant(spark, tmp_path):
    """Load via direct-dir call, re-run via a directory-wildcard
    pattern over the same landing area (and vice versa): zero files
    re-ingest — the key is a pure function of the file, not of how
    the source was spelled (round-11 advice, medium)."""
    land = str(tmp_path / "data" / "2024-01" / "landing")
    _src_file(land, "a.parquet", range(10))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))

    v1, s1 = copy_into(spark, t, land)
    assert s1["files_loaded"] == 1

    # the pattern form keys the same file identically → no-op
    pat = str(tmp_path / "data" / "*" / "landing" / "*.parquet")
    v2, s2 = copy_into(spark, t, pat)
    assert s2["files_loaded"] == 0 and s2["files_skipped"] == 1
    assert v2 == v1
    assert snapshot(spark, t).count() == 10

    # new file dropped → only IT loads, under either form
    _src_file(land, "b.parquet", range(10, 15))
    _, s3 = copy_into(spark, t, pat)
    assert s3["files_loaded"] == 1
    _, s4 = copy_into(spark, t, land)
    assert s4["files_loaded"] == 0
    assert snapshot(spark, t).count() == 15

    # the recorded keys are parent-leaf scoped (invocation-invariant)
    keys = set(resolve_copy_ledger(t))
    sizes = {
        n: os.path.getsize(os.path.join(land, n))
        for n in ("a.parquet", "b.parquet")
    }
    assert keys == {
        f"landing/a.parquet#{sizes['a.parquet']}",
        f"landing/b.parquet#{sizes['b.parquet']}",
    }


def test_copy_ledger_pattern_first_then_direct(spark, tmp_path):
    """The converse order: pattern-form load first, direct-dir call
    second — still exactly once."""
    land = str(tmp_path / "data" / "2024-02" / "landing")
    _src_file(land, "a.parquet", range(7))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))

    pat = str(tmp_path / "data" / "*" / "landing" / "*.parquet")
    _, s1 = copy_into(spark, t, pat)
    assert s1["files_loaded"] == 1
    _, s2 = copy_into(spark, t, land)
    assert s2["files_loaded"] == 0
    assert snapshot(spark, t).count() == 7


def test_copy_ledger_legacy_prefix_keys_still_dedup(spark, tmp_path):
    """A ledger written by the round-10/11 build (keys relative to
    the glob's static prefix) keeps deduping: the check matches the
    legacy form even though new files record the canonical key."""
    land = str(tmp_path / "data" / "2024-03" / "landing")
    p = _src_file(land, "a.parquet", range(5))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))

    pat = str(tmp_path / "data" / "*" / "landing" / "*.parquet")
    v, _ = copy_into(spark, t, pat)

    # rewrite the ledger entry into the legacy prefix-relative form
    # the round-11 build would have recorded for this pattern
    import json

    mdir = os.path.join(t, "_txlog")
    mpath = os.path.join(mdir, f"v_{v:08d}.json")
    m = json.loads(open(mpath).read())
    size = os.path.getsize(p)
    legacy = f"data/2024-03/landing/a.parquet#{size}"
    m["copy_files"]["files"] = {
        legacy: next(iter(m["copy_files"]["files"].values()))
    }
    open(mpath, "w").write(json.dumps(m, indent=0))
    assert set(resolve_copy_ledger(t)) == {legacy}

    # neither invocation form re-ingests the legacy-keyed file
    _, s1 = copy_into(spark, t, pat)
    assert s1["files_loaded"] == 0
    _, s2 = copy_into(spark, t, land)
    assert s2["files_loaded"] == 0
    assert snapshot(spark, t).count() == 5


def test_copy_ledger_distinct_leaf_dirs_dont_mask(spark, tmp_path):
    """Same basename + same size from landing dirs with DISTINCT leaf
    names → both load (the key scopes by parent leaf)."""
    a = str(tmp_path / "landing_a")
    b = str(tmp_path / "landing_b")
    _src_file(a, "a.parquet", range(5))
    _src_file(b, "a.parquet", range(5, 10))  # same row count → same size
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))
    _, s1 = copy_into(spark, t, a)
    _, s2 = copy_into(spark, t, b)
    assert s1["files_loaded"] == 1 and s2["files_loaded"] == 1
    assert snapshot(spark, t).count() == 10


# ---------------------------------------------------------------- #
# 2. token-budget order key — md5 tiebreak                          #
# ---------------------------------------------------------------- #


def test_token_budget_long_string_keys_unique(spark):
    """String keys longer than the old 20-char lpad width: the md5
    tiebreak keeps the order key unique, so the selection is still an
    exact budget prefix (total in [budget, budget + max_tok)) and
    deterministic across partitionings (round-11 advice, low).
    Under the old truncating lpad these keys collided pairwise."""
    from etl_sentinel_imagery_spark.operators.sampling import (
        sample_token_budget,
    )

    # 40-char ids sharing the first 20 chars in pairs — lpad(.., 20)
    # truncation would have collapsed each pair to one order key
    rows = [
        (f"{i:020d}{j:020d}", (i * 7 + j) % 5 + 1)
        for i in range(30)
        for j in range(2)
    ]
    df = spark.createDataFrame(rows, "doc_id string, n_tok long")
    out = sample_token_budget(df, 60, "n_tok", seed="s").collect()
    total = sum(r["n_tok"] for r in out)
    assert 60 <= total < 60 + 5
    assert all(r["cum_before"] < 60 for r in out)
    # unique order ⇒ partitioning-independent selection
    again = {
        r["doc_id"]
        for r in sample_token_budget(
            df.repartition(11), 60, "n_tok", seed="s"
        ).collect()
    }
    assert again == {r["doc_id"] for r in out}


def test_token_budget_negative_keys_safe(spark):
    """Negative bigint keys (the other lpad failure mode: '-' sorted
    above digits and broke fixed-width alignment) select a valid
    exact prefix."""
    from etl_sentinel_imagery_spark.operators.sampling import (
        sample_token_budget,
    )

    df = spark.range(-50, 50).select(
        F.col("id").alias("doc_id"),
        (F.abs(F.col("id")) % 4 + 1).cast("long").alias("n_tok"),
    )
    out = sample_token_budget(df, 40, "n_tok", seed="n").collect()
    total = sum(r["n_tok"] for r in out)
    assert 40 <= total < 40 + 4
    assert all(r["cum_before"] < 40 for r in out)


# ---------------------------------------------------------------- #
# 3. mixed TBLPROPERTIES — one commit                               #
# ---------------------------------------------------------------- #


def test_mixed_tblproperties_single_commit(spark, tmp_path):
    """A statement mixing 'feature.x' / minWriterVersion with plain
    properties commits ONCE: version advances by exactly 1, and that
    single manifest carries BOTH the protocol and the merged
    properties (round-11 advice, low — two commits could leave the
    statement half-applied)."""
    from etl_sentinel_imagery_spark.operators.txlog_sql import tx_sql

    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark))
    v0 = current_version(t)
    out = tx_sql(
        spark,
        "ALTER TABLE t SET TBLPROPERTIES ("
        "'feature.copyLedger' = 'supported', 'team' = 'data', "
        "'minWriterVersion' = '2')",
        {"t": t},
    )
    v1 = current_version(t)
    assert v1 == v0 + 1, "mixed statement must be ONE commit"
    m = read_manifest(t, v1)
    assert m["op"] == "upgrade_protocol"
    assert "protocol" in m and "properties" in m
    p = resolve_protocol(t)
    assert "copyLedger" in p["writer_features"]
    assert int(p["min_writer"]) == 2
    assert resolve_properties(t)["team"] == "data"
    assert out == v1


def test_pure_property_statement_still_plain_commit(spark, tmp_path):
    """No protocol keys → the plain set_properties route, no protocol
    record written."""
    from etl_sentinel_imagery_spark.operators.txlog_sql import tx_sql

    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark))
    tx_sql(
        spark,
        "ALTER TABLE t SET TBLPROPERTIES ('team' = 'x')",
        {"t": t},
    )
    m = read_manifest(t, current_version(t))
    assert m["op"] == "set_properties" and "protocol" not in m


# ---------------------------------------------------------------- #
# 4. integer protocol minimums capped at the build's own levels     #
# ---------------------------------------------------------------- #


def test_upgrade_protocol_refuses_unserveable_minimums(spark, tmp_path):
    """min_reader/min_writer above this build's SUPPORTED levels are
    refused — they would permanently lock every engine (including the
    issuer) out of the table (round-11 advice, low)."""
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark))
    with pytest.raises(ValueError, match="brick"):
        upgrade_protocol(t, min_writer=99)
    with pytest.raises(ValueError, match="brick"):
        upgrade_protocol(t, min_reader=99)
    # the supported levels themselves still pass
    v = upgrade_protocol(t, min_reader=2, min_writer=2)
    p = resolve_protocol(t)
    assert (int(p["min_reader"]), int(p["min_writer"])) == (2, 2)
    assert v == current_version(t)
