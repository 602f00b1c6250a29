"""Physical-plan audit: assert the plans we designed for are the plans we got.

Checks per query: parquet filter pushdown (PushedFilters), column pruning
(ReadSchema width), broadcast joins where intended, TakeOrderedAndProject
for top-k, whole-stage codegen coverage. Prints a PASS/WARN table and the
formatted plans to tools/plans/ for inspection.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_sentinel_imagery_spark.queries import queries as _queries
from etl_sentinel_imagery_spark.session import get_spark

CHECKS = {
    "filter_range_pushdown": {
        "PushedFilters: [IsNotNull(l_returnflag), IsNotNull(l_shipdate)": True,
        "TakeOrderedAndProject": None,  # None = don't care
    },
    # NB: WholeStageCodegen spans don't appear inside an unexecuted
    # AdaptiveSparkPlan — partial_sum proves map-side combine instead.
    "flagship_top_supplier_per_region": {
        "BroadcastHashJoin": True,
        "PushedFilters": True,
        "partial_sum": True,
    },
    "shipping_priority_top20": {"TakeOrderedAndProject": True},
    "orders_per_nation": {"BroadcastHashJoin": True},
    "pricing_summary": {"HashAggregate": True, "partial_sum": True},
    "latest_order_per_customer": {"RunningWindowFunction|Window": True},
    "docs_minhash_lsh_pairs": {"Exchange": True},
    "events_windows_battery": {"HashAggregate": True},
    "purchase_asof_click": {"Window": True},
    # grouping sets plan through an Expand node feeding the aggregate
    "rollup_region_nation": {"Expand": True, "BroadcastHashJoin": True},
    "window_frames_battery": {"Window": True},
    # chunking: tokenize → sequence/slice/posexplode are all generators —
    # no aggregation, no join; the only Exchange is the anti-recompute
    # barrier, and no Sort may appear anywhere
    "docs_chunking": {"Generate": True, "Sort": False},
    # the profile battery is one narrow projection plus the packing-
    # offset join: the only Sort allowed is the prefix-sum's in-partition
    # sort (global=false) of the TWO-column (doc_id, token-count) side.
    # A GLOBAL sort — `Arguments: [...], true, 0` in the formatted plan,
    # the single-task no-partition-window antipattern the packing module
    # replaces — must stay absent (`re:` prefix = explicit regex marker).
    # The per-partition totals aggregate runs in its own control-plane
    # job, so no HashAggregate may appear either.
    "text_profile": {
        "Project": True,
        "HashAggregate": False,
        r"re:\], true, 0": False,
    },
    # quantization battery: the corpus amax is one tiny aggregate; the
    # per-row join of norms×codes must be a broadcast or sort-merge on
    # vec_id — and the final plan must keep partial aggregation off the
    # row path (no window, no expand)
    "embedding_quant_battery": {"Project": True, "Expand": False},
    # deterministic ANN battery (round 3): the expression-seeded tier's
    # centroid table and probe set must broadcast (the corpus side never
    # does), and windows carry the assignment/top-k ranks
    "ann_deterministic_battery": {
        "BroadcastHashJoin|BroadcastExchange": True,
        "Window": True,
        # the folded brute/near_dup anchors' theta joins must stay
        # broadcast (nested-loop parallelized across the left), never
        # a single-task plan
        "BroadcastNestedLoopJoin|BroadcastHashJoin|Broadcast": True,
    },
    # dedup joins are pinned sort-merge since the 1M stress (the only
    # spilling strategy): the band self-join must NOT plan as a
    # broadcast or shuffled-hash build of the corpus-sized side
    "docs_jaccard_pairs": {
        "SortMergeJoin": True,
        "ShuffledHashJoin": False,
    },
    # substring-dedup profile (round 3): the duplicated-gram occurrence
    # join is pinned sort-merge (occurrence side is corpus-sized, same
    # spill argument), the gram frequency groupBy must partial-aggregate
    # map-side, and the positional explode must be a Generate
    "docs_exact_dedup": {
        "SortMergeJoin": True,
        "partial_count": True,
        "Generate": True,
    },
    # sessionize carries the bucketized interval join (round 3): the
    # purchases-in-session predicate must plan as an equi-join on the
    # bin keys, never a BroadcastNestedLoop theta-join
    "events_sessionize": {
        "BroadcastNestedLoop": False,
        "Window": True,
    },
    # spatial battery (round 4): both the grid point-in-polygon join and
    # the radius join must plan as equi-joins on the exploded cell keys
    # — never the O(n·m) BroadcastNestedLoop theta-join Spark would pick
    # for a raw geometric predicate; cell explosion is a Generate
    "spatial_fuzzy_join_battery": {
        "BroadcastNestedLoop": False,
        "Generate": True,
    },
    # intra-doc line dedup (round 5): the zero-shuffle claim — one
    # narrow projection, no Exchange, no join, no aggregate anywhere
    "docs_intra_line_dedup": {
        "Exchange": False,
        "Join": False,
        "HashAggregate": False,
        "Project": True,
    },
    # decontamination (round 11): the eval gram set must BROADCAST into
    # the train scan — a SortMergeJoin here would shuffle the 100 TB
    # train side on gram text, the exact shape the operator exists to
    # avoid
    "docs_decontamination": {
        "BroadcastHashJoin": True,
        "SortMergeJoin": False,
        "BroadcastNestedLoop": False,
    },
    # LM count skeleton (round 11): vocabulary and model tables are
    # bounded (max_vocab + observed bigrams) and must BROADCAST into
    # the corpus-side pair scan — a SortMergeJoin would shuffle the
    # corpus on token text
    "docs_lm_counts": {
        "BroadcastHashJoin": True,
        "SortMergeJoin": False,
        "BroadcastNestedLoop": False,
    },
    # language ID (round 11): the 1800-row profile table must
    # BROADCAST into the trigram explode — never a shuffle keyed on
    # gram text
    "docs_langid": {
        "BroadcastHashJoin": True,
        "SortMergeJoin": False,
        "BroadcastNestedLoop": False,
    },
    # round-12 merged batteries — component plans are pinned above
    # under their original names; these pin what must hold for the
    # UNION plan as a whole:
    # sketch+LM battery: every join anywhere (lm count joins, the new
    # rational-curve model joins) must broadcast — the sketch tiers
    # are join-free, so no SortMergeJoin may appear at all
    "docs_sketch_lm_battery": {
        "BroadcastHashJoin": True,
        "SortMergeJoin": False,
        "BroadcastNestedLoop": False,
    },
    # classify battery: the langid profile join must broadcast; the
    # incremental-dedup tier legitimately sort-merges its band joins,
    # so only BNLJ is banned battery-wide
    "docs_classify_battery": {
        "BroadcastHashJoin": True,
        "BroadcastNestedLoop": False,
    },
    # near-dup battery: the LSH band self-join and the Jaccard verify
    # stay sort-merge (the only spilling strategy at corpus scale) —
    # never a shuffled-hash build of a corpus-sized side
    "docs_neardup_battery": {
        "SortMergeJoin": True,
        "ShuffledHashJoin": False,
        "BroadcastNestedLoop": False,
    },
    # production EWMA (round 5): the applyInPandas scan groups once on
    # event_type — exactly the resample axis's own exchanges plus the
    # group-for-Arrow hash exchange; no window, no sort-merge join
    "events_ewma_production": {
        "ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas": True,
        "Window": False,
        "SortMergeJoin": False,
    },
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    import re

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain-audit")
    qs = dict(_queries())
    # round 12: several registry rows merged into batteries (driver
    # 50-row window). The audit keeps pinning the COMPONENT plans —
    # a union battery's plan would blur per-tier assertions (e.g. the
    # langid tier must never sort-merge, while the incremental-dedup
    # tier legitimately does) — so the merged-away names resolve to
    # their component query functions here.
    from etl_sentinel_imagery_spark.queries import (
        scalars as _scalars,
        text_q as _text_q,
        vectors_q as _vectors_q,
    )

    qs["docs_minhash_lsh_pairs"] = _text_q._minhash_pairs
    qs["docs_jaccard_pairs"] = _text_q._jaccard
    qs["docs_signatures"] = _text_q._signatures
    qs["docs_lm_counts"] = _text_q._lm_counts
    qs["docs_langid"] = _text_q._langid_q
    qs["embedding_quant_battery"] = _vectors_q._quant_battery
    qs["scalar_string_battery"] = _scalars._string_battery
    qs["scalar_date_battery"] = _scalars._date_battery
    os.makedirs("tools/plans", exist_ok=True)
    warns = 0
    for name, markers in CHECKS.items():
        text = plan_text(qs[name](spark, sf_dir))
        with open(f"tools/plans/{name}.txt", "w") as fh:
            fh.write(text)
        for marker, required in markers.items():
            # `re:`-prefixed markers are explicit regexes; `|`-bearing
            # markers stay regexes for back-compat with the alternation
            # markers above; everything else is a literal
            if marker.startswith("re:"):
                pattern = marker[3:]
            elif "|" in marker:
                pattern = marker
            else:
                pattern = re.escape(marker)
            present = bool(re.search(pattern, text))
            if required is None:
                continue
            want = True if isinstance(required, str) else bool(required)
            status = "PASS" if present == want else "WARN"
            if status == "WARN":
                warns += 1
            print(f"{status}  {name}: {marker} present={present}")
    print(f"\n{warns} warnings; plans dumped to tools/plans/")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
