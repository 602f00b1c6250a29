"""Focused write-path bench: the DML battery run REPS times (fresh
throwaway tables each rep, same protocol as bench.py's single-shot
write row), per-leg medians printed. For attribution during the
round; the official artifact stays bench.py.

Usage: python tools/bench_dml.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_sentinel_imagery_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("bench-dml", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_sentinel_imagery_spark.queries.dml_q import _txlog_dml_battery

    print(f"load_avg_start {os.getloadavg()[0]:.2f}")
    legs_all: list[dict] = []
    totals: list[float] = []
    for rep in range(reps):
        legs: dict[str, float] = {}
        t0 = time.time()
        _txlog_dml_battery(spark, sf_dir, leg_timings=legs).count()
        total = time.time() - t0
        legs["final_aggregates"] = round(total - sum(legs.values()), 3)
        legs_all.append(legs)
        totals.append(total)
        print(f"rep{rep} total {total:.3f}s")
    med = {
        k: round(statistics.median(lg[k] for lg in legs_all), 3)
        for k in legs_all[0]
    }
    print(json.dumps({
        "total_median": round(statistics.median(totals), 3),
        "legs_median": med,
        "load_avg_end": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
