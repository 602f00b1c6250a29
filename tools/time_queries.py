"""Quick per-query timing: run named queries REPS times at a SF dir.

Usage: python tools/time_queries.py <sf_dir> <reps> <query> [query ...]
Prints per-rep and min/median wall seconds (count() action, matching
bench.py's methodology).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_sentinel_imagery_spark.queries import queries as _queries
from etl_sentinel_imagery_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark("time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = _queries()
    print(f"# load_avg {os.getloadavg()[0]:.2f}")
    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for name in names:
            t0 = time.time()
            n_rows = qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            samples[name].append(dt)
            print(f"rep{rep} {name}: {dt:.3f}s ({n_rows} rows)", flush=True)
    for name in names:
        v = samples[name]
        print(
            f"== {name}: min {min(v):.3f} median {statistics.median(v):.3f}"
        )
    print(f"# load_avg_end {os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()
