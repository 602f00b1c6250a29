"""PageRank vs a dense numpy power iteration on structured graphs."""

from __future__ import annotations

import numpy as np

from etl_sentinel_imagery_spark.operators.pagerank import pagerank


def _ref_pagerank(edges, d=0.85, n_iter=20):
    nodes = sorted({v for e in edges for v in e})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    dedup = sorted(set(edges))
    out = np.zeros(n)
    for s, _ in dedup:
        out[ix[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for s, t in dedup:
            contrib[ix[t]] += r[ix[s]] / out[ix[s]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {v: r[ix[v]] for v in nodes}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_star_graph_hub_dominates(spark):
    edges = [(i, 0) for i in range(1, 8)]
    got = _run(spark, edges)
    want = _ref_pagerank(edges)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9
    assert got[0] == max(got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_cycle_is_uniform(spark):
    edges = [(i, (i + 1) % 5) for i in range(5)]
    got = _run(spark, edges)
    for v in got.values():
        assert abs(v - 0.2) < 1e-9


def test_dangling_mass_redistributes(spark):
    # node 2 has no out-edges: without the dangling fix, total rank
    # leaks below 1 every iteration
    edges = [(0, 1), (1, 2), (0, 2)]
    got = _run(spark, edges)
    want = _ref_pagerank(edges)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9


def test_random_graph_matches_reference(spark):
    import random

    rng = random.Random(17)
    edges = list(
        {(rng.randrange(30), rng.randrange(30)) for _ in range(150)}
    )
    edges = [(s, t) for s, t in edges if s != t]
    got = _run(spark, edges, n_iter=25)
    want = _ref_pagerank(edges, n_iter=25)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9


def test_parallel_edges_count_once(spark):
    a = _run(spark, [(0, 1), (0, 1), (1, 0)])
    b = _run(spark, [(0, 1), (1, 0)])
    for v in a:
        assert abs(a[v] - b[v]) < 1e-12


def test_weighted_edges_shift_rank(spark):
    """Weighted variant vs a dense reference: node 0 splits rank 3:1
    between nodes 1 and 2."""

    def ref(n_iter=20, d=0.85):
        # nodes 0,1,2; 0->1 w3, 0->2 w1; 1->0 w1; 2->0 w1
        import numpy as np

        r = np.full(3, 1 / 3)
        for _ in range(n_iter):
            contrib = np.zeros(3)
            contrib[1] += r[0] * 3 / 4
            contrib[2] += r[0] * 1 / 4
            contrib[0] += r[1] + r[2]
            r = 0.15 / 3 + d * contrib
        return r

    df = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src bigint, dst bigint, w double",
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, weight_col="w").collect()
    }
    want = ref()
    for i in range(3):
        assert abs(got[i] - want[i]) < 1e-9
    assert got[1] > got[2]  # the heavier edge wins

    # parallel weighted edges add: (0,1,3) == (0,1,1)+(0,1,2)
    df2 = spark.createDataFrame(
        [(0, 1, 1.0), (0, 1, 2.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src bigint, dst bigint, w double",
    )
    got2 = {
        r["node"]: r["rank"]
        for r in pagerank(df2, weight_col="w").collect()
    }
    for i in range(3):
        assert abs(got[i] - got2[i]) < 1e-12
