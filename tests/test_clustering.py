"""k-means + SemDeDup vs a pure-Python quantized reference."""

from __future__ import annotations

import math

import pytest

from enem_spark import clustering


def _kmeans_reference(vecs: dict[int, list[float]], k: int, iters: int):
    """Same quantized Lloyd algorithm, driver-side: returns
    {vec_id: (cluster, dist_sq)}."""
    q = {
        i: [round(x * clustering.QUANT) for x in v] for i, v in vecs.items()
    }
    dim = len(next(iter(q.values())))
    cents = [list(q[i]) for i in sorted(q) if i < k]

    def assign():
        out = {}
        for i, v in q.items():
            dists = [
                sum((a - b) * (a - b) for a, b in zip(v, c)) for c in cents
            ]
            best = min(dists)
            out[i] = (dists.index(best), best)
        return out

    for _ in range(iters):
        a = assign()
        sums = [[0] * dim for _ in range(k)]
        counts = [0] * k
        for i, (c, _) in a.items():
            counts[c] += 1
            for p, x in enumerate(q[i]):
                sums[c][p] += x
        cents = [
            [
                int(math.floor(float(sums[c][p]) / counts[c]))
                if counts[c]
                else 0
                for p in range(dim)
            ]
            for c in range(k)
        ]
    return assign()


@pytest.fixture(scope="module")
def toy(spark):
    # two tight groups + one outlier + a zero vector; 4-dim
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.95, 0.05, 0.0]),
        (4, [0.91, 0.05, 0.0, 0.0]),
        (5, [-1.0, -1.0, -1.0, -1.0]),
        (6, [0.0, 0.0, 0.0, 0.0]),
    ]
    return rows, spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id: long, embedding: array<float>",
    )


def test_kmeans_matches_reference(toy):
    rows, df = toy
    got = {
        r.vec_id: (r.cluster, r.dist_sq)
        for r in clustering.kmeans_clusters(df, k=2, iters=2).collect()
    }
    exp = _kmeans_reference(dict(rows), k=2, iters=2)
    assert got == exp
    assert len(got) == len(rows)  # zero vector still assigned


def test_kmeans_separates_groups(toy):
    _, df = toy
    got = {
        r.vec_id: r.cluster
        for r in clustering.kmeans_clusters(df, k=2, iters=2).collect()
    }
    assert got[0] == got[1] == got[4]
    assert got[2] == got[3]
    assert got[0] != got[2]


def test_semdedup_greedy_keep_lowest(toy):
    _, df = toy
    got = {
        r.vec_id: (r.cluster, r.is_kept)
        for r in clustering.semdedup(df, k=2, iters=2, tau=0.95).collect()
    }
    assert len(got) == 7
    # 0/1/4 are mutually ~parallel: 0 kept, 1 and 4 dropped by 0
    assert got[0][1] is True
    assert got[1][1] is False
    assert got[4][1] is False
    # 2/3 parallel: 2 kept, 3 dropped
    assert got[2][1] is True
    assert got[3][1] is False
    # outlier + zero vector untouched
    assert got[5][1] is True
    assert got[6][1] is True


def test_semdedup_threshold_gates_pairs(toy):
    _, df = toy
    # tau above every pairwise cosine: nothing dropped
    got = clustering.semdedup(df, k=2, iters=2, tau=1.1).collect()
    assert all(r.is_kept for r in got)


def test_kmeans_empty_cluster_respawns_at_origin(spark):
    # k=3 but only two distinct points: seed 2's cluster empties after one
    # round; the origin respawn must then capture the zero-ish point.
    df = spark.createDataFrame(
        [
            (0, [1.0, 1.0]),
            (1, [1.0, 1.0]),
            (2, [1.0, 1.0]),
            (3, [0.001, 0.0]),
        ],
        "vec_id: long, embedding: array<float>",
    )
    got = {
        r.vec_id: (r.cluster, r.dist_sq)
        for r in clustering.kmeans_clusters(df, k=3, iters=2).collect()
    }
    exp = _kmeans_reference(
        {0: [1.0, 1.0], 1: [1.0, 1.0], 2: [1.0, 1.0], 3: [0.001, 0.0]},
        k=3,
        iters=2,
    )
    assert got == exp


def test_kmeans_assignment_plan_is_shuffle_free(toy):
    """The final assignment must be a pure per-row projection over the
    scan — broadcast-literal centroids, no Exchange, no join."""
    _, df = toy
    out = clustering.kmeans_clusters(df, k=2, iters=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_semdedup_plan_is_cluster_bucketed(toy):
    """The pair stage must be an equi-join on the cluster key, never a
    cartesian product."""
    _, df = toy
    out = clustering.semdedup(df, k=2, iters=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
