"""Embedding clustering and semantic deduplication.

Two operators over the embeddings table (vec_id, embedding array<float>):

  * kmeans_clusters — Lloyd's k-means with a FIXED iteration count and
    deterministic centroid seeding (the ivf_assignments convention:
    centroids start as the vectors with vec_id < k). Assignment metric is
    squared Euclidean distance.
  * semdedup — SemDeDup-style semantic near-dup pruning: vectors are
    clustered, pairwise cosine is computed ONLY within a cluster, and a
    vector is dropped when a lower-id cluster-mate sits above the
    similarity threshold (greedy keep-lowest-id, the exact-dedup
    tie-break). The cluster step is what makes this a scale path: the
    candidate set is cluster-local, never the corpus cross join.

Cross-engine determinism (the part float k-means cannot give): every
coordinate is quantized to the 1e-6 grid as a BIGINT up front. Sums of
integers are exact and ORDER-INDEPENDENT, so the centroid update
(floor(mean) per dimension, computed as floor(exact_int_sum / count) in
one IEEE division of two exactly-representable integers) produces
bit-identical centroids on any partitioning and in any engine. Distances
are exact integer arithmetic end to end. A float implementation differs
across engines in the last ulp of every mean and eventually flips an
assignment; the quantized one cannot.

Scale plan:
- Per round, the driver sees k centroid rows (k*dim values) — the
  learn_merges convergence-probe pattern, never the data. Assignment is a
  per-row expression over broadcast centroid literals: no shuffle at all.
- The centroid update is one groupBy (cluster, pos) over the posexploded
  vectors: k*dim result rows, near-uniform keys, one shuffle per round.
- semdedup's pair join shuffles on cluster id; skewed clusters are the
  known SemDeDup failure mode, so cluster sizes surface in the output for
  monitoring (the 100 TB deployment re-splits oversized cells by raising
  k, exactly like IVF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .simsearch import GRID_QUANT, _dot, quantize_grid, with_norm

KMEANS_K = 4
KMEANS_ITERS = 3
QUANT = GRID_QUANT  # one grid for every integer-exact embedding kernel
SEMDEDUP_TAU = 0.9  # cosine threshold — the embedding_near_dup regime

# the shared exact-integer quantizer lives in simsearch.quantize_grid —
# PQ codes and kmeans assignments must sit on the SAME grid or their
# twins silently diverge
_quantized = quantize_grid


def _sqdist(q_col, centroid: list[int]):
    """Exact integer squared distance from an array<long> column to a
    centroid literal. dim*~(2e6)^2 tops out near 2.6e14 — far inside
    BIGINT."""
    lit = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with(q_col, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(qdf: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Attach (cluster, dist_sq): argmin over the centroid literals with
    the lowest-cluster-id tie-break. Pure per-row expressions — broadcast
    state, zero shuffle."""
    dists = F.array(*[_sqdist(F.col("q"), c) for c in centroids])
    # array_position finds the FIRST occurrence => ties go to the lowest
    # cluster id in both engines.
    best = F.array_min(dists)
    return qdf.select(
        "vec_id",
        "q",
        (F.array_position(dists, best) - 1).cast("int").alias("cluster"),
        best.alias("dist_sq"),
    )


def _update(assigned: DataFrame, k: int) -> list[list[int]]:
    """New centroids: floor(mean) per (cluster, pos) in exact integer
    arithmetic; k*dim rows cross to the driver. Empty clusters keep no
    row and are respawned at the origin (deterministic, engine-shared)."""
    rows = (
        assigned.select(
            "cluster", F.posexplode(F.col("q")).alias("pos", "v")
        )
        .groupBy("cluster", "pos")
        .agg(
            F.floor(
                F.sum("v").cast("double") / F.count("*").cast("double")
            )
            .cast("long")
            .alias("c")
        )
        .collect()
    )
    dim = 1 + max(r["pos"] for r in rows)
    cents = [[0] * dim for _ in range(k)]
    for r in rows:
        cents[r["cluster"]][r["pos"]] = int(r["c"])
    return cents


def initial_centroids(qdf: DataFrame, k: int) -> list[list[int]]:
    """Seed = the vectors with vec_id 0..k-1, cluster label = vec_id. The
    DuckDB twin keys its seed clusters by vec_id, so EVERY id in [0, k)
    must exist — a gap would make Spark relabel by list position while the
    twin keeps the true ids, silently diverging from round 1 on. Validate
    instead of assuming — including SHAPE: a NULL or ragged seed vector
    would null-pad every zip_with distance and crash the first _update on
    an empty collect."""
    rows = qdf.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    got = [int(r["vec_id"]) for r in rows]
    if got != list(range(k)):
        raise ValueError(
            f"kmeans seed needs vec_ids 0..{k - 1} present; got {got[:10]}"
        )
    cents = [list(r["q"]) if r["q"] is not None else [] for r in rows]
    dims = {len(c) for c in cents}
    if len(dims) != 1 or 0 in dims:
        raise ValueError(
            f"kmeans seed vectors must share one non-zero dimensionality; "
            f"got sizes {sorted(len(c) for c in cents)}"
        )
    return cents


def kmeans_clusters(
    embeddings: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> DataFrame:
    """(vec_id, cluster, dist_sq): final assignment after `iters` Lloyd
    rounds from the vec_id<k seed. dist_sq is the exact quantized-grid
    squared distance to the winning centroid.

    Dirty rows (NULL or wrong-dimensionality embeddings — failed-encoder
    artifacts) are DROPPED, matching the DuckDB twin, whose per-dimension
    unnest emits nothing for them; carried through, they would null-pad
    zip_with and emit (id, NULL, NULL) rows the twin never has."""
    cached = _quantized(embeddings).persist()
    try:
        cached.count()
        cents = initial_centroids(cached, k)
        qdf = cached.filter(F.size("q") == len(cents[0]))
        for _ in range(iters):
            cents = _update(_assign(qdf, cents), k)
        return _assign(qdf, cents).select("vec_id", "cluster", "dist_sq")
    finally:
        cached.unpersist()


def semdedup(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    tau: float = SEMDEDUP_TAU,
    persist_to: list | None = None,
) -> DataFrame:
    """SemDeDup: (vec_id, cluster, is_kept). A vector is dropped when some
    LOWER-id vector in the same k-means cluster has cosine >= tau with it
    (greedy keep-first — one pass, no transitive closure, the published
    SemDeDup recipe). Cosine uses the shared rounded-double discipline of
    the simsearch family, so the twin ranks the identical value."""
    clusters = kmeans_clusters(embeddings, k, iters).select("vec_id", "cluster")
    if persist_to is not None:
        # `clusters` feeds the base join AND the final output join, with
        # kmeans' own cache already released — unpersisted, one action
        # re-runs the whole quantize+assign subtree twice
        # (persist-with-owner rule)
        clusters = clusters.persist()
        persist_to.append(clusters)
    base = with_norm(embeddings).join(clusters, "vec_id")
    left = base.select(
        F.col("cluster"),
        F.col("vec_id").alias("a_id"),
        F.col("vec").alias("a_vec"),
        F.col("norm").alias("a_norm"),
    )
    right = base.select(
        F.col("cluster"),
        F.col("vec_id").alias("b_id"),
        F.col("vec").alias("b_vec"),
        F.col("norm").alias("b_norm"),
    )
    dropped = (
        left.join(right, "cluster")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("a_vec"), F.col("b_vec"))
                / (F.col("a_norm") * F.col("b_norm")),
                6,
            ),
        )
        .filter(F.col("cos") >= tau)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    # zero-norm vectors are excluded from search (with_norm) but must keep
    # a row in the audit output: they join no cluster pair, stay kept.
    return (
        clusters.join(dropped.withColumn("hit", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce(~F.col("hit"), F.lit(True)).alias("is_kept"),
        )
    )
