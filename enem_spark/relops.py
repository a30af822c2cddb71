"""Temporal relational operators Spark has no built-in for: as-of join and
interval (range) join.

Both are classic crawl/event-pipeline joins — "attach the latest robots.txt
fetch at or before this page fetch", "count the events inside this session's
window" — whose naive SQL forms (inequality joins) plan as
BroadcastNestedLoopJoin or a cartesian and die at scale. The rewrites here
use only equi-shuffles + windows, so they partition like every other keyed
operator in the engine:

  asof_join    union the two sides, ONE hash shuffle on the key, one
               sorted window per key, last(right_payload ignorenulls) —
               O(n log n_partition) with no pair blow-up. Same shape at
               10^12 rows; a pathologically hot key is the numbering-window
               skew problem and would get the same salting treatment
               (extract.with_page_numbering) if it ever appears in crawl
               metadata keys.
  range_join   bucket both sides by epoch(width); intervals explode to the
               (few) buckets they overlap, points land in exactly one, the
               join is a plain equi-join on (key, bucket) with a residual
               point-in-interval filter. Because a point matches an interval
               only in the point's OWN bucket, no post-join dedup is needed.
               Fan-out is bounded by interval_len/width + 1, so width is
               chosen ≥ the typical interval length.

DuckDB twins: ASOF LEFT JOIN is native in DuckDB (the driver query
pre-reduces the right side to one row per (key, ts) so tie-breaks can't
differ between engines); the range twin is the plain inequality join, which
is fine at sf0.01 and is exactly the form this module exists to avoid at
scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward as-of join: every left row gains the right row with the
    greatest ``right_ts`` <= ``left_ts`` for the same key (NULLs when no
    right row precedes it; equal timestamps DO match).

    Right payload columns (everything not in ``on``/``right_ts``) come back
    under their own names; ``right_ts`` comes back as ``asof_ts``. If
    several right rows share the key's max qualifying timestamp, the one
    with the largest payload struct wins (lexicographic struct order) —
    callers that need a specific tie-break should pre-reduce the right side
    to one row per (key, ts), which is also what keeps the DuckDB twin
    deterministic.

    Plan: union(left, right) -> one Exchange on ``on`` -> one Sort+Window
    chain -> filter side. No inequality join, no range condition, no
    cartesian — the standard scalable rewrite (same trick as
    pandas.merge_asof, distributed).

    ``tolerance_s``: when set, matches older than this many seconds before
    ``left_ts`` are nulled out (the row is kept).
    """
    on = list(on)
    lpay = [c for c in left.columns if c not in on and c != left_ts]
    rpay = [c for c in right.columns if c not in on and c != right_ts]
    overlap = set(lpay) & set(rpay)
    if overlap:
        raise ValueError(f"rename right payload columns colliding with left: {overlap}")
    reserved = {"_t", "_side", "_r", "_m", "asof_ts"} & (
        set(left.columns) | set(right.columns)
    )
    if reserved:
        raise ValueError(
            f"rename input columns shadowing asof_join internals/output: {reserved}"
        )

    # timestamp types pass through untouched (a cast would silently turn
    # TIMESTAMP_NTZ into LTZ and shift the output schema); the two sides
    # must carry union-compatible ts types, which unionByName enforces.
    rstruct = F.struct(
        F.col(right_ts).alias("asof_ts"),
        *[F.col(c) for c in rpay],
    )
    # NULL-ts right rows are droppable, not sortable: NULLS FIRST would
    # put them at the partition head where last(_r, ignorenulls) hands
    # them to every left row with no real predecessor — a bogus non-NULL
    # match where native ASOF (NULL compares to nothing) returns no-match
    r_side = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        rstruct.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
    )
    l_side = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_side.schema["_r"].dataType).alias("_r"),
        *lpay,
    )
    # right rows sort BEFORE left rows at equal _t (side 0 < 1), so an
    # equal-timestamp right row is visible to the left row — "<=" semantics.
    w = (
        W.partitionBy(*on)
        .orderBy("_t", "_side", "_r")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    matched = (
        l_side.unionByName(r_side)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    m = F.col("_m")
    if tolerance_s is not None:
        # exact to the microsecond: interval arithmetic for timestamp keys
        # (unix_timestamp would truncate sub-second fractions and keep
        # matches up to ~1 s staler than the tolerance), plain subtraction
        # for numeric ts columns
        from pyspark.sql.types import NumericType

        if isinstance(l_side.schema["_t"].dataType, NumericType):
            floor_expr = F.col("_t") - int(tolerance_s)
        else:
            floor_expr = F.col("_t") - F.expr(
                f"INTERVAL {int(tolerance_s)} SECONDS"
            )
        matched = matched.withColumn(
            "_m", F.when(m["asof_ts"] >= floor_expr, m)
        )
    return matched.select(
        *on,
        F.col("_t").alias(left_ts),
        *lpay,
        F.col("_m")["asof_ts"].alias("asof_ts"),
        *[F.col("_m")[c].alias(c) for c in rpay],
    )


# one interval may explode into at most this many bucket rows; a span
# wider than this is corrupt input by contract (see range_join body)
RANGE_JOIN_MAX_BUCKETS = 100_000


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    bucket_s: int = 600,
) -> DataFrame:
    """Interval join (inner): pair every point with every interval of the
    same key whose half-open window [start_ts, end_ts) contains it.

    Scale path: both sides bucket timestamps into ``bucket_s``-second
    epochs; an interval is exploded to each bucket it overlaps (sequence —
    bounded fan-out of len/bucket_s + 1), a point lands in exactly ONE
    bucket, so the pairing is a plain equi-join on (key, bucket) plus the
    residual containment filter — no inequality join and, because a point
    can only meet an interval in the point's own bucket, no duplicate pairs
    to clean up. Pick ``bucket_s`` at or above the typical interval length:
    fan-out stays ~2 and the shuffle is the same size as the inputs.

    Intervals that match nothing don't appear (inner semantics); callers
    that need zero-counts join the aggregate back to the interval table —
    a broadcast-or-colocated join on the interval key, which keeps THIS
    operator free of the exploded-copy collapse an outer variant would
    need. Empty/inverted intervals (end_ts <= start_ts) are dropped before
    the explode — they can contain nothing, and an unguarded descending
    sequence would otherwise fan a corrupt row out to |diff| junk buckets.
    """
    from pyspark.sql.types import NumericType

    on = list(on)
    shared = (set(points.columns) - set(on)) & (set(intervals.columns) - set(on))
    if shared:
        raise ValueError(
            f"rename non-key columns shared by points and intervals: {shared}"
        )
    if "_bkt" in points.columns or "_bkt" in intervals.columns:
        raise ValueError("'_bkt' shadows a range_join internal column")

    def _epoch(name: str, df: DataFrame):
        # unix_timestamp handles TIMESTAMP and TIMESTAMP_NTZ alike (a bare
        # cast-to-long is rejected for NTZ); numeric ts columns pass through.
        # Only relative epoch consistency between the sides matters.
        if isinstance(df.schema[name].dataType, NumericType):
            return F.col(name)
        return F.unix_timestamp(F.col(name))

    pb = F.floor(_epoch(point_ts, points) / bucket_s)
    p = points.withColumn("_bkt", pb.cast("long"))
    # end is exclusive: a window ending exactly on a bucket boundary does
    # not reach into the next bucket — but unix_timestamp TRUNCATES
    # sub-second fractions, so "ends exactly on a boundary" must be tested
    # on the full-precision value (a .4-fraction end DOES cover the next
    # bucket's opening instants).
    end_sec = _epoch(end_ts, intervals)
    if isinstance(intervals.schema[end_ts].dataType, NumericType):
        # ceil(e/b)-1, not floor((e-1)/b): identical on integer ends but
        # correct for FRACTIONAL numerics too (end 100.5, bucket 100 must
        # reach bucket 1 — floor((e-1)/b) stopped at 0 and silently
        # dropped every match in the final bucket)
        last_bkt = F.ceil(end_sec / bucket_s) - 1
    else:
        whole_second = F.col(end_ts) == F.date_trunc("second", F.col(end_ts))
        last_bkt = F.floor(
            (end_sec - F.when(whole_second, 1).otherwise(0)) / bucket_s
        )
    start_bkt = F.floor(_epoch(start_ts, intervals) / bucket_s)
    span = F.sequence(start_bkt, last_bkt)
    valid = F.col(end_ts) > F.col(start_ts)
    # Fan-out guard: ONE far-future end (year 9999, bucket_s=600 ->
    # ~4e8-element sequence, ~3 GB on one executor) would OOM the task.
    # But a wide interval can be LEGITIMATE (1 year at bucket_s=60 is
    # ~525k buckets), so over-cap rows are not dropped: they take a
    # non-exploded fallback join on the key columns alone + containment
    # filter. Wide windows are rare by construction (the cap is 100k
    # buckets), so the fallback side stays small and usually broadcasts.
    narrow = last_bkt - start_bkt < RANGE_JOIN_MAX_BUCKETS
    iv = intervals.filter(valid & narrow).withColumn("_bkt", F.explode(span))
    contained = (F.col(point_ts) >= F.col(start_ts)) & (
        F.col(point_ts) < F.col(end_ts)
    )
    out = iv.join(p, on + ["_bkt"], "inner").filter(contained).drop("_bkt")
    # The wide side is small by construction (legitimately-wide windows
    # are rare; the cap is 100k buckets), so BROADCAST it explicitly: a
    # shuffled key join would reintroduce exactly the hot-key skew the
    # bucketing exists to avoid — one adversarial far-future interval on
    # a hot key would hash every point of that key through a single task
    # and materialize the fan-out at the shuffle. Broadcast keeps points
    # un-shuffled and fuses the containment filter into the probe
    # (streaming through codegen, nothing materialized before the
    # filter). If the wide side ever exceeds broadcastable size that is
    # an input-corruption signal, and the driver-side OOM it provokes is
    # loud — preferable to the silent hot-task stall.
    wide = intervals.filter(valid & ~narrow)
    wide_out = points.join(F.broadcast(wide), on, "inner").filter(contained)
    return out.unionByName(wide_out)
