"""Icetable maintenance job — the nightly-ops entry point.

spark-submit-shaped CLI bundling the table-format maintenance operators
(sources/icetable.py) the 10^12-row crawl table needs on a schedule:

  --compact SEQ          rewrite_data_files: coalesce multi-file partitions
                         (ONE Spark job; single-file partitions carry over
                         by manifest reference)
  --expire-from SEQ      snapshot GC: drop snapshots with sequence < SEQ
                         (except current) and delete files only they
                         referenced
  --rollback ID --seq N  metadata-only revert to snapshot ID (zero data IO;
                         reverted history stays time-travelable until
                         expired)
  --delete-keys PARQUET --delete-seq N
                         merge-on-read takedown: commit the parquet's rows
                         (every column a delete key, e.g. one `url` column)
                         as an equality-delete file — zero data files
                         rewritten; readers anti-join it, sequence-scoped,
                         so later re-crawls of a url survive the takedown.
                         Add --takedown-out DIR to ALSO stop the serving
                         view from serving already-extracted content for
                         those urls (icerun.apply_takedown)
  --purge-deletes SEQ    materialize pending equality deletes: rewrite ONLY
                         the data files holding deleted keys (key-column
                         planning scan) and drop the delete entries; reads
                         stop paying the per-scan anti-join
  --zorder COLS --zorder-seq N
                         z-order clustering rewrite: re-sort the data files
                         by the interleaved key over the comma-separated
                         COLS so manifest min/max bounds prune on EVERY
                         cluster column (time slice + url probe both skip);
                         runs after compact — compact coalesces to one file
                         per partition, zorder re-splits on the sort key
  --publish BRANCH       fast-forward main to BRANCH's head (the PUBLISH
                         half of write-audit-publish): one atomic metadata
                         commit makes the audited snapshots visible to
                         every main reader; refuses a diverged branch
  --tag NAME             pin the current snapshot under an immutable name
                         (e.g. crawl-2024-02): readable by ref forever,
                         exempt from snapshot expiry
  --orphans              delete data files referenced by NO snapshot
                         (crash leftovers); --older-than-s (default 3 days,
                         as in Iceberg) guards in-flight commit attempts —
                         deleting a live attempt's pre-commit files would
                         corrupt its successful commit, not conflict it
  --stats DIR            incremental corpus-stats refresh (statstore.py):
                         fold pages absent from the store's doc_id cursor
                         (content-addressed, xxhash64(url, md5(html))) into
                         the mergeable sketch store at DIR, grouped by
                         --stats-group (default lang), and report per-group
                         n_docs/n_tokens/vocab_est/p50/p90/p99. Cost is
                         O(new content versions since the last refresh),
                         never O(table); the report equals a full recompute
                         over every version ever folded (re-crawled urls
                         contribute each content version once)
  --terms DIR            same shape for heavy hitters: fold new content
                         versions into the incremental CMS term store at
                         DIR and report top --terms-k terms per group
                         (registers merge by SUM, candidates by union —
                         report == one-shot cms_topk over everything
                         folded)

Actions run in the order rollback -> publish -> tag -> delete-keys ->
purge-deletes -> compact -> zorder -> expire -> orphans -> stats/terms
(publish before maintenance so the night's rewrites cover the audited
state; tag after publish pins what was just published; revert first so
compaction works on the state you mean to keep; takedowns land before
maintenance rewrites so purge/compact materialize them; zorder after
compact because compact coalesces per-partition files that zorder then
re-splits on the sort key; GC before profiling; profiling last so the
night's reports reflect the kept state). Emits
ONE JSON summary line. rollback/compact/expire commit through the same
O_EXCL version-file protocol as any writer, so racing a live ingest yields
CommitConflict, never corruption — rerun the job. Orphan GC is the one
action the protocol cannot referee (it touches files no snapshot names);
its age threshold is the guard — keep it above the longest write attempt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="icetable path")
    ap.add_argument("--cores", default=None)
    ap.add_argument("--compact", type=int, default=None, metavar="SEQ",
                    help="compact multi-file partitions, committing at SEQ")
    ap.add_argument("--expire-from", type=int, default=None, metavar="SEQ",
                    help="expire snapshots with sequence < SEQ")
    ap.add_argument("--rollback", type=int, default=None, metavar="SNAPSHOT",
                    help="revert to this snapshot id (needs --seq)")
    ap.add_argument("--seq", type=int, default=None,
                    help="sequence for the --rollback commit")
    ap.add_argument("--delete-keys", default=None, metavar="PARQUET",
                    help="equality-delete takedown: commit this parquet's "
                         "rows as a merge-on-read delete file (needs "
                         "--delete-seq)")
    ap.add_argument("--delete-seq", type=int, default=None,
                    help="commit sequence for --delete-keys")
    ap.add_argument("--takedown-out", default=None, metavar="DIR",
                    help="extraction out_dir to propagate --delete-keys "
                         "into: routes through icerun.apply_takedown so "
                         "the serving view stops serving the urls too "
                         "(the table delete alone cannot reach already-"
                         "extracted side outputs)")
    ap.add_argument("--purge-deletes", type=int, default=None, metavar="SEQ",
                    help="materialize pending equality deletes (targeted "
                         "rewrite) and drop the delete files")
    ap.add_argument("--zorder", default=None, metavar="COLS",
                    help="comma-separated columns for a z-order clustering "
                         "rewrite (needs --zorder-seq)")
    ap.add_argument("--zorder-seq", type=int, default=None,
                    help="commit sequence for --zorder")
    ap.add_argument("--zorder-filter", action="append", default=[],
                    metavar="COL:OP:VALUE",
                    help="scope the z-order rewrite (repeatable; source "
                         "columns, ISO timestamps ok), e.g. "
                         "warc_ts:>=:2024-01-10T00:00:00 — at 10^12 rows "
                         "cluster incrementally per partition window, "
                         "never the whole table in one commit")
    ap.add_argument("--publish", default=None, metavar="BRANCH",
                    help="fast-forward main to this branch head and drop "
                         "the ref (write-audit-publish)")
    ap.add_argument("--tag", default=None, metavar="NAME",
                    help="tag the current snapshot under this name")
    ap.add_argument("--orphans", action="store_true",
                    help="delete unreferenced data files")
    ap.add_argument("--older-than-s", type=float, default=3 * 86400.0,
                    help="orphan age guard in seconds (default 3 days, "
                         "Iceberg's own default): files younger than this "
                         "may belong to an IN-FLIGHT commit attempt, whose "
                         "commit would succeed and then reference deleted "
                         "files — lower only when no writer can be live")
    ap.add_argument("--stats", default=None, metavar="DIR",
                    help="fold the current snapshot's new content versions "
                         "into the incremental corpus-stats store at DIR "
                         "and print the per-group report")
    ap.add_argument("--stats-group", default="lang",
                    help="pages column to group the stats/terms reports by "
                         "(default: lang)")
    ap.add_argument("--terms", default=None, metavar="DIR",
                    help="fold new content versions into the incremental "
                         "heavy-hitters (CMS) term store at DIR and print "
                         "the top --terms-k terms per group")
    ap.add_argument("--terms-k", type=int, default=10,
                    help="how many top terms per group the --terms report "
                         "prints (default 10)")
    args = ap.parse_args()
    if args.rollback is not None and args.seq is None:
        ap.error("--rollback needs --seq for its commit sequence")
    if args.delete_keys is not None and args.delete_seq is None:
        ap.error("--delete-keys needs --delete-seq for its commit sequence")
    if args.zorder is not None and args.zorder_seq is None:
        ap.error("--zorder needs --zorder-seq for its commit sequence")
    if args.takedown_out and args.delete_keys is None:
        # silently skipping a requested takedown propagation would leave
        # the serving view serving the urls while the job reports success
        ap.error("--takedown-out propagates a takedown: pass "
                 "--delete-keys/--delete-seq alongside it")
    # validate --zorder-filter specs at PARSE time: a malformed spec must
    # not crash the ladder after delete/purge/compact already committed
    zfilters = []
    for spec in args.zorder_filter:
        parts = spec.split(":", 2)
        if len(parts) != 3:
            ap.error(f"--zorder-filter '{spec}': expected COL:OP:VALUE")
        zfilters.append(tuple(parts))
    if zfilters and args.zorder is None:
        ap.error("--zorder-filter scopes a --zorder rewrite: pass --zorder")
    if not any(
        [args.compact is not None, args.expire_from is not None,
         args.rollback is not None, args.orphans, args.stats, args.terms,
         args.delete_keys is not None, args.purge_deletes is not None,
         args.zorder is not None, args.publish is not None,
         args.tag is not None]
    ):
        ap.error("nothing to do: pass at least one maintenance action")

    from enem_spark.session import get_spark
    from enem_spark.sources.icetable import IceTable

    spark = get_spark("enem_spark_ice_maintenance", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    t = IceTable(spark, args.table)
    summary: dict = {"table": args.table}
    if args.rollback is not None:
        snap = t.rollback(args.rollback, sequence=args.seq)
        summary["rollback"] = {
            "snapshot_id": snap["snapshot_id"],
            "rolled_back_to": snap["summary"]["rolled_back_to"],
        }
    if args.publish is not None:
        meta = t.publish_branch(args.publish)
        summary["publish"] = {
            "branch": args.publish,
            "current_snapshot_id": meta["current_snapshot_id"],
        }
    if args.tag is not None:
        t.tag(args.tag)
        summary["tag"] = {
            "name": args.tag,
            "snapshot_id": t.refs()[args.tag]["snapshot_id"],
        }
    if args.delete_keys is not None:
        keys = spark.read.parquet(args.delete_keys)
        if args.takedown_out:
            from enem_spark.icerun import apply_takedown

            td = apply_takedown(
                spark, args.table, args.takedown_out, keys,
                sequence=args.delete_seq,
            )
            summary["row_delete"] = {
                "takedown_run_id": td["run_id"],
                "propagated_to": args.takedown_out,
            }
        else:
            snap = t.delete_rows(keys, sequence=args.delete_seq)
            summary["row_delete"] = (
                snap
                if snap.get("operation") == "noop"
                else {
                    "snapshot_id": snap["snapshot_id"],
                    "deleted_keys": snap["summary"]["deleted_keys"],
                    "delete_files": snap["summary"]["delete_files"],
                }
            )
    if args.purge_deletes is not None:
        snap = t.purge_deletes(sequence=args.purge_deletes)
        summary["purge_deletes"] = (
            snap
            if snap.get("operation") == "noop"
            else {
                "snapshot_id": snap["snapshot_id"],
                "files_rewritten": snap["summary"]["files_rewritten"],
                "delete_files_removed": snap["summary"][
                    "delete_files_removed"
                ],
            }
        )
    if args.compact is not None:
        # every-partition-already-one-file: compact() returns the CURRENT
        # snapshot untouched — detect the noop by ID (a real compaction
        # always commits a NEW snapshot; keying on the summary fields
        # misfired when the current snapshot was itself a past compaction)
        before_ids = {s_["snapshot_id"] for s_ in t.snapshots()}
        snap = t.compact(sequence=args.compact)
        summary["compact"] = (
            {"operation": "noop"}
            if snap["snapshot_id"] in before_ids
            else {
                "snapshot_id": snap["snapshot_id"],
                "compacted_from_files": snap["summary"].get(
                    "compacted_from_files", 0
                ),
                "added_files": snap["summary"]["added_files"],
            }
        )
    if args.zorder is not None:
        def _lit(v: str):
            for cast in (int, float):
                try:
                    return cast(v)
                except ValueError:
                    pass
            return v

        snap = t.cluster_files(
            [c.strip() for c in args.zorder.split(",") if c.strip()],
            sequence=args.zorder_seq,
            filters=[(c, op, _lit(v)) for c, op, v in zfilters] or None,
        )
        summary["zorder"] = (
            snap
            if snap.get("operation") == "noop"
            else {
                "snapshot_id": snap["snapshot_id"],
                "files_rewritten": snap["summary"]["files_rewritten"],
                "cluster_cols": snap["summary"]["cluster_cols"],
            }
        )
    if args.expire_from is not None:
        summary["expire"] = t.expire_snapshots(
            keep_sequences_from=args.expire_from
        )
    if args.orphans:
        summary["orphans"] = t.remove_orphan_files(
            older_than_s=args.older_than_s
        )
    if args.stats or args.terms:
        from pyspark.sql import functions as F

        from enem_spark import statstore

        pages = t.read()
        # content-addressed doc_id (icerun's identity): a re-crawl that
        # changes a page folds the new version as a new doc; an unchanged
        # or replayed page is absorbed by the store's cursor anti-join.
        # The identity scan (url + md5(html)) is unavoidably O(table) —
        # content addressing needs the bytes — but TEXT must only
        # materialize for the UNFOLDED delta: pre-anti-join the narrow
        # (doc_id, group) frame against the cursors of the stores being
        # updated (a doc folded by EVERY one of them can be dropped here;
        # each update still anti-joins its OWN cursor, so this filter is
        # purely cost, never correctness), then join text back for the
        # survivors. Caching the full corpus text per nightly tick — the
        # previous shape — contradicted the O(delta) contract above.
        # The per-doc pick is min(), not an arbitrary dropDuplicates row,
        # so reruns and the twin tests derive identical labels for a
        # duplicated doc_id.
        ids = (
            pages.select(
                F.xxhash64("url", F.md5("html")).alias("doc_id"),
                F.coalesce(
                    F.col(args.stats_group).cast("string"), F.lit("und")
                ).alias(args.stats_group),
            )
            .groupBy("doc_id")
            .agg(F.min(args.stats_group).alias(args.stats_group))
        )
        cursors = []
        if args.stats:
            cursors.append(statstore.folded_doc_ids(spark, args.stats))
        if args.terms:
            cursors.append(statstore.folded_term_doc_ids(spark, args.terms))
        if any(c is None for c in cursors):
            # some active store is empty: it needs every doc — no pre-drop,
            # and the two-pass shape below would only pay the content-hash
            # scan twice for nothing, so fall back to ONE combined select
            docs = (
                pages.select(
                    F.xxhash64("url", F.md5("html")).alias("doc_id"),
                    F.coalesce(
                        F.col(args.stats_group).cast("string"), F.lit("und")
                    ).alias(args.stats_group),
                    F.coalesce(F.col("text"), F.lit("")).alias("text"),
                )
                .groupBy("doc_id")
                .agg(
                    F.min(args.stats_group).alias(args.stats_group),
                    F.min("text").alias("text"),
                )
                .withColumn("n_chars", F.length("text"))
                .persist()
            )
        else:
            folded_everywhere = cursors[0]
            for cursor in cursors[1:]:
                folded_everywhere = folded_everywhere.join(
                    cursor, "doc_id", "left_semi"
                )
            new_ids = ids.join(
                folded_everywhere.select("doc_id"), "doc_id", "left_anti"
            )
            docs = (
                pages.select(
                    F.xxhash64("url", F.md5("html")).alias("doc_id"),
                    F.coalesce(F.col("text"), F.lit("")).alias("text"),
                )
                .join(new_ids, "doc_id")
                .groupBy("doc_id")
                .agg(
                    F.min(args.stats_group).alias(args.stats_group),
                    F.min("text").alias("text"),
                )
                .withColumn("n_chars", F.length("text"))
                .persist()
            )

        # compaction rewrites the full cursor (O(corpus) doc_ids), so the
        # nightly tick amortizes it over ~a week of delta runs instead of
        # paying it every night
        NIGHTLY_COMPACT_MIN_RUNS = 8

        def profile(update, compact, report) -> dict:
            res = update()
            comp = compact()
            try:
                rep = [r.asDict() for r in report().collect()]
            except ValueError:
                # empty table + never-committed store: the no-op fold
                # commits nothing, so there is nothing to report — the
                # earlier actions' summary must still print
                rep = []
            return {**res, "compaction": comp, "report": rep}

        try:
            if args.stats:
                summary["stats"] = profile(
                    lambda: statstore.update_corpus_stats(
                        spark, args.stats, docs, group_col=args.stats_group
                    ),
                    lambda: statstore.compact_stats(
                        spark, args.stats,
                        min_runs=NIGHTLY_COMPACT_MIN_RUNS,
                    ),
                    lambda: statstore.corpus_stat_report(
                        spark, args.stats
                    ).orderBy("grp"),
                )
            if args.terms:
                summary["terms"] = profile(
                    lambda: statstore.update_term_sketch(
                        spark, args.terms, docs, group_col=args.stats_group
                    ),
                    lambda: statstore.compact_terms(
                        spark, args.terms,
                        min_runs=NIGHTLY_COMPACT_MIN_RUNS,
                    ),
                    lambda: statstore.top_term_report(
                        spark, args.terms, k=args.terms_k,
                        group_col=args.stats_group,
                    ).orderBy(args.stats_group, "rank"),
                )
        finally:
            docs.unpersist()
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
