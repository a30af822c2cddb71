"""End-to-end training-corpus curation job (spark-submit-able).

Composes the operator set into the standard curation pipeline over a
documents table (doc_id, text, lang, source):

    [--mojibake]   double-encoded UTF-8 repair (one Arrow crossing)
    [--normalize]  unicode repair (NFC + control strip, one Arrow crossing)
    corpus_curate  language / length / quality / exact-dup keep-list
    [--c4]         C4 line/page heuristic gate (pure codegen, pre-dedup;
                   NOTE: the synthetic word-soup testdata has no terminal
                   punctuation, so this gate correctly drops ~all of it —
                   meaningful on real prose, see test_c4_and_mojibake_stages)
    [--near-dedup] MinHash-LSH connected components, keep the cluster min
    [--benchmark]  8-gram decontamination against an eval set
    train_split    content-hash train/val/test banding
    sinks          curated/ (parquet, partitioned by split) + audit/
                   (one row per INPUT doc: final keep + first-fail reason)
    [--export-shards N]  last mile: the kept train split additionally
                   lands as N seed-shuffled byte-deterministic JSONL
                   shards under <output>/shards (enem_spark/export.py)

Every drop is auditable: the audit table carries a reason per document
(ok | dup | lang | short | low_quality | c4 | near_dup | contaminated), first
failing rule wins in that order — 'dup' leads because corpus_curate's
keep-list checks the exact-dup keeper before its lang/length/quality rules — a curated corpus you cannot explain is a
curated corpus you cannot debug at 10^12 documents.

Determinism/idempotence: every stage is a pure function of the input
(content-hash lotteries, min-id keepers, fixed LSH permutations), and both
sinks are overwrite writes — rerunning the job reproduces byte-identical
row sets, so no run/commit protocol is needed (unlike extraction, nothing
here is incremental state).

Scale: the stages share one scan; the wide exchanges are exactly the ones
audited in docs/SCALE.md (exact-dup groupBy, LSH band join + CC
iterations, benchmark semi-join is broadcast, split/normalize are
shuffle-free projections).

Usage:
    spark-submit --py-files enem_spark.zip jobs/curate_job.py \
        --input /data/documents.parquet --output /data/curated \
        --near-dedup --benchmark /data/benchmark.parquet
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from enem_spark import textops  # noqa: E402
from enem_spark.session import get_spark  # noqa: E402


def curate(
    docs: DataFrame,
    normalize: bool = False,
    near_dedup: bool = True,
    benchmark: DataFrame | None = None,
    lang: str = "en",
    mojibake: bool = False,
    c4: bool = False,
    persist_to: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (curated, audit). curated = surviving documents + split;
    audit = every input doc_id with (keep, reason, split|NULL).

    When ``mojibake``/``normalize`` are requested, pass ``persist_to``
    (persist-with-owner): the repaired frame feeds ~8 downstream stages,
    and without a cache the Arrow repair kernel re-executes per subtree
    — main() owns the persist on the CLI path the same way."""
    if mojibake:
        docs = textops.with_repaired_text(docs)
    if normalize:
        docs = textops.with_normalized_text(docs)
    if (mojibake or normalize) and persist_to is not None:
        docs = docs.persist()
        persist_to.append(docs)

    base = textops.corpus_curate(docs, lang=lang).select(
        "doc_id", "keep", "reason"
    )

    if c4:
        # heuristic page gate BEFORE the expensive dedup stages: documents
        # it drops never enter the LSH band join
        flags = textops.c4_filters(docs).select("doc_id", "c4_pass")
        base = base.join(flags, "doc_id", "left").select(
            "doc_id",
            (F.col("keep") & F.coalesce("c4_pass", F.lit(True))).alias("keep"),
            F.when(
                F.col("keep") & ~F.coalesce("c4_pass", F.lit(True)), "c4"
            )
            .otherwise(F.col("reason"))
            .alias("reason"),
        )

    if near_dedup:
        survivors = docs.join(
            base.filter(F.col("keep")).select("doc_id"), "doc_id"
        )
        clusters = textops.dedup_clusters(survivors)
        near_drop = clusters.filter(
            F.col("cluster_id") != F.col("doc_id")
        ).select("doc_id", F.lit("near_dup").alias("nd_reason"))
        base = base.join(near_drop, "doc_id", "left").select(
            "doc_id",
            (F.col("keep") & F.col("nd_reason").isNull()).alias("keep"),
            F.when(F.col("keep") & F.col("nd_reason").isNotNull(), "near_dup")
            .otherwise(F.col("reason"))
            .alias("reason"),
        )

    if benchmark is not None:
        # gate on CURRENT survivors: documents the earlier rules dropped
        # would only waste the 8-gram hash + dedup shuffle (their flag is
        # discarded — reason applies when keep was still true), same
        # optimization the c4 comment states for the LSH stage
        ct_in = docs.join(base.filter(F.col("keep")).select("doc_id"), "doc_id")
        flagged = textops.decontaminate(ct_in, benchmark).select(
            "doc_id", F.lit("contaminated").alias("ct_reason")
        )
        base = base.join(flagged, "doc_id", "left").select(
            "doc_id",
            (F.col("keep") & F.col("ct_reason").isNull()).alias("keep"),
            F.when(F.col("keep") & F.col("ct_reason").isNotNull(), "contaminated")
            .otherwise(F.col("reason"))
            .alias("reason"),
        )

    splits = textops.train_split(docs)
    audit = base.join(splits, "doc_id").select(
        "doc_id",
        "keep",
        "reason",
        F.when(F.col("keep"), F.col("split")).alias("split"),
    )
    curated = docs.join(
        audit.filter(F.col("keep")).select("doc_id", "split"), "doc_id"
    )
    return curated, audit


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--normalize", action="store_true")
    ap.add_argument("--mojibake", action="store_true",
                    help="repair double-encoded UTF-8 before curation")
    ap.add_argument("--c4", action="store_true",
                    help="apply the C4 line/page heuristic gate")
    ap.add_argument("--near-dedup", action="store_true")
    ap.add_argument("--benchmark", default=None, help="benchmark parquet for decontamination")
    ap.add_argument("--cores", default=None)
    ap.add_argument("--export-shards", type=int, default=None, metavar="N",
                    help="also write the kept TRAIN split as N seed-"
                         "shuffled byte-deterministic JSONL shards under "
                         "<output>/shards (export_job's writer — the "
                         "pipeline's last mile in one command)")
    ap.add_argument("--export-seed", type=int, default=7)
    args = ap.parse_args()

    spark = get_spark("curate_job", cores=args.cores)
    # caller owns the persist lifetime (the lineage.run_extraction
    # discipline); normalization is applied BEFORE the persist so the
    # Arrow crossing runs once, not once per downstream stage
    docs = spark.read.parquet(args.input)
    if args.mojibake:
        docs = textops.with_repaired_text(docs)
    if args.normalize:
        docs = textops.with_normalized_text(docs)
    docs = docs.persist()
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    curated, audit = curate(
        docs,
        near_dedup=args.near_dedup,
        benchmark=bench,
        lang=args.lang,
        c4=args.c4,
    )
    audit = audit.persist()
    (
        curated.write.mode("overwrite")
        .partitionBy("split")
        .parquet(os.path.join(args.output, "curated"))
    )
    audit.write.mode("overwrite").parquet(os.path.join(args.output, "audit"))

    reasons = {
        r["reason"]: r["n"]
        for r in audit.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    splits = {
        r["split"]: r["n"]
        for r in audit.filter(F.col("keep"))
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    summary = {
        "input": audit.count(),
        "kept": sum(splits.values()),
        "reasons": reasons,
        "splits": splits,
    }
    if args.export_shards:
        from enem_spark.export import export_jsonl_shards

        exp = export_jsonl_shards(
            curated.filter(F.col("split") == "train").drop("split"),
            os.path.join(args.output, "shards"),
            n_shards=args.export_shards,
            seed=args.export_seed,
        )
        summary["export"] = {
            "n_docs": exp["n_docs"],
            "n_shards": exp["n_shards"],
        }
    audit.unpersist()
    docs.unpersist()
    print(json.dumps(summary, sort_keys=True))


if __name__ == "__main__":
    main()
