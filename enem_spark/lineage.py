"""Per-partition lineage/metrics + checkpoint-resumable extraction runs.

The north rule requires the pipeline to be "resumable from checkpoint with
per-partition lineage + metrics". The reference has neither (it is a
single-process script, re-run from zero on failure — pdf_extraction_test.py
just loops `extract_pdf`); this module adds both, Spark-first:

  * **lineage**: the page stage runs through an Arrow-batched ``mapInPandas``
    wrapper that stamps each row with its task partition id and amortized
    batch wall time; a per-partition aggregate is appended to a ``lineage``
    parquet table next to the outputs (run_id, part_id, input_pages,
    marker_pages, q_candidates, parse_failures, wall_ms).
  * **checkpoint-resume**: the unit of work is the *document* (page numbering
    is a running sum across a document's pages — resuming mid-document would
    corrupt X3), so each run appends its completed ``doc_id``s to a
    ``processed_docs`` table and the next run left-anti-joins against it.
    Re-running after a crash therefore touches only unfinished documents, and
    appends are idempotent at the document level.
  * **quarantine**: F1 contract violations (enem_pdf_extractor.py:81-100
    raises IOError) are appended to a ``quarantine`` table instead.

Run directory layout (parquet everywhere; Iceberg DDL would be identical —
the sandbox has no Iceberg catalog, so plain parquet paths stand in):

    out_dir/questions/       partitioned by (year, day)
    out_dir/lineage/
    out_dir/processed_docs/
    out_dir/quarantine/
"""

from __future__ import annotations

import os
import time
from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .extract import (
    ExtractorConfig,
    PAGE_STRUCT,
    _process_one_page,
    build_answer_keys,
    questions_from_counted,
    split_quarantine,
    with_page_numbering,
    with_url_metadata,
)

_META_COLS = ["url", "doc_id", "page_idx", "year", "day", "color"]

INSTRUMENTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("page_idx", T.IntegerType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("day", T.StringType()),
        T.StructField("color", T.StringType()),
        *PAGE_STRUCT.fields,
        T.StructField("part_id", T.IntegerType()),
        T.StructField("wall_ms", T.DoubleType()),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("input_pages", T.LongType()),
        T.StructField("marker_pages", T.LongType()),
        T.StructField("q_candidates", T.LongType()),
        T.StructField("parse_failures", T.LongType()),
        T.StructField("wall_ms", T.DoubleType()),
    ]
)


def instrumented_page_stage(pv: DataFrame, cfg: ExtractorConfig) -> DataFrame:
    """Page UDF + metrics in ONE Arrow crossing.

    Identical per-page semantics to extract.make_page_udf (both call
    _process_one_page); additionally emits the task partition id and the
    batch wall time amortized per row, so a plain groupBy(part_id) over the
    output yields per-partition lineage without a second pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else -1
        for pdf in batches:
            t0 = time.perf_counter()
            recs = [
                _process_one_page(u, h, t, cfg)
                for u, h, t in zip(pdf["url"], pdf["html"], pdf["text"])
            ]
            ms = (time.perf_counter() - t0) * 1000.0
            out = pd.DataFrame(recs)
            for c in _META_COLS:
                out[c] = pdf[c].values
            out["part_id"] = part_id
            out["wall_ms"] = ms / max(len(pdf), 1)
            yield out[[f.name for f in INSTRUMENTED_SCHEMA.fields]]

    cols = _META_COLS + ["html", "text"]
    return pv.select(*cols).mapInPandas(run, INSTRUMENTED_SCHEMA)


def partition_lineage(paged: DataFrame, run_id: str) -> DataFrame:
    """Per-partition metrics aggregate over the instrumented page stage."""
    failures = F.size(F.filter(F.col("questions"), lambda q: ~q.ok))
    return (
        paged.groupBy("part_id")
        .agg(
            F.count("*").alias("input_pages"),
            F.sum((F.col("q_count") > 0).cast("long")).alias("marker_pages"),
            F.sum(F.coalesce(F.col("q_count"), F.lit(0)).cast("long")).alias(
                "q_candidates"
            ),
            F.sum(failures.cast("long")).alias("parse_failures"),
            F.round(F.sum("wall_ms"), 3).alias("wall_ms"),
        )
        .select(F.lit(run_id).alias("run_id"), "*")
    )


def _exists(path: str) -> bool:
    return os.path.exists(path) and any(
        f.endswith(".parquet") or f.startswith("part-")
        for _, _, fs in os.walk(path)
        for f in fs
    )


def processed_doc_ids(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = f"{out_dir}/processed_docs"
    if not _exists(path):
        return None
    return spark.read.parquet(path).select("doc_id").distinct()


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    cfg: ExtractorConfig,
    out_dir: str,
    run_id: str,
) -> dict:
    """One checkpoint-resumable extraction run over a pages table.

    Returns a summary dict; all side outputs land under ``out_dir``. Calling
    it again with the same inputs is a no-op (every document already in
    processed_docs is anti-joined away)."""
    meta = with_url_metadata(pages.filter(F.col("lang") == "pt"))
    valid, quarantined = split_quarantine(meta)
    pv = valid.filter((F.col("kind") == "PV") & (F.col("page_idx") >= 1))

    done = processed_doc_ids(spark, out_dir)
    if done is not None:
        pv = pv.join(F.broadcast(done), "doc_id", "left_anti")

    paged = instrumented_page_stage(pv, cfg).persist()
    try:
        n_pages = paged.count()
        counted = with_page_numbering(
            paged.filter(F.col("q_count") > 0), cfg.salt_chunk_size
        )
        keys = build_answer_keys(valid)
        questions = questions_from_counted(counted, keys, cfg)
        (
            questions.withColumn("run_id", F.lit(run_id))
            .write.mode("append")
            .partitionBy("year", "day")
            .parquet(f"{out_dir}/questions")
        )
        # an all-filtered run appends zero part files, leaving a schema-less
        # dir — guard the read-back (same reason processed_doc_ids guards)
        n_questions = (
            spark.read.parquet(f"{out_dir}/questions")
            .filter(F.col("run_id") == run_id)
            .count()
            if _exists(f"{out_dir}/questions")
            else 0
        )

        lineage = partition_lineage(paged, run_id)
        lineage.write.mode("append").parquet(f"{out_dir}/lineage")

        (
            paged.select("doc_id")
            .distinct()
            .withColumn("run_id", F.lit(run_id))
            .write.mode("append")
            .parquet(f"{out_dir}/processed_docs")
        )
        n_quarantined = quarantined.count()
        if n_quarantined:
            (
                quarantined.select("url", "year", "day", "kind", "color")
                .withColumn("run_id", F.lit(run_id))
                .write.mode("append")
                .parquet(f"{out_dir}/quarantine")
            )
    finally:
        paged.unpersist()
    return {
        "run_id": run_id,
        "input_pages": n_pages,
        "questions_written": n_questions,
        "quarantined": n_quarantined,
    }
