"""Structured Streaming ingestion of a pages stream (SURVEY.md §7.6).

The reference is batch-only (one PDF per `extract_pdf` call,
enem_pdf_extractor.py:933); a web-scale engine additionally needs to ingest
pages as they are crawled. Spark-first design:

    readStream (file source over the pages layout, schema = input_hint)
     -> withWatermark("warc_ts", ...)
     -> dropDuplicatesWithinWatermark(["url"])     # crawler re-fetch dedup
     -> foreachBatch: the SAME batch pipeline (extract_questions) + sink

``foreachBatch`` is the right primitive here because the extraction plan
contains a window + applyInPandas + broadcast join — far beyond what a
continuous streaming plan supports — and it gives exactly-once appends per
micro-batch via the checkpoint dir. Within each micro-batch the work is the
proven batch plan, so streaming adds no second implementation of the
semantics.

Caveat shared with the batch resume path: the unit of correctness is the
document (X3 numbering runs across a document's pages), so the stream
asserts per-batch document completeness only if the source delivers whole
documents per file — which the writer side guarantees by writing one parquet
file per document. For arbitrary page-at-a-time streams, pages are staged to
a holding table and complete documents are released by comparing seen-page
counts against the `/page/N` maximum (not needed for the test corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .extract import ExtractorConfig, extract_questions
from .sources.documents_bridge import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """File-source stream of pages rows with crawl-dedup on url.

    `dropDuplicatesWithinWatermark` keeps state only inside the watermark
    horizon — bounded state at 10^12-document scale, unlike a global
    dropDuplicates."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    return stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def start_extraction_stream(
    pages_stream: DataFrame,
    cfg: ExtractorConfig,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run the batch extraction plan per micro-batch, appending to the
    questions table. Returns the StreamingQuery."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            extract_questions(batch_df, cfg)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("year", "day")
            .parquet(f"{out_dir}/questions")
        )

    writer = (
        pages_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
