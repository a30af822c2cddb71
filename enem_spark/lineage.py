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

from . import runfs
from .extract import (
    ExtractorConfig,
    PAGE_STRUCT,
    _process_one_page,
    build_answer_keys,
    questions_from_counted,
    resolve_salt_chunk,
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


def partition_lineage(paged: DataFrame) -> DataFrame:
    """Per-partition metrics aggregate over the instrumented page stage.
    No run_id column: the table is written under lineage/run_id=<id>, so
    the id lives in the partition path (adding the column here only to
    drop it at the write site was dead threading)."""
    failures = F.size(F.filter(F.col("questions"), lambda q: ~q.ok))
    return paged.groupBy("part_id").agg(
        F.count("*").alias("input_pages"),
        F.sum((F.col("q_count") > 0).cast("long")).alias("marker_pages"),
        F.sum(F.coalesce(F.col("q_count"), F.lit(0)).cast("long")).alias(
            "q_candidates"
        ),
        F.sum(failures.cast("long")).alias("parse_failures"),
        F.round(F.sum("wall_ms"), 3).alias("wall_ms"),
    )


def require_supported_store(out_dir: str) -> None:
    """Capability check: raises iff no runfs control-plane implementation
    exists for the store's scheme (plain POSIX paths and file:// are
    built in; object-store schemes must be registered — see
    enem_spark/runfs.py for the six-primitive port contract). Until
    round 5 this was `require_local_store`, a blanket POSIX-only refusal:
    the protocol's control plane called `os` directly, so on s3:// every
    probe silently returned False and exactly-once degraded to
    re-extracting everything with no resume. The control plane now runs
    through `runfs.fs_for(out_dir)` everywhere, so the only thing left
    to check is that such an implementation exists."""
    runfs.require_supported_store(out_dir)


# backward-compat alias (docs/jobs referenced the old name)
require_local_store = require_supported_store


def _exists(path: str) -> bool:
    """True iff the dir holds COMMITTED parquet data Spark will read.
    Files under Spark's in-flight `_temporary` (or any other _-/.-prefixed)
    directories must not count: a crash mid-write leaves only those, and
    treating them as data makes the read-back throw UNABLE_TO_INFER_SCHEMA
    on every retry — wedging the exactly-once resume this module exists
    for. Spark's own readers skip _-/.-prefixed paths; mirror that.
    Runs on the store's runfs control plane (a recursive prefix listing),
    so URI-schemed stores probe correctly."""
    fs = runfs.fs_for(path)
    if not fs.exists(path):
        return False
    for rel in fs.list_files(path):
        parts = rel.split("/")
        if any(p.startswith(("_", ".")) for p in parts):
            continue
        f = parts[-1]
        if f.endswith(".parquet") or f.startswith("part-"):
            return True
    return False


def derive_replay_run_id(committed_ids, base_id: str) -> str:
    """``base_id`` if it was never committed, else ``base_idf{n:06d}`` —
    the deterministic replay-id scheme shared by icerun's recovery flow
    and the html stream's checkpoint-incarnation collisions. Reusing a
    COMMITTED id would overwrite that run's committed side outputs in
    place (the overwrite-dir protocol is for retrying CRASHED attempts
    only); the f-suffix sorts between the base and the next base id, and
    counting n from COMMITTED suffixed ids keeps a crashed attempt's
    retry on the same id (deterministic overwrite)."""
    if base_id not in committed_ids:
        return base_id
    n = 1 + sum(1 for i in committed_ids if i.startswith(f"{base_id}f"))
    return f"{base_id}f{n:06d}"


def clear_stale_run_dirs(out_dir: str, run_id: str, tables) -> None:
    """Delete ``<table>/run_id=<id>`` dirs a crashed prior attempt of the
    SAME id may have written but this attempt did not — the other half of
    the commit protocol beside :func:`append_run_marker`, single-sourced
    for the same reason (a per-site hand copy that misses a table makes a
    crashed attempt's orphan rows committed-visible). Call immediately
    BEFORE the marker append with the tables this attempt did NOT write."""
    fs = runfs.fs_for(out_dir)
    for table in tables:
        fs.delete_prefix(f"{out_dir}/{table}/run_id={run_id}")


RUNS_MARKER_SCHEMA = "run_id string, input_pages long, questions_written long"


def append_run_marker(
    spark: SparkSession,
    out_dir: str,
    run_id: str,
    input_pages: int = 0,
    questions_written: int = 0,
) -> None:
    """THE runs-table commit point — the single spelling of the marker row
    every exactly-once store in the engine appends LAST. One source of
    truth: a schema or semantics change that landed in one hand-copied
    site but not another would silently desync the commit protocol the
    whole design hangs on (review finding, round 3)."""
    spark.createDataFrame(
        [(run_id, int(input_pages), int(questions_written))],
        RUNS_MARKER_SCHEMA,
    ).write.mode("append").parquet(runfs.spark_path(f"{out_dir}/runs"))


def committed_run_ids(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = f"{out_dir}/runs"
    if not _exists(path):
        return None
    return spark.read.parquet(runfs.spark_path(path)).select("run_id").distinct()


def processed_doc_ids(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """doc_ids of documents completed by COMMITTED runs only.

    A run's side outputs live under run_id=<id> directories; the tiny
    ``runs`` marker row is appended last and is the commit point. A crash
    anywhere before it leaves orphan run_id directories that neither this
    resume check nor `committed_questions` will ever read, and a retried
    run with the same run_id overwrites them wholesale."""
    path = f"{out_dir}/processed_docs"
    committed = committed_run_ids(spark, out_dir)
    if committed is None or not _exists(path):
        return None
    return (
        spark.read.parquet(runfs.spark_path(path))
        .join(committed, "run_id", "left_semi")
        .select("doc_id")
        .distinct()
    )


def committed_questions(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Reader view of the questions table restricted to committed runs."""
    path = f"{out_dir}/questions"
    committed = committed_run_ids(spark, out_dir)
    if committed is None or not _exists(path):
        return None
    return spark.read.parquet(runfs.spark_path(path)).join(committed, "run_id", "left_semi")


def committed_images(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Reader view of the binary images table restricted to committed
    runs — the images analogue of :func:`committed_questions`. A crashed
    attempt's orphan ``images/run_id=`` dir (written, never committed,
    retried under a fresh run_id) would double-count every one of its
    images for any reader that globs the directory raw."""
    path = f"{out_dir}/images"
    committed = committed_run_ids(spark, out_dir)
    if committed is None or not _exists(path):
        return None
    return spark.read.parquet(runfs.spark_path(path)).join(committed, "run_id", "left_semi")


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    cfg: ExtractorConfig,
    out_dir: str,
    run_id: str,
) -> dict:
    """One checkpoint-resumable extraction run over a pages table.

    Exactly-once protocol: every side output is written to an
    ``<table>/run_id=<run_id>`` directory with mode=overwrite, so replaying
    a crashed run (same run_id — what foreachBatch retries do) is
    idempotent; the ``runs`` marker append is the commit point, and resume
    (`processed_doc_ids`) plus readers (`committed_questions`) only trust
    committed runs. run_id must be unique per logical unit of work —
    enforced here: a run_id that is ALREADY COMMITTED is re-derived to the
    deterministic replay scheme (`derive_replay_run_id`) instead of
    overwriting the committed run's outputs in place (re-running a CLI
    command over grown input previously destroyed the first run's rows);
    crashed attempts (uncommitted id) keep their id and overwrite, which
    is the retry protocol. The summary reports the EFFECTIVE run_id.

    Calling again over the same pages with a NEW run_id is a no-op: every
    document already committed is anti-joined away and nothing is written."""
    require_supported_store(out_dir)
    prior = committed_run_ids(spark, out_dir)
    if prior is not None:
        run_id = derive_replay_run_id(
            {r["run_id"] for r in prior.collect()}, run_id
        )
    if cfg.dedup_pages:
        # the batch entry point must honor the flag exactly like
        # extract_pages does — a duplicated re-crawl page otherwise doubles
        # its q_count in the numbering window and shifts every later
        # question's positional answer join
        from .extract import dedup_latest_per_url

        pages = dedup_latest_per_url(pages)
    meta = with_url_metadata(pages.filter(F.col("lang") == "pt"))
    valid, quarantined = split_quarantine(meta)
    pv = valid.filter((F.col("kind") == "PV") & (F.col("page_idx") >= 1))

    done = processed_doc_ids(spark, out_dir)
    if done is not None:
        # no broadcast hint: processed_docs grows without bound across runs;
        # AQE broadcasts while it is small, shuffles (skew-free key) after
        pv = pv.join(done, "doc_id", "left_anti")

    paged = instrumented_page_stage(pv, cfg).persist()
    try:
        n_pages = paged.count()
        n_questions = 0

        new_quarantine = quarantined.select("url", "year", "day", "kind", "color")
        committed = committed_run_ids(spark, out_dir)
        if committed is not None and _exists(f"{out_dir}/quarantine"):
            # dedup only against COMMITTED runs' quarantine rows: orphan
            # run_id dirs from crashed runs must not suppress a re-write
            # under the new run_id, or the orphan rows would stay invisible
            # to every committed-gated reader forever
            seen = (
                spark.read.parquet(runfs.spark_path(f"{out_dir}/quarantine"))
                .join(committed, "run_id", "left_semi")
                .select("url")
            )
            new_quarantine = new_quarantine.join(seen, "url", "left_anti")
        # persist: the count below AND the conditional write would otherwise
        # each re-run the quarantine anti-join's scan over the input table
        new_quarantine = new_quarantine.persist()
        n_quarantined = new_quarantine.count()

        if n_pages == 0 and n_quarantined == 0:
            # nothing to do — write nothing (an empty overwrite of a reused
            # run_id directory must not erase a previous run's output)
            return {
                "run_id": run_id,
                "input_pages": 0,
                "questions_written": 0,
                "quarantined": 0,
                "images_written": 0,
            }

        if n_pages:
            # cache=False: `paged` is already persisted above, so the salted
            # path's offsets join reads the cache without pinning a second
            # copy per run (foreachBatch calls this every micro-batch)
            # AUTO salt resolves against the PERSISTED page frame (cache
            # read, no UDF re-execution)
            chunk = resolve_salt_chunk(paged, cfg.salt_chunk_size)
            counted = with_page_numbering(
                paged.filter(F.col("q_count") > 0), chunk, cache=False,
                narrow_window=cfg.numbering_narrow,
            )
            # keys from ALL pages (no lang filter), matching
            # extract_questions: an answer-key page is mostly digit/letter
            # tables and a langid stage can plausibly tag it non-pt — the
            # lang guard is for exam-text noise, and filtering the key side
            # turned whole exams into MISSING_ANSWER on this path only
            keys = build_answer_keys(with_url_metadata(pages))
            questions = questions_from_counted(counted, keys, cfg).persist()
            # Count BEFORE the write: an all-pages-markerless run (pt PV
            # pages with no 'QUESTÃO' marker, or every parse failing) yields
            # zero questions, and an empty partitionBy write produces no
            # parquet files — reading the dir back would throw
            # UNABLE_TO_INFER_SCHEMA before the commit point, wedging resume
            # into retrying the same documents forever. Such documents are
            # DONE, not failed: skip the questions write but still record
            # processed_docs + the runs marker.
            n_questions = questions.count()
            if n_questions:
                questions.write.mode("overwrite").partitionBy(
                    "year", "day"
                ).parquet(
                    runfs.spark_path(f"{out_dir}/questions/run_id={run_id}")
                )
            questions.unpersist()

            partition_lineage(paged).write.mode("overwrite").parquet(
                runfs.spark_path(f"{out_dir}/lineage/run_id={run_id}")
            )

            paged.select("doc_id").distinct().write.mode("overwrite").parquet(
                runfs.spark_path(f"{out_dir}/processed_docs/run_id={run_id}")
            )

        n_images = 0
        if n_pages and cfg.process_images:
            # images mode (reference :269-334): the binary images table is
            # a side output under the SAME run protocol; restricted to this
            # run's documents so a resumed run never rewrites committed
            # images (the reference writes one PNG file per (page, index)
            # unconditionally — re-running would silently overwrite)
            from .extract import materialize_images

            # pv is already metadata-derived, quarantine-split, and
            # resume-anti-joined — no second full-input metadata pass,
            # and committed docs' pages never reach the image UDF
            imgs = materialize_images(pages, pv=pv).persist()
            n_images = imgs.count()
            if n_images:
                imgs.write.mode("overwrite").parquet(
                    runfs.spark_path(f"{out_dir}/images/run_id={run_id}")
                )
            imgs.unpersist()

        if n_quarantined:
            new_quarantine.write.mode("overwrite").parquet(
                runfs.spark_path(f"{out_dir}/quarantine/run_id={run_id}")
            )

        # Clear stale run_id dirs this ATTEMPT did not write: a crashed
        # prior attempt of the same run_id may have written them, and the
        # state of the world can differ on retry (e.g. its docs were
        # committed by another run meanwhile, so this attempt writes
        # nothing). Committing below without clearing would make the stale
        # rows visible as this run's output — the overwrite used to do this
        # implicitly, but an empty write writes no files.
        written = {
            "questions": n_pages > 0 and n_questions > 0,
            "lineage": n_pages > 0,
            "processed_docs": n_pages > 0,
            "quarantine": n_quarantined > 0,
            "images": n_pages > 0 and cfg.process_images and n_images > 0,
        }
        clear_stale_run_dirs(
            out_dir, run_id, [t for t, wrote in written.items() if not wrote]
        )

        # COMMIT POINT — everything above is invisible to resume/readers
        # until this tiny append lands. Quarantine-only runs commit too:
        # their rows must become visible to readers and to the dedup above.
        append_run_marker(spark, out_dir, run_id, n_pages, n_questions)
    finally:
        paged.unpersist()
        try:
            new_quarantine.unpersist()
        except NameError:
            pass
    return {
        "run_id": run_id,
        "input_pages": n_pages,
        "questions_written": n_questions,
        "quarantined": n_quarantined,
        "images_written": n_images,
    }


# ---------------------------------------------------------------------------
# HTML main-content extraction under the same exactly-once protocol
# ---------------------------------------------------------------------------

_ANCHOR_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("pos", T.IntegerType()),
            T.StructField("href", T.StringType()),
            T.StructField("anchor_text", T.StringType()),
        ]
    )
)

HTML_INSTRUMENTED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("main_text", T.StringType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("n_content_blocks", T.IntegerType()),
        T.StructField("main_chars", T.IntegerType()),
        T.StructField("anchors", _ANCHOR_STRUCT),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("wall_ms", T.DoubleType()),
    ]
)


def instrumented_html_stage(
    pages: DataFrame, with_anchors: bool = False
) -> DataFrame:
    """htmlops.extract_main_py (+ anchor_texts_py when ``with_anchors``)
    + metrics in ONE Arrow crossing — the web sibling of
    instrumented_page_stage (same per-row semantics as
    htmlops.extract_main_content / extract_anchor_texts, same shared pure
    functions). Carrying anchors as a nested array column (field names
    pinned to htmlops.ANCHORS_SCHEMA) means the anchors side table costs
    no second html decode; when the flag is off, the second parser pass is
    skipped entirely so the default hot path pays nothing for it."""
    from .htmlops import anchor_texts_py, extract_mains, main_frame

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else -1
        for pdf in batches:
            t0 = time.perf_counter()
            out = main_frame(pdf["doc_id"], pdf["url"], extract_mains(pdf["html"]))
            if with_anchors:
                out["anchors"] = [
                    [
                        {"pos": pos, "href": href, "anchor_text": text}
                        for pos, (href, text) in enumerate(
                            anchor_texts_py(
                                # replace, not strict — same crash-safety
                                # rule as htmlops.extract_mains
                                p.decode("utf-8", "replace")
                                if p is not None
                                else ""
                            )
                        )
                    ]
                    for p in pdf["html"]
                ]
            else:
                out["anchors"] = [[] for _ in range(len(pdf))]
            ms = (time.perf_counter() - t0) * 1000.0
            out["part_id"] = part_id
            out["wall_ms"] = ms / max(len(pdf), 1)
            yield out

    return pages.select("doc_id", "url", "html").mapInPandas(
        run, HTML_INSTRUMENTED_SCHEMA
    )


def committed_main_content(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Reader view of the main_content table restricted to committed runs."""
    path = f"{out_dir}/main_content"
    committed = committed_run_ids(spark, out_dir)
    if committed is None or not _exists(path):
        return None
    return spark.read.parquet(runfs.spark_path(path)).join(committed, "run_id", "left_semi")


def committed_anchors(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Reader view of the anchors table restricted to committed runs."""
    path = f"{out_dir}/anchors"
    committed = committed_run_ids(spark, out_dir)
    if committed is None or not _exists(path):
        return None
    return spark.read.parquet(runfs.spark_path(path)).join(committed, "run_id", "left_semi")


def run_html_extraction(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    run_id: str,
    with_anchors: bool = False,
    fetch_log: DataFrame | None = None,
) -> dict:
    """One checkpoint-resumable DOM-extraction run over a CC pages table
    (doc_id, url, html binary, ...) — the north rule's web-page pipeline
    under the SAME exactly-once protocol as run_extraction: side outputs to
    ``<table>/run_id=<id>`` overwrite dirs, stale dirs cleared for tables
    this attempt did not write, and the tiny ``runs`` marker appended LAST
    as the commit point. The unit of work is the document (one page row),
    so resume anti-joins committed doc_ids and a rerun is a no-op.

    Tables: main_content/ lineage/ processed_docs/ runs (+ anchors/ when
    ``with_anchors``: the per-anchor link-text table, exploded from the
    same single Arrow crossing) — a directory can host EITHER an ENEM run
    tree or an html run tree, not both (they share processed_docs/runs
    semantics but different payload tables).

    with_anchors is NOT retroactive: resume skips every committed doc
    regardless of which flag its run used, so flipping the flag on over an
    out_dir with committed anchor-less runs yields an anchors table that
    covers only the docs processed from then on (the returned summary's
    `anchors_backfill_needed` flags this). Backfilling means a fresh
    out_dir or an explicit re-run of the old inputs there.

    ``fetch_log`` is the streaming path's event-time serving anchor: a
    (url, warc_ts, doc_id) frame of THIS run's fetches, written for EVERY
    unit — including ones whose content was already extracted — and
    committed even when the extraction itself no-ops (a marker-only run).
    Without it, a url whose content re-arrives or REVERTS never advances
    its latest-fetch pointer, and the serving view's run-recency fallback
    mis-ranks replay-suffixed run ids (stream batch ids are NOT monotonic
    across checkpoint incarnations — warc_ts is, which is why the stream
    log carries it while icerun's snapshot-sequenced log does not need
    to).

    Same committed-id guard as run_extraction: an already-COMMITTED
    run_id re-derives to the replay scheme instead of overwriting that
    run's outputs (callers that pre-derive — the html stream, icerun —
    always pass an uncommitted id, so the guard is an identity for them
    and their pre-written fetch_log dirs keep their names)."""
    require_supported_store(out_dir)
    prior = committed_run_ids(spark, out_dir)
    if prior is not None:
        run_id = derive_replay_run_id(
            {r["run_id"] for r in prior.collect()}, run_id
        )
    work = pages.select("doc_id", "url", "html")
    done = processed_doc_ids(spark, out_dir)
    # definitely-missing detection: prior committed runs exist and the
    # anchors table does not -> those docs will never appear in it
    backfill_needed = bool(
        with_anchors and done is not None and not _exists(f"{out_dir}/anchors")
    )
    if done is not None:
        # unbounded across runs -> no broadcast hint; AQE handles small case
        work = work.join(done, "doc_id", "left_anti")

    extracted = instrumented_html_stage(work, with_anchors=with_anchors).persist()
    try:
        n_pages = extracted.count()
        if fetch_log is not None:
            fetch_log.select("url", "warc_ts", "doc_id").write.mode(
                "overwrite"
            ).parquet(
                runfs.spark_path(f"{out_dir}/fetch_log/run_id={run_id}")
            )
        if n_pages == 0:
            if fetch_log is None:
                # nothing to do — write nothing (an empty overwrite of a
                # reused run_id dir must not erase a previous attempt's
                # output)
                return {
                    "run_id": run_id,
                    "input_pages": 0,
                    "main_rows": 0,
                    "anchors_backfill_needed": backfill_needed,
                }
            # marker-only commit: the fetch_log above must become visible
            # (the revert/re-arrival case extracts nothing but still moves
            # the url's latest-fetch pointer). Committing makes THIS
            # run_id's dirs visible, so clear stale orphans a crashed
            # prior attempt of an abandoned incarnation may have left for
            # tables this attempt did not write.
            clear_stale_run_dirs(
                out_dir, run_id,
                ("main_content", "anchors", "lineage", "processed_docs"),
            )
            append_run_marker(spark, out_dir, run_id)
            return {
                "run_id": run_id,
                "input_pages": 0,
                "main_rows": 0,
                "anchors_backfill_needed": backfill_needed,
            }

        body = extracted.drop("part_id", "wall_ms", "anchors")
        body.write.mode("overwrite").parquet(
            runfs.spark_path(f"{out_dir}/main_content/run_id={run_id}")
        )
        if with_anchors:
            (
                extracted.select(
                    "doc_id", "url", F.explode_outer("anchors").alias("a")
                )
                .filter(F.col("a").isNotNull())
                .select("doc_id", "url", "a.pos", "a.href", "a.anchor_text")
                .write.mode("overwrite")
                .parquet(
                    runfs.spark_path(f"{out_dir}/anchors/run_id={run_id}")
                )
            )
        (
            extracted.groupBy("part_id")
            .agg(
                F.count("*").alias("input_pages"),
                F.sum((F.col("main_chars") > 0).cast("long")).alias(
                    "nonempty_main"
                ),
                F.sum(F.col("n_blocks").cast("long")).alias("total_blocks"),
                F.sum(F.col("n_content_blocks").cast("long")).alias(
                    "content_blocks"
                ),
                F.round(F.sum("wall_ms"), 3).alias("wall_ms"),
            )
            .write.mode("overwrite")
            .parquet(runfs.spark_path(f"{out_dir}/lineage/run_id={run_id}"))
        )
        extracted.select("doc_id").distinct().write.mode("overwrite").parquet(
            runfs.spark_path(f"{out_dir}/processed_docs/run_id={run_id}")
        )

        # n_pages > 0 here, so this attempt wrote every unconditional table
        # wholesale (overwrite dirs — no stale rows can survive). The ONE
        # conditional table this function owns is anchors: a crashed prior
        # attempt of this run_id may have written it while THIS attempt
        # runs with with_anchors=False; committing without clearing would
        # make those stale rows visible (the CLAUDE.md stale-dir
        # invariant). fetch_log is deliberately NOT cleared when the param
        # is None — icerun writes fetch_log/run_id=<id> ITSELF before
        # delegating here, and clearing it would destroy that same
        # attempt's log (its callers never flip the flag between attempts
        # of one run id).
        if not with_anchors:
            clear_stale_run_dirs(out_dir, run_id, ("anchors",))

        # COMMIT POINT
        append_run_marker(spark, out_dir, run_id, n_pages, n_pages)
    finally:
        extracted.unpersist()
    return {
        "run_id": run_id,
        "input_pages": n_pages,
        "main_rows": n_pages,
        "anchors_backfill_needed": backfill_needed,
    }
