"""Persisted MinHash signature index, maintained exactly-once.

`textops.incremental_minhash_dedup` promises that "at scale the existing
band table is a materialized store ... the whole pass touches the existing
corpus's raw text zero times". This module is that store: a `minhash_sigs`
side table living under an extraction ``out_dir`` and governed by the SAME
run protocol as every other lineage table (CLAUDE.md exactly-once
invariant) —

  * each index-maintenance run writes its signature rows to
    ``minhash_sigs/run_id=<id>`` with overwrite, then appends the tiny
    ``runs`` marker LAST (the commit point);
  * readers (`committed_signatures`, `probe_near_dups`) trust only
    committed runs, so a crashed attempt's directory is invisible;
  * a retry derives the same next run id from COMMITTED ids only and
    overwrites the orphan.

Steady state at 10^12 docs: each crawl snapshot's extraction run commits
its main content, `update_signature_index` signs ONLY the docs not yet in
the committed index (anti-join on doc_id — the index is append-only because
doc_id is content-addressed: changed content is a new unit, never a
mutation), and `probe_near_dups` LSH-joins a new increment against the
stored band table. The existing corpus's text is re-read zero times, and
the probe's candidate join is new×existing only — never existing×existing.

The (perms, bands) config is part of every sig run id
(``sig{P}x{B}_{n:06d}``): mixing configs in one index would silently
corrupt probes (band boundaries shift), so every entry point validates the
requested config against all committed sig runs and raises on mismatch.

Storage: one row per doc with the full md5-hex signature columns
(mh0..mh{P-1}); md5 is kept whole because the DuckDB parity twins must be
bit-identical (engine invariant). A production deployment would truncate
to 16 hex chars per component and bucket the derived band table by
(band, sig) so probes are co-located joins; both are representation
choices under this exact protocol.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import lineage, runfs, textops

SIG_TABLE = "minhash_sigs"
_RUN_RE = re.compile(r"^sig(\d+)x(\d+)_(\d{6,})$")  # {6,}: :06d PADS, never
# truncates — run 1,000,000 formats as 7 digits, and a {6} anchor would hide
# it from the committed list, re-deriving (and overwriting) the same run_id


def sig_run_id(perms: int, bands: int, n: int) -> str:
    return f"sig{perms}x{bands}_{n:06d}"


def _committed_sig_runs(
    spark: SparkSession,
    out_dir: str,
    committed: DataFrame | None = None,
) -> list[tuple[int, int, int]]:
    """(perms, bands, n) per COMMITTED sig run. The runs table is one tiny
    row per run — collecting it is driver-side metadata work, same class as
    icerun.last_extracted_sequence. Pass ``committed`` (the
    committed_run_ids frame) when the caller already read it — the table
    is tiny, but one metadata scan per call beats three."""
    if committed is None:
        committed = lineage.committed_run_ids(spark, out_dir)
    if committed is None:
        return []
    out = []
    for r in committed.collect():
        m = _RUN_RE.match(r.run_id)
        if m:
            out.append((int(m.group(1)), int(m.group(2)), int(m.group(3))))
    return out


def _check_config(
    runs: list[tuple[int, int, int]], perms: int, bands: int
) -> None:
    bad = sorted({(p, b) for p, b, _ in runs if (p, b) != (perms, bands)})
    if bad:
        raise ValueError(
            f"signature index holds config(s) {bad}, requested "
            f"({perms}, {bands}) — one index, one config; use a fresh "
            "out_dir to re-sign under a new config"
        )


def committed_signatures(
    spark: SparkSession,
    out_dir: str,
    perms: int = textops.MINHASH_PERMS,
    bands: int = textops.LSH_BANDS,
    committed: DataFrame | None = None,
) -> DataFrame | None:
    """Reader view of the signature store restricted to committed runs:
    (doc_id, mh0..mh{perms-1}), or None when no committed sig run exists.
    Pass ``committed`` (the committed_run_ids frame) when the caller
    already read it — one runs-table scan per maintenance step, not three."""
    if committed is None:
        committed = lineage.committed_run_ids(spark, out_dir)
    runs = _committed_sig_runs(spark, out_dir, committed)
    _check_config(runs, perms, bands)
    path = f"{out_dir}/{SIG_TABLE}"
    fs = runfs.fs_for(out_dir)
    if not runs or not fs.exists(path):
        return None
    # read EXACTLY the committed run dirs, never the whole table dir: a
    # crashed first attempt under a DIFFERENT (perms, bands) config leaves
    # an orphan run dir _check_config cannot see (it validates committed
    # runs only), and a bare directory read would let schema inference
    # resolve that orphan's narrower/wider mh column set — an
    # AnalysisException on mh{perms-1}, or silently null-padded signatures
    run_ids = {r.run_id for r in committed.select("run_id").collect()}
    paths = [
        runfs.spark_path(f"{path}/{d}")
        for d in fs.list_names(path)
        if d.startswith("run_id=") and d.split("=", 1)[1] in run_ids
    ]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def update_signature_index(
    spark: SparkSession,
    out_dir: str,
    source: DataFrame | None = None,
    perms: int = textops.MINHASH_PERMS,
    bands: int = textops.LSH_BANDS,
) -> dict:
    """One exactly-once index-maintenance run: sign every source doc absent
    from the committed index and commit the batch. ``source`` is any
    (doc_id, text) frame; it defaults to the out_dir's own committed main
    content (`lineage.committed_main_content`), which makes this the
    post-extraction maintenance step of an icetable tail run:

        icerun.run_html_extraction_ice(spark, table, out)   # extract delta
        sigindex.update_signature_index(spark, out)          # sign delta

    Returns {"indexed": n, "run_id": id, "up_to_date": bool}. Empty deltas
    write nothing and commit nothing (an empty overwrite of a reused run_id
    dir must not erase a previous attempt's output — lineage invariant);
    there is no watermark to advance here because the anti-join IS the
    resume cursor."""
    committed = lineage.committed_run_ids(spark, out_dir)
    runs = _committed_sig_runs(spark, out_dir, committed)
    _check_config(runs, perms, bands)
    if source is None:
        main = lineage.committed_main_content(spark, out_dir)
        if main is None:
            return {"indexed": 0, "run_id": None, "up_to_date": True}
        source = main.select("doc_id", F.col("main_text").alias("text"))
    docs = source.select("doc_id", "text")
    existing = committed_signatures(spark, out_dir, perms, bands, committed)
    if existing is not None:
        # unbounded across runs -> no broadcast hint; AQE handles small case
        docs = docs.join(existing.select("doc_id"), "doc_id", "left_anti")
    run_id = sig_run_id(perms, bands, max((n for _, _, n in runs), default=0) + 1)
    sigs = textops.minhash_signatures(docs, None, perms).persist()
    try:
        n = sigs.count()
        if n == 0:
            return {"indexed": 0, "run_id": run_id, "up_to_date": True}
        sigs.write.mode("overwrite").parquet(
            runfs.spark_path(f"{out_dir}/{SIG_TABLE}/run_id={run_id}")
        )
        # COMMIT POINT
        lineage.append_run_marker(spark, out_dir, run_id, n)
    finally:
        sigs.unpersist()
    return {"indexed": n, "run_id": run_id, "up_to_date": False}


def probe_near_dups(
    spark: SparkSession,
    out_dir: str,
    new_docs: DataFrame,
    threshold: float = 0.5,
    perms: int = textops.MINHASH_PERMS,
    bands: int = textops.LSH_BANDS,
    persist_to: list | None = None,
) -> DataFrame:
    """Near-dup estimate of a new increment against the COMMITTED store —
    semantically identical to textops.incremental_minhash_dedup(new,
    existing) (shared `_estimate_new_vs_existing`), but the existing side
    is the persisted signature table: no shingling, no signature
    recomputation, no read of the existing corpus's text at all.

    Output: (doc_id, dup_of, est_jaccard) with est_jaccard >= threshold."""
    from pyspark import StorageLevel

    sig_ex = committed_signatures(spark, out_dir, perms, bands)
    if sig_ex is None:
        raise ValueError(f"no committed signature index under {out_dir}")
    # always persisted: the estimator reads sig_new twice (band table +
    # agreement join) and the zero-shuffle signature build has no exchange
    # for ReuseExchange to dedupe — unpersisted, the whole shingle+md5
    # chain would run twice from storage. Callers that pass persist_to own
    # the lifetime (unpersist after consuming); otherwise the
    # ContextCleaner reclaims the blocks when the plan is dropped (the
    # increment is small by definition).
    sig_new = textops.minhash_signatures(new_docs, None, perms).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if persist_to is not None:
        persist_to.append(sig_new)
    return textops._estimate_new_vs_existing(
        sig_new, sig_ex, threshold, perms, bands
    )
