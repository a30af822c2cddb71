"""End-to-end curation job: audit completeness, reason precedence,
determinism across reruns, CLI surface."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from jobs.curate_job import curate

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


def test_audit_covers_every_input_exactly_once(spark, docs):
    curated, audit = curate(docs, near_dedup=True)
    a = audit.persist()
    n_in = docs.count()
    assert a.count() == n_in
    assert a.select("doc_id").distinct().count() == n_in
    # curated == audit's keep slice, with split attached
    kept = a.filter(F.col("keep"))
    assert curated.count() == kept.count()
    # reasons come from the declared vocabulary; kept rows are 'ok'
    reasons = {r.reason for r in a.select("reason").distinct().collect()}
    assert reasons <= {"ok", "dup", "lang", "short", "low_quality", "near_dup"}
    assert {r.reason for r in kept.select("reason").distinct().collect()} == {"ok"}
    # dropped rows carry no split; kept rows carry a valid band
    assert a.filter(~F.col("keep") & F.col("split").isNotNull()).count() == 0
    bands = {r.split for r in kept.select("split").distinct().collect()}
    assert bands <= {"train", "val", "test"}
    a.unpersist()


def test_decontamination_stage_drops_flagged(spark, docs):
    # benchmark = one kept document's text => that doc must flip to
    # 'contaminated' (an 8-gram overlaps itself) while others keep status
    _, base_audit = curate(docs, near_dedup=False)
    victim = (
        docs.join(base_audit.filter(F.col("keep")).select("doc_id"), "doc_id")
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    bench = docs.sparkSession.createDataFrame(
        [(0, victim.text)], ["doc_id", "text"]
    )
    _, audit = curate(docs, near_dedup=False, benchmark=bench)
    got = {r.doc_id: r.reason for r in audit.collect()}
    assert got[victim.doc_id] == "contaminated"


def test_rerun_is_deterministic(spark, docs):
    _, a1 = curate(docs, near_dedup=True)
    _, a2 = curate(docs, near_dedup=True)
    r1 = sorted(map(tuple, a1.collect()))
    r2 = sorted(map(tuple, a2.collect()))
    assert r1 == r2


def test_cli_end_to_end(tmp_path):
    out = tmp_path / "out"
    res = subprocess.run(
        [
            sys.executable,
            "jobs/curate_job.py",
            "--input",
            f"{SF_DIR}/documents.parquet",
            "--output",
            str(out),
            "--near-dedup",
            "--normalize",
            "--export-shards",
            "3",
            "--cores",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["input"] == sum(summary["reasons"].values())
    assert summary["kept"] == summary["reasons"].get("ok", 0)
    assert summary["kept"] == sum(summary["splits"].values())
    assert (out / "curated").exists() and (out / "audit").exists()
    # the last-mile export: train split as manifested JSONL shards
    assert summary["export"]["n_docs"] == summary["splits"].get("train", 0)
    shard_files = sorted(
        f for f in (out / "shards").iterdir() if f.name.startswith("shard-")
    )
    assert (out / "shards" / "_MANIFEST.json").exists()
    n_lines = sum(
        len(f.read_text(encoding="utf-8").splitlines()) for f in shard_files
    )
    assert n_lines == summary["export"]["n_docs"]


def test_c4_and_mojibake_stages(spark, docs):
    """--c4 drops brace/lorem pages with reason 'c4' BEFORE dedup; mojibake
    planting + repair reproduces the clean-corpus audit byte-for-byte."""
    from enem_spark import textops

    # the raw corpus has NO terminal punctuation, so C4's three-sentence
    # page rule correctly fails every doc — append a sentence block so the
    # baseline passes, then plant one page-level violation (a brace line)
    # on every doc_id%10==0
    sentences = (
        "\nFirst full sentence goes right here. "
        "Second full sentence goes right here. "
        "Third full sentence goes right here."
    )
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(sentences),
            F.when(
                F.col("doc_id") % 10 == 0, F.lit("\nvar x = { a: 1 };")
            ).otherwise(F.lit("")),
        ),
    )
    _, audit = curate(planted, near_dedup=False, c4=True)
    a = audit.persist()
    braced = a.filter(F.col("doc_id") % 10 == 0)
    # every braced doc that survived the base rules is dropped with 'c4'
    assert braced.filter(F.col("reason") == "c4").count() > 0
    assert braced.filter(F.col("keep")).count() == 0
    # non-braced docs never get the c4 reason (the sentence block satisfies
    # the page rules; they pass or fail on the base rules only)
    assert a.filter(
        (F.col("doc_id") % 10 != 0) & (F.col("reason") == "c4")
    ).count() == 0
    a.unpersist()

    # mojibake: plant double-encoding, repair, expect the clean-corpus audit
    moji = textops.plant_mojibake(docs.select("doc_id", "text")).join(
        docs.drop("text"), "doc_id"
    )
    _, audit_clean = curate(docs, near_dedup=False)
    _, audit_moji = curate(moji, near_dedup=False, mojibake=True)
    clean = {(r.doc_id, r.keep, r.reason) for r in audit_clean.collect()}
    repaired = {(r.doc_id, r.keep, r.reason) for r in audit_moji.collect()}
    # the repair does not reproduce the PRISTINE text (the planted marker
    # prefix survives, correctly — it decodes fine), but keep/reason flips
    # must come only from the marker words, so quality-rule agreement is
    # near-total; assert the decision sets differ in < 5% of docs
    diff = clean ^ repaired
    assert len(diff) < max(2, len(clean) // 10), sorted(diff)[:6]
