"""Shard export: byte-determinism across re-runs, manifest-order
agreement with shuffle_export, JSONL round trip, commit marker."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from enem_spark import textops
from enem_spark.export import export_jsonl_shards
from enem_spark.sources import jsonl

SF_DIR = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )


def _read_bytes(d):
    return {
        f: open(os.path.join(d, f), "rb").read()
        for f in sorted(os.listdir(d))
        if f.startswith("shard-")
    }


def test_export_is_byte_deterministic_and_round_trips(spark, docs, tmp_path):
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    s1 = export_jsonl_shards(docs, out1, n_shards=4, seed=7)
    s2 = export_jsonl_shards(docs, out2, n_shards=4, seed=7)
    assert s1["n_docs"] == docs.count()
    assert _read_bytes(out1) == _read_bytes(out2)  # re-run == identical bytes
    assert os.path.exists(os.path.join(out1, "_MANIFEST.json"))
    man = json.load(open(os.path.join(out1, "_MANIFEST.json")))
    assert man["files"] == sorted(_read_bytes(out1))

    # every document exactly once, in the manifest's order per shard
    lines = []
    for f, b in sorted(_read_bytes(out1).items()):
        shard = int(f[len("shard-"):len("shard-") + 5])
        for i, ln in enumerate(b.decode("utf-8").splitlines()):
            lines.append((shard, i + 1, json.loads(ln)["doc_id"]))
    expect = {
        (r["shard"], r["pos"], r["doc_id"])
        for r in textops.shuffle_export(docs, 4, 7)
        .select("shard", "pos", "doc_id")
        .collect()
    }
    assert set(lines) == expect and len(lines) == s1["n_docs"]

    # a different seed produces a different order (the shuffle is real)
    out3 = str(tmp_path / "c")
    export_jsonl_shards(docs, out3, n_shards=4, seed=8)
    assert _read_bytes(out3) != _read_bytes(out1)


def test_reexport_with_fewer_shards_drops_stale_files(spark, docs, tmp_path):
    """ADVICE r2 (low): re-exporting into the same dir with a different
    n_shards must not manifest (or leave behind) the prior layout's shard
    files — readers trusting the manifest would double-read documents."""
    out = str(tmp_path / "a")
    export_jsonl_shards(docs, out, n_shards=8, seed=7)
    s2 = export_jsonl_shards(docs, out, n_shards=3, seed=7)
    on_disk = sorted(_read_bytes(out))
    assert on_disk == [f"shard-{i:05d}.jsonl" for i in range(3)]
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["files"] == on_disk and man["n_shards"] == 3
    # every doc exactly once across the manifested files
    n_lines = sum(
        len(b.decode("utf-8").splitlines()) for b in _read_bytes(out).values()
    )
    assert n_lines == s2["n_docs"] == docs.count()


def test_export_cli_and_jsonl_readback(spark, docs, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    docs.write.parquet(src)
    p = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "export_job.py"),
            "--input", src, "--output", out, "--shards", "3",
            "--cores", "2",
        ],
        capture_output=True, text=True, check=True,
    )
    summary = json.loads(p.stdout.strip().splitlines()[-1])
    assert summary["n_docs"] == docs.count()
    # the export is readable by the repo's own jsonl source (quarantine
    # clean: zero corrupt rows) — schema here carries the export columns
    back = (
        spark.read.schema("doc_id long, text string, lang string, source string")
        .json(out + "/shard-*.jsonl")
    )
    assert back.count() == docs.count()
    assert back.filter(F.col("text").isNull()).count() == 0
