#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": <docs_per_sec>, "unit": "docs/sec",
   "queries": {...per-query sec...}, "sf": 0.1, ...}

The primary value is extraction throughput in documents(pages)/sec over the
Common-Crawl-style pages table synthesized from the documents table (the
reference's anchor: ~5.8 exam-PDFs/sec ~= 87 pages/sec on one core,
benchmarks.md:11).

Scaling mode (BASELINE north_rule: >=0.8 efficiency from N to 4N executors):

  python bench.py --scaling        # spawns subprocess runs at local[8] and
                                   # local[32] on the same input, writes BENCH.md

Subprocess isolation is required because one JVM cannot switch local[N].
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([\d.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


HEADLINE = [
    "extract_questions",
    "tpch_q1_like",
    "route_case",
    "lookup_join",
    "running_window",
    "ordered_concat",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "simhash",
    "langid",
    "quality_score",
    "token_count",
    "fingerprint",
    "ann_cosine_topk",
    "ann_srp_bucket",
    "embedding_near_dup",
    "media_featurize",
]


def _pages_store(spark, sf_dir: str) -> tuple[str, int]:
    """Materialize the CC-style pages table to parquet once per sf (cached
    across bench runs). Extraction is timed over this STORED table — the
    honest scenario (scan -> extract), not re-synthesizing pages inline."""
    import tempfile

    from enem_spark.sources.documents_bridge import pages_from_documents

    sf = _sf_from_dir(sf_dir)
    store = os.path.join(tempfile.gettempdir(), f"enem_pages_sf{sf}")
    marker = os.path.join(store, "_SUCCESS")
    if not os.path.exists(marker):
        documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pages_from_documents(documents).write.mode("overwrite").parquet(store)
    n_pages = spark.read.parquet(store).count()
    return store, n_pages


def run_bench(sf_dir: str, cpus: str, extract_only: bool = False) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from enem_spark.extract import ExtractorConfig, extract_questions
    from enem_spark.session import get_spark

    spark = get_spark("enem_spark_bench", cores=cpus)
    qmap = entry_mod.queries()

    # --- extraction throughput (the BASELINE metric) ---
    store, n_pages = _pages_store(spark, sf_dir)
    pages = spark.read.parquet(store)
    cfg = ExtractorConfig(output_type="json")
    # warm the Python workers + broadcast machinery once (worker fork/import
    # cost is a per-executor constant, not part of steady-state throughput —
    # mirrors the reference's avg-of-3 methodology, benchmarks.md:5)
    extract_questions(pages.limit(256), cfg).count()
    runs = []
    n_questions = 0
    for _ in range(3):
        t0 = time.perf_counter()
        n_questions = extract_questions(pages, cfg).count()
        runs.append(time.perf_counter() - t0)
    extract_sec = sum(runs) / len(runs)
    docs_per_sec = n_pages / extract_sec

    timings: dict[str, float] = {"extract_questions": round(extract_sec, 3)}
    if not extract_only:
        for name in HEADLINE[1:]:
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 3)

    return {
        "metric": "documents/sec extraction throughput (CC-style pages table)",
        "value": round(docs_per_sec, 2),
        "unit": "docs/sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
        "cpus": cpus,
        "n_pages": n_pages,
        "n_questions": n_questions,
        "total_query_sec": round(sum(timings.values()), 3),
    }


def run_scaling(sf_dir: str, low: int = 8, high: int = 32) -> dict:
    """Same extraction job at two parallelism levels on the same input —
    the sandbox evidence for the two-cluster-size scaling criterion."""
    results = {}
    for cpus in (low, high):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--extract-only"],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    eff = (results[high]["value"] / results[low]["value"]) / (high / low)
    summary = {
        "low_cpus": low,
        "high_cpus": high,
        "docs_per_sec_low": results[low]["value"],
        "docs_per_sec_high": results[high]["value"],
        "scaling_efficiency": round(eff, 3),
        "sf": results[low]["sf"],
        "n_pages": results[low]["n_pages"],
    }
    return summary


def write_bench_md(summary: dict, path: str = "BENCH.md") -> None:
    md = f"""# BENCH — measured throughput & scaling evidence

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. No real cluster exists in this sandbox, so the same extraction
job runs at two local parallelism levels on the same input
(local[{summary['low_cpus']}] vs local[{summary['high_cpus']}]).

| config | docs/sec (pages) |
|---|---|
| local[{summary['low_cpus']}] | {summary['docs_per_sec_low']} |
| local[{summary['high_cpus']}] | {summary['docs_per_sec_high']} |

scaling efficiency = (docs_per_sec_{summary['high_cpus']} / docs_per_sec_{summary['low_cpus']}) / {summary['high_cpus'] // summary['low_cpus']}
                   = **{summary['scaling_efficiency']}**

Input: pages synthesized from sf={summary['sf']} documents table
({summary['n_pages']} pages). Reference single-core anchor: ~5.8 exam-PDFs/s
(~87 pages/s) per benchmarks.md:11.
"""
    with open(path, "w") as f:
        f.write(md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--extract-only", action="store_true")
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    if args.scaling:
        summary = run_scaling(sf_dir, args.low, args.high)
        write_bench_md(summary)
        print(json.dumps(summary))
        return
    print(json.dumps(run_bench(sf_dir, cpus, extract_only=args.extract_only)))


if __name__ == "__main__":
    main()
