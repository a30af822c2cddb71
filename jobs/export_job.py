"""Training-shard export job — the pipeline's last-mile CLI.

spark-submit-shaped: read a curated documents parquet (any schema with a
doc_id column; curate_job's keep-list output is the intended input),
shuffle it deterministically (seed-keyed order, hash-uniform shards —
textops.shuffle_export), and write byte-deterministic JSONL shards +
a _MANIFEST.json commit marker (enem_spark/export.py). Re-runs and task
retries write identical bytes, so the export is idempotent end to end.

  python jobs/export_job.py --input /path/docs_parquet --output /path/shards \
      [--shards 8] [--seed 7] [--cores N]

Emits ONE JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="shard output dir")
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cores", default=None)
    args = ap.parse_args()

    from enem_spark.export import export_jsonl_shards
    from enem_spark.session import get_spark

    spark = get_spark("enem_spark_export", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(args.input)
    summary = export_jsonl_shards(
        docs, args.output, n_shards=args.shards, seed=args.seed
    )
    print(json.dumps({"input": args.input, "output": args.output, **summary}))


if __name__ == "__main__":
    main()
