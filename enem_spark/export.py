"""Training-shard export: curated corpus -> byte-deterministic JSONL
shards in decorrelated (seed-shuffled) order — the pipeline's last mile
(curate_job output in, trainer-readable shards out).

Write discipline at scale:
  * the ONE shuffle is textops.shuffle_export's (hash-uniform shard key);
    each output shard is then rendered and written from the executors —
    the driver never sees document bytes;
  * every byte is a pure function of (rows, seed, n_shards): lines are
    jsonl.encode_line (sorted keys, canonical separators) in (pos) order,
    so a re-run, a task retry, or a speculative duplicate writes the
    IDENTICAL file — the atomic temp+rename makes concurrent writers of
    the same shard harmless (last rename wins with the same bytes), which
    is what makes executor-side file writes safe without a commit
    coordinator. out_dir must be shared storage at cluster scale (object
    store / NFS; in local mode, the local disk IS shared);
  * the ``_MANIFEST.json`` marker lands AFTER the Spark action completes
    (the lineage commit-last discipline): readers trust only manifested
    exports, so a crashed run leaves invisible partials that the re-run
    overwrites byte-identically."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

from .sources.jsonl import encode_line
from .textops import SHUFFLE_SEED, SHUFFLE_SHARDS, shuffle_export


def _jsonable(v):
    """JSON-writable form of a row value: timestamps as isoformat, binary
    as hex (both deterministic); everything else passes through."""
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def export_jsonl_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = SHUFFLE_SHARDS,
    seed: int = SHUFFLE_SEED,
) -> dict:
    """Write ``docs`` (any schema with doc_id; all columns exported) as
    ``n_shards`` JSONL files ``shard-%05d.jsonl`` under ``out_dir`` in
    seed-shuffled order. Returns {n_docs, n_shards, files}."""
    os.makedirs(out_dir, exist_ok=True)
    man = shuffle_export(docs, n_shards, seed)
    cols = [c for c in man.columns if c not in ("shard", "pos")]
    arranged = man.repartition(n_shards, "shard").sortWithinPartitions(
        "shard", "pos"
    )

    def write_partition(rows) -> None:
        # a hash partition can carry SEVERAL shards (repartition(n, key)
        # is hash-mod, not identity) — rows arrive sorted (shard, pos),
        # so cut files at shard boundaries
        cur_shard = None
        fh = None
        tmp = None

        def close():
            nonlocal fh, tmp
            if fh is not None:
                fh.close()
                final = os.path.join(
                    out_dir, f"shard-{cur_shard:05d}.jsonl"
                )
                os.replace(tmp, final)  # atomic; identical bytes on retry
                fh = None

        for r in rows:
            if r["shard"] != cur_shard:
                close()
                cur_shard = r["shard"]
                tmp = os.path.join(
                    out_dir, f".shard-{cur_shard:05d}.jsonl.tmp{os.getpid()}"
                )
                fh = open(tmp, "w", encoding="utf-8", newline="")
            fh.write(
                encode_line({c: _jsonable(r[c]) for c in cols}) + "\n"
            )
        close()

    arranged.foreachPartition(write_partition)
    n_docs = docs.count()
    # ADVICE r2: re-exporting into the same dir with a different
    # (n_shards, seed) must not manifest stale shard files from the prior
    # layout — readers that trust the manifest would double-read docs.
    # Only names this export could have written are manifestable.
    expected = {f"shard-{i:05d}.jsonl" for i in range(n_shards)}
    files = sorted(
        f
        for f in os.listdir(out_dir)
        if f.startswith("shard-") and f in expected
    )
    # COMMIT POINT — readers trust only manifested exports
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as mf:
        json.dump(
            {
                "n_docs": n_docs,
                "n_shards": n_shards,
                "seed": seed,
                "columns": cols,
                "files": files,
            },
            mf,
            indent=1,
        )
    # stale-layout cleanup AFTER the commit point: a crash between a
    # pre-manifest delete and the manifest write would leave the PRIOR
    # committed manifest referencing files that no longer exist; deleting
    # after, a crash merely leaves unreferenced leftovers that the next
    # export (or this sweep on rerun) removes
    for f in os.listdir(out_dir):
        if f.startswith("shard-") and f not in expected:
            os.remove(os.path.join(out_dir, f))
    return {"n_docs": n_docs, "n_shards": n_shards, "files": files}
