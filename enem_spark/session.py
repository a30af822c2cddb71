"""SparkSession factory with scale-oriented defaults.

Local-mode testing stands in for a multi-executor cluster; the configs below
are the ones that matter at 100 TB (AQE, Arrow batching, shuffle sizing) and
are harmless at sf0.001.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip this package for shipping to executors — the local-mode analogue
    of `spark-submit --py-files enem_spark.zip` on a real cluster. Without it
    the Python workers (separate processes) can't unpickle our UDF closures."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # already imported FROM an archive (spark-submit --py-files
        # enem_spark.zip): ship that archive itself
        p = pkg_dir
        while p and not os.path.isfile(p):
            p = os.path.dirname(p)
        if p and zipfile.is_zipfile(p):
            return p
    out = os.path.join(tempfile.gettempdir(), "enem_spark_pkg.zip")
    n_entries = 0
    with zipfile.ZipFile(out, "w") as zf:
        for root, _, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
                    n_entries += 1
    if n_entries == 0:
        # a failed archive-probe above falls through to os.walk over a
        # nonexistent dir, which yields nothing — shipping that empty zip
        # would surface hours later as ModuleNotFoundError on the workers,
        # far from the cause
        raise RuntimeError(
            f"package_zip found no .py files under {pkg_dir!r} and the "
            "containing archive could not be identified — cannot ship "
            "enem_spark to executors"
        )
    return out


def get_spark(
    app_name: str = "enem_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a session.

    cores: N for local[N]; defaults to $SPARK_GRAFT_CPUS or '*'.
    shuffle_partitions: defaults to max(2*cores, 32) — at cluster scale this
      is instead sized so post-shuffle partitions land near 128-256 MB; AQE
      coalescing makes the exact number forgiving.
    """
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    n_cores = os.cpu_count() if cores == "*" else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * n_cores, 32)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: post-shuffle coalescing + skew-join splitting at runtime
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer for pandas UDFs; modest batches because page rows
        # carry large text/html payloads (100 KB+ per row at CC scale)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # large text rows: keep scan partitions bounded
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # TIMESTAMP_MICROS (not legacy INT96): INT96 writes NO parquet
        # footer stats, which blinds min/max data skipping on warc_ts —
        # the icetable manifest bounds and row-group skipping both need
        # the stats (cluster_files falls back to an extra scan without)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addPyFile(package_zip())
    return spark
