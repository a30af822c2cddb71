"""Icetable (Iceberg-style table layer) — commit protocol, time travel,
transform pruning, metadata-only deletes, pandas/Spark writer interop, and
the snapshot-delta CDC operator."""

import glob
import json
import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F, types as T

from enem_spark.sources import icetable as it

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture()
def tmp_table(tmp_path):
    return str(tmp_path / "tbl")


def _toy_pdf(lo: int, hi: int) -> pd.DataFrame:
    rows = []
    for i in range(lo, hi):
        rows.append(
            {
                "url": f"https://s{i % 3}.example.org/doc/{i}",
                "warc_ts": pd.Timestamp(it.EPOCH_S + i * 86400 // 4, unit="s"),
                "html": f"<p>{i}</p>".encode(),
                "text": f"doc {i} body",
                "lang": "pt" if i % 2 else "en",
            }
        )
    return pd.DataFrame(rows, columns=[f.name for f in it.PAGES_ICE_SCHEMA.fields])


TRANSFORMS = (
    it.Transform("p_day", "days", "warc_ts"),
    it.Transform("b_url", "bucket", "url", 4),
)


def _sorted_rows(df):
    return sorted(
        (r["url"], r["text"], r["lang"]) for r in df.select("url", "text", "lang").collect()
    )


def _expected_rows(pdf):
    return sorted(zip(pdf["url"], pdf["text"], pdf["lang"]))


def test_create_append_read_roundtrip(spark, tmp_table):
    a, b = _toy_pdf(0, 40), _toy_pdf(40, 60)
    df_a = spark.createDataFrame(a, schema=it.PAGES_ICE_SCHEMA)
    df_b = spark.createDataFrame(b, schema=it.PAGES_ICE_SCHEMA)
    t = it.IceTable.create(spark, tmp_table, df_a, TRANSFORMS, sequence=10)
    t.append(df_b, sequence=20)
    got = _sorted_rows(t.read())
    assert got == _expected_rows(pd.concat([a, b]))
    ops = [s["operation"] for s in t.snapshots()]
    assert ops == ["create", "append", "append"]


def test_time_travel_and_snapshot_isolation(spark, tmp_table):
    a, b = _toy_pdf(0, 30), _toy_pdf(30, 50)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(a, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    old_df = t.read()  # resolved BEFORE the next commit
    old_files, _ = t.plan_files()
    t.append(spark.createDataFrame(b, schema=it.PAGES_ICE_SCHEMA), sequence=20)
    # the pre-commit plan is pinned: the already-resolved read sees old rows
    assert old_df.count() == 30
    # snapshot_id / as_of time travel
    assert t.read(snapshot_id=1).count() == 30
    assert t.read(as_of=10).count() == 30
    assert t.read(as_of=15).count() == 30
    assert t.read(as_of=20).count() == 50
    assert t.read().count() == 50
    with pytest.raises(KeyError):
        t.read(as_of=5)
    # overwrite starts a fresh file set but history stays readable
    t.overwrite(
        spark.createDataFrame(_toy_pdf(0, 5), schema=it.PAGES_ICE_SCHEMA),
        sequence=30,
    )
    assert t.read().count() == 5
    assert t.read(snapshot_id=2).count() == 50
    new_files, _ = t.plan_files(snapshot_id=1)
    assert sorted(new_files) == sorted(old_files)


def test_pruning_days_bucket_and_bounds(spark, tmp_table):
    pdf = _toy_pdf(0, 80)  # 20 distinct days x 4 url buckets
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=1,
    )
    _, full = t.plan_files()
    assert full["files_total"] > 10

    # hidden partitioning: filter on the SOURCE column warc_ts prunes days
    cutoff = pd.Timestamp(it.EPOCH_S + 70 * 86400 // 4, unit="s").to_pydatetime()
    files, rep = t.plan_files([("warc_ts", ">=", cutoff)])
    assert 0 < rep["files_kept"] < rep["files_total"]
    got = t.read([("warc_ts", ">=", cutoff)])
    exp = pdf[pdf["warc_ts"] >= cutoff]
    assert _sorted_rows(got) == _expected_rows(exp)

    # bucket transform: url point lookup touches at most 1/4 of the files
    target = "https://s1.example.org/doc/37"
    files, rep = t.plan_files([("url", "=", target)])
    assert rep["files_kept"] <= rep["files_total"] // 4 + 1
    assert [r["url"] for r in t.read([("url", "=", target)]).collect()] == [target]

    # min/max bounds pruning on a non-partition column
    files, rep = t.plan_files([("text", "=", "doc 79 body")])
    assert rep["files_kept"] < rep["files_total"]
    assert t.read([("text", "=", "doc 79 body")]).count() == 1


def test_commit_conflict_and_crash_safety(spark, tmp_table):
    a = _toy_pdf(0, 10)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(a, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=1,
    )
    # a racing writer claims the next version between this writer's base
    # read and its version-file create -> loser gets conflict, no rebase
    v = it.current_version(tmp_table)  # loser's observed base
    meta = t.metadata()
    it._atomic_create(it._version_file(tmp_table, v + 1), meta)  # the racer
    with pytest.raises(it.CommitConflict):
        t._commit("append", [], sequence=2, df_schema=None,
                  keep_parent_manifests=True, base_version=v)
    # crash safety: orphaned data/manifest files (no version file) are
    # invisible to readers and don't block the next successful commit
    os.unlink(it._version_file(tmp_table, v + 1))
    orphan = os.path.join(tmp_table, "data", "c99999", "junk.parquet")
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    a.head(2).to_parquet(orphan)
    assert t.read().count() == 10
    t.append(
        spark.createDataFrame(_toy_pdf(10, 20), schema=it.PAGES_ICE_SCHEMA),
        sequence=2,
    )
    assert t.read().count() == 20


def test_schema_evolution_add_column(spark, tmp_table):
    a = _toy_pdf(0, 10)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(a, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=1,
    )
    evolved = it._merge_schema(
        it.PAGES_ICE_SCHEMA,
        T.StructType([T.StructField("http_status", T.IntegerType(), True)]),
    )
    b = _toy_pdf(10, 20).assign(http_status=200)
    t.append(spark.createDataFrame(b, schema=evolved), sequence=2)
    df = t.read()
    assert df.schema[-1].name == "http_status"
    by_status = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col("http_status").alias("s")).agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert by_status == {None: 10, 200: 10}  # old files read back as null
    # type change is refused (needs field ids)
    with pytest.raises(ValueError):
        it._merge_schema(
            it.PAGES_ICE_SCHEMA,
            T.StructType([T.StructField("lang", T.LongType(), True)]),
        )


def test_delete_partitions_is_metadata_only(spark, tmp_table):
    pdf = _toy_pdf(0, 40)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=1,
    )
    data_files = sorted(glob.glob(os.path.join(tmp_table, "data", "**", "*.parquet"), recursive=True))
    mtimes = {f: os.path.getmtime(f) for f in data_files}
    day0 = it._days_of(pdf["warc_ts"].min().to_pydatetime())
    snap = t.delete_partitions([("p_day", "<=", day0 + 2)], sequence=2)
    assert snap["summary"]["deleted_files"] > 0
    # zero data IO: every data file still on disk, byte-untouched
    after = sorted(glob.glob(os.path.join(tmp_table, "data", "**", "*.parquet"), recursive=True))
    assert after == data_files
    assert {f: os.path.getmtime(f) for f in after} == mtimes
    # rows in the dropped partitions are gone; time travel still sees them
    kept = t.read()
    assert kept.count() == int(
        (pdf["warc_ts"].map(lambda x: it._days_of(x.to_pydatetime())) > day0 + 2).sum()
    )
    assert t.read(snapshot_id=1).count() == 40
    with pytest.raises(ValueError):
        t.delete_partitions([("not_a_partition", "=", 1)], sequence=3)


def test_pandas_and_spark_writers_interoperate(spark, tmp_path):
    """The driver's oracle staging writes with pyarrow; the engine writes
    with Spark. Same rows must yield the same readable table either way."""
    pdf = _toy_pdf(0, 25)
    py_path, sp_path = str(tmp_path / "py"), str(tmp_path / "sp")
    t_py = it.create_pandas(py_path, pdf, it.PAGES_ICE_SCHEMA, TRANSFORMS, sequence=1)
    t_py.spark = spark
    t_sp = it.IceTable.create(
        spark, sp_path, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=1,
    )
    assert _sorted_rows(t_py.read()) == _sorted_rows(t_sp.read())
    # identical partition tuples in both manifests
    def tuples(t):
        snap = t._resolve_snapshot(t.metadata(), None, None)
        return sorted(
            (e["partition"]["p_day"], e["partition"]["b_url"])
            for e in t._manifest_entries(snap)
        )
    assert tuples(t_py) == tuples(t_sp)
    # Spark append onto the pandas-created table
    t_py.append(
        spark.createDataFrame(_toy_pdf(25, 30), schema=it.PAGES_ICE_SCHEMA),
        sequence=2,
    )
    assert t_py.read().count() == 30


def test_snapshot_delta_statuses(spark):
    staged = it.stage_ice_pages(SF_DIR)
    t = it.IceTable(spark, staged["table"])
    delta = it.snapshot_delta(
        t, staged["snap_old"], staged["snap_new"], key="url", content_cols=("text",)
    ).toPandas()
    by_status = delta.groupby("status")["url"].count().to_dict()
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id"])
    ids = docs["doc_id"].astype(int)
    assert by_status.get("added", 0) == int((ids % 7 == 0).sum())
    assert by_status.get("removed", 0) == int((ids % 5 == 4).sum())
    assert by_status.get("changed", 0) == int(((ids % 3 == 0) & (ids % 5 != 4)).sum())
    assert by_status.get("unchanged", 0) == int(
        ((ids % 3 != 0) & (ids % 5 != 4)).sum()
    )
    # spot-check one url of each class
    st = dict(zip(delta["url"], delta["status"]))
    src = pd.read_parquet(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "source"]
    ).set_index("doc_id")["source"]
    def url_of(i):
        return it.ice_url(i, src.loc[i])
    first_removed = int(ids[ids % 5 == 4].iloc[0])
    assert st[url_of(first_removed)] == "removed"
    assert st[it.ice_url(0, src.loc[0]) + "?page=2"] == "added"


def test_incremental_scan_reads_only_appended_files(spark, tmp_table):
    t = it.IceTable.create(
        spark,
        tmp_table,
        spark.createDataFrame(_toy_pdf(0, 40), schema=it.PAGES_ICE_SCHEMA),
        partition_by=TRANSFORMS,
        sequence=10,
    )
    t.append(
        spark.createDataFrame(_toy_pdf(40, 50), schema=it.PAGES_ICE_SCHEMA),
        sequence=20,
    )
    # incremental from seq 10 -> only the 10 appended rows, and the plan
    # touches only files absent from the base snapshot
    files, report = t.plan_incremental(from_seq=10)
    assert report["files_new"] == report["files_kept"] == len(files)
    assert report["files_new"] < report["files_total_snapshot"]
    got = sorted(r.url for r in t.read_incremental(from_seq=10).collect())
    assert got == sorted(_toy_pdf(40, 50)["url"])
    # residual filters still apply row-level on the delta
    assert t.read_incremental(from_seq=10, filters=[("lang", "=", "en")]).count() == int(
        (_toy_pdf(40, 50)["lang"] == "en").sum()
    )
    # from a sequence at/after the tip -> empty delta
    assert t.read_incremental(from_seq=20).count() == 0
    # from before any snapshot -> the whole current file set is "new"
    assert t.read_incremental(from_seq=-100).count() == 50


def test_incremental_scan_after_overwrite_is_full(spark, tmp_table):
    t = it.IceTable.create(
        spark,
        tmp_table,
        spark.createDataFrame(_toy_pdf(0, 20), schema=it.PAGES_ICE_SCHEMA),
        partition_by=TRANSFORMS,
        sequence=10,
    )
    t.overwrite(
        spark.createDataFrame(_toy_pdf(5, 25), schema=it.PAGES_ICE_SCHEMA),
        sequence=20,
    )
    # an overwrite rewrites every file: all of them are new relative to the
    # pre-overwrite snapshot (exactness is the caller's anti-join's job)
    _files, report = t.plan_incremental(from_seq=10)
    assert report["files_new"] == report["files_total_snapshot"]
    assert t.read_incremental(from_seq=10).count() == 20


def test_staged_incremental_is_exactly_the_delta_crawl(spark):
    staged = it.stage_ice_pages(SF_DIR)
    t = it.IceTable(spark, staged["table"])
    inc = t.read_incremental(from_seq=it.SEQ_NEW).toPandas()
    exp = it.delta_frame(SF_DIR)
    assert sorted(inc["url"]) == sorted(exp["url"])
    assert set(inc["text"]) == set(exp["text"])
    # and the latest snapshot is the union of re-crawl + delta
    assert t.read().count() == len(it.crawl_frames(SF_DIR)[1]) + len(exp)


def _collect_rows(df):
    return sorted(
        (r.url, r.text, None if r.html is None else bytes(r.html))
        for r in df.select("url", "text", "html").collect()
    )


def test_compact_coalesces_files_preserving_rows_and_history(spark, tmp_table):
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_toy_pdf(0, 20), schema=it.PAGES_ICE_SCHEMA),
        partition_by=(it.Transform("b_url", "bucket", "url", 2),),
        sequence=10,
    )
    t.append(spark.createDataFrame(_toy_pdf(20, 30), schema=it.PAGES_ICE_SCHEMA), 20)
    t.append(spark.createDataFrame(_toy_pdf(30, 40), schema=it.PAGES_ICE_SCHEMA), 30)
    _files, before = t.plan_files()
    rows_before = _collect_rows(t.read())

    snap = t.compact(sequence=40)
    assert snap["operation"] == "replace"
    assert snap["summary"]["compacted_from_files"] == before["files_total"]
    _files2, after = t.plan_files()
    assert after["files_total"] == 2  # one file per bucket partition
    assert after["records_total"] == before["records_total"]
    assert _collect_rows(t.read()) == rows_before
    # pre-compaction snapshots still read their original files (time travel)
    assert t.read(as_of=30).count() == 40
    assert t.read(as_of=20).count() == 30
    # idempotent: compacting an already-compact table commits nothing
    v = it.current_version(tmp_table)
    t.compact(sequence=50)
    assert it.current_version(tmp_table) == v


def test_incremental_reads_through_compaction_and_delete(spark, tmp_table):
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_toy_pdf(0, 20), schema=it.PAGES_ICE_SCHEMA),
        partition_by=TRANSFORMS,
        sequence=10,
    )
    t.append(spark.createDataFrame(_toy_pdf(20, 26), schema=it.PAGES_ICE_SCHEMA), 20)
    t.compact(sequence=30)
    t.append(spark.createDataFrame(_toy_pdf(26, 30), schema=it.PAGES_ICE_SCHEMA), 40)

    # rows appended at seq 20 must survive the later compaction in the
    # delta from seq 10 (read from the append snapshot's own manifests)
    got = sorted(r.url for r in t.read_incremental(from_seq=10).collect())
    assert got == sorted(_toy_pdf(20, 30)["url"])
    # the compaction itself contributes nothing to a later watermark
    assert sorted(
        r.url for r in t.read_incremental(from_seq=30).collect()
    ) == sorted(_toy_pdf(26, 30)["url"])
    # a delete between watermark and tip subtracts its dropped files
    day = str(int(_toy_pdf(26, 27)["warc_ts"].iloc[0].timestamp()) // 86400)
    t.delete_partitions([("p_day", "=", day)], sequence=50)
    dropped = {
        u
        for u, ts in zip(_toy_pdf(20, 30)["url"], _toy_pdf(20, 30)["warc_ts"])
        if str(int(ts.timestamp()) // 86400) == day
    }
    got2 = set(r.url for r in t.read_incremental(from_seq=10).collect())
    assert got2 == set(_toy_pdf(20, 30)["url"]) - dropped


def test_expire_snapshots_reclaims_files_and_degrades_incremental(spark, tmp_table):
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_toy_pdf(0, 10), schema=it.PAGES_ICE_SCHEMA),
        partition_by=TRANSFORMS,
        sequence=10,
    )
    t.overwrite(spark.createDataFrame(_toy_pdf(5, 15), schema=it.PAGES_ICE_SCHEMA), 20)
    t.append(spark.createDataFrame(_toy_pdf(15, 18), schema=it.PAGES_ICE_SCHEMA), 30)
    n_parquet_before = len(
        glob.glob(os.path.join(tmp_table, "data", "**", "*.parquet"), recursive=True)
    )
    out = t.expire_snapshots(keep_sequences_from=20)
    assert out["expired_snapshots"] >= 1 and out["deleted_files"] > 0
    n_parquet_after = len(
        glob.glob(os.path.join(tmp_table, "data", "**", "*.parquet"), recursive=True)
    )
    assert n_parquet_after == n_parquet_before - out["deleted_files"]
    # current state intact; expired snapshot unreadable; retained one fine
    assert t.read().count() == 13
    assert t.read(as_of=20).count() == 10
    with pytest.raises(KeyError):
        t.read(as_of=10)
    # incremental from expired history degrades to a full rescan
    _files, report = t.plan_incremental(from_seq=5)
    assert report["files_kept"] == report["files_total_snapshot"]
    # second expire is a no-op
    assert t.expire_snapshots(keep_sequences_from=20)["expired_snapshots"] == 0


def test_append_with_retry_wins_after_conflicts(spark, tmp_table):
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_toy_pdf(0, 5), schema=it.PAGES_ICE_SCHEMA),
        partition_by=TRANSFORMS,
        sequence=10,
    )
    real_commit = t._commit
    calls = {"n": 0}

    def racy_commit(*args, **kwargs):
        # a racer lands a commit between this writer's base read and its
        # version-file create, for the first two attempts
        if calls["n"] < 2:
            calls["n"] += 1
            base = kwargs.get("base_version")
            it.commit_pandas(
                it.IceTable(None, tmp_table),
                _toy_pdf(90 + calls["n"], 91 + calls["n"]),
                it.PAGES_ICE_SCHEMA,
                "append",
                100 + calls["n"],
            )
            kwargs["base_version"] = base
        return real_commit(*args, **kwargs)

    t._commit = racy_commit
    try:
        snap = t.append_with_retry(
            spark.createDataFrame(_toy_pdf(5, 8), schema=it.PAGES_ICE_SCHEMA),
            sequence=200,
        )
    finally:
        t._commit = real_commit
    assert snap["sequence"] == 200
    assert calls["n"] == 2
    # nothing lost: initial 5 + two racer rows + the retried 3
    assert t.read().count() == 10


def test_staging_is_deterministic_and_memoized(tmp_path):
    staged = it.stage_ice_pages(SF_DIR)
    assert staged is it.stage_ice_pages(SF_DIR)
    meta = json.load(open(it._version_file(staged["table"], it.current_version(staged["table"]))))
    assert [s["operation"] for s in meta["snapshots"]] == [
        "create", "append", "overwrite", "append",
    ]
    # a fresh build from the same inputs is byte-identical at the data level
    old_pdf, new_pdf = it.crawl_frames(SF_DIR)
    rebuilt = str(tmp_path / "rebuild")
    t2 = it.create_pandas(rebuilt, old_pdf, it.PAGES_ICE_SCHEMA, it.ICE_TRANSFORMS, sequence=it.SEQ_OLD)
    it.commit_pandas(t2, new_pdf, it.PAGES_ICE_SCHEMA, "overwrite", it.SEQ_NEW)
    it.commit_pandas(t2, it.delta_frame(SF_DIR), it.PAGES_ICE_SCHEMA, "append", it.SEQ_DELTA)
    orig_files = sorted(glob.glob(os.path.join(staged["table"], "data", "**", "*.parquet"), recursive=True))
    new_files = sorted(glob.glob(os.path.join(rebuilt, "data", "**", "*.parquet"), recursive=True))
    assert [os.path.relpath(f, staged["table"]) for f in orig_files] == [
        os.path.relpath(f, rebuilt) for f in new_files
    ]
    for a, b in zip(orig_files, new_files):
        assert open(a, "rb").read() == open(b, "rb").read()


# ---------------------------------------------------------------------------
# Row-level MERGE (copy-on-write upsert)


def _entry_paths(t):
    snap = t._resolve_snapshot(t.metadata(), None, None)
    return {e["path"] for e in t._manifest_entries(snap)}


def test_merge_upsert_semantics_and_cow(spark, tmp_table):
    """Updates replace, inserts land, untouched files carry over by
    manifest reference (byte-untouched on disk), pre-merge time travel
    intact."""
    pdf = _toy_pdf(0, 40)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=1,
    )
    before_paths = _entry_paths(t)
    data_files = sorted(
        glob.glob(os.path.join(tmp_table, "data", "**", "*.parquet"), recursive=True)
    )
    mtimes = {f: os.path.getmtime(f) for f in data_files}

    # source: update docs 0-4 (same url, new text), insert 100-104
    src = _toy_pdf(0, 5)
    src["text"] = src["text"] + " fixed"
    src = pd.concat([src, _toy_pdf(100, 105)], ignore_index=True)
    snap = t.merge(
        spark.createDataFrame(src, schema=it.PAGES_ICE_SCHEMA), ["url"], sequence=2
    )
    assert snap["operation"] == "merge"
    assert snap["summary"]["files_rewritten"] > 0
    assert snap["summary"]["files_kept"] > 0
    assert (
        snap["summary"]["files_rewritten"] + snap["summary"]["files_kept"]
        == len(before_paths)
    )

    expected = pd.concat(
        [pdf[~pdf["url"].isin(set(src["url"]))], src], ignore_index=True
    )
    assert _sorted_rows(t.read()) == _expected_rows(expected)
    # untouched files: still referenced by the new snapshot, bytes untouched
    after_paths = _entry_paths(t)
    kept = before_paths & after_paths
    assert len(kept) == snap["summary"]["files_kept"]
    for f in data_files:
        assert os.path.getmtime(f) == mtimes[f]  # rewrite never edits in place
    # time travel: the pre-merge snapshot still reads the original rows
    assert _sorted_rows(t.read(snapshot_id=1)) == _expected_rows(pdf)
    # key validation
    with pytest.raises(ValueError):
        t.merge(
            spark.createDataFrame(src, schema=it.PAGES_ICE_SCHEMA),
            ["nope"], sequence=3,
        )


def test_merge_partition_pruning_and_key_canonicalization(spark, tmp_table):
    """A table partitioned by a KEY-derived transform (bucket(url)) merged
    with a single-key source plans only that bucket's files as candidates
    (non-key transforms must NOT prune — see
    test_merge_update_moving_partition_leaves_no_duplicate_key); a key
    holding several target rows collapses to the single source row."""
    pdf = _toy_pdf(0, 30)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        (it.Transform("b_url", "bucket", "url", 8),), sequence=1,
    )
    # second version of one pt url appended (multi-version crawl history)
    dup = pdf[pdf["lang"] == "pt"].head(1).copy()
    dup["warc_ts"] = dup["warc_ts"] + pd.Timedelta(days=1)
    dup["text"] = dup["text"] + " v2"
    t.append(spark.createDataFrame(dup, schema=it.PAGES_ICE_SCHEMA), sequence=2)
    n_files = len(_entry_paths(t))

    src = dup.copy()
    src["text"] = "canonical"
    snap = t.merge(
        spark.createDataFrame(src, schema=it.PAGES_ICE_SCHEMA), ["url"], sequence=3
    )
    # pruning: only the pt partition's files were candidates
    assert snap["summary"]["files_candidates"] < n_files
    assert snap["summary"]["files_rewritten"] <= snap["summary"]["files_candidates"]
    # canonicalization: BOTH prior versions of the url replaced by one row
    url = src["url"].iloc[0]
    rows = t.read().filter(F.col("url") == url).collect()
    assert [(r["url"], r["text"]) for r in rows] == [(url, "canonical")]
    assert t.read().count() == 30  # 31 rows pre-merge, duplicate collapsed


def test_merge_insert_only_and_commit_conflict(spark, tmp_table):
    """A source with no matching keys rewrites nothing; a racer claiming
    the next version mid-merge raises CommitConflict (no silent rebase)."""
    pdf = _toy_pdf(0, 10)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=1,
    )
    ins = _toy_pdf(50, 55)
    snap = t.merge(
        spark.createDataFrame(ins, schema=it.PAGES_ICE_SCHEMA), ["url"], sequence=2
    )
    assert snap["summary"]["files_rewritten"] == 0
    assert t.read().count() == 15

    # race: another writer commits between merge's base read and its commit
    orig = it.IceTable._write_data

    def race_then_write(self, df, snap_hint):
        v = it.current_version(self.path)
        it._atomic_create(it._version_file(self.path, v + 1), self.metadata(v))
        return orig(self, df, snap_hint)

    it.IceTable._write_data = race_then_write
    try:
        with pytest.raises(it.CommitConflict):
            t.merge(
                spark.createDataFrame(ins, schema=it.PAGES_ICE_SCHEMA),
                ["url"], sequence=3,
            )
    finally:
        it.IceTable._write_data = orig


def test_merge_staging_matches_spark_merge(spark):
    """The pure-pandas expected post-merge frame equals the Spark-side
    IceTable.merge result over the staged base table (the driver-twin
    protocol, exercised directly)."""
    import __spark_entry__ as entry

    spdf = (
        entry.queries()["iceberg_merge"](spark, SF_DIR)
        .toPandas()
        .sort_values(["url", "text_md5"])
        .reset_index(drop=True)
    )
    exp = pd.read_parquet(
        it.stage_ice_merge_base(SF_DIR)["expected_merged"]
    )
    exp = (
        exp.assign(text_md5=[__import__("hashlib").md5(s.encode()).hexdigest() for s in exp["text"]])
        [["url", "html_md5", "html_len", "text_md5", "lang"]]
        .sort_values(["url", "text_md5"])
        .reset_index(drop=True)
    )
    assert len(spdf) == len(exp)
    assert list(spdf["url"]) == list(exp["url"])
    assert list(spdf["html_md5"]) == list(exp["html_md5"])
    assert list(spdf["text_md5"]) == list(exp["text_md5"])
    assert list(spdf["html_len"].astype(int)) == list(exp["html_len"].astype(int))


# ---------------------------------------------------------------------------
# rollback + orphan-file GC (maintenance completeness)


def test_rollback_is_metadata_only_and_conflict_safe(spark, tmp_table):
    """Rolling back re-reads the old rows with zero data IO, keeps the bad
    snapshot time-travelable, participates in optimistic concurrency, and
    a later append builds on the rolled-back state."""
    a, b = _toy_pdf(0, 10), _toy_pdf(10, 25)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(a, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=1,
    )
    good = t._resolve_snapshot(t.metadata(), None, None)["snapshot_id"]
    t.overwrite(spark.createDataFrame(b, schema=it.PAGES_ICE_SCHEMA), sequence=2)
    files_before = sorted(
        glob.glob(os.path.join(tmp_table, "data", "**", "*.parquet"), recursive=True)
    )

    snap = t.rollback(good, sequence=3)
    assert snap["operation"] == "rollback"
    assert snap["summary"]["rolled_back_to"] == good
    assert _sorted_rows(t.read()) == _expected_rows(a)
    # zero data IO: no file added or removed
    assert sorted(
        glob.glob(os.path.join(tmp_table, "data", "**", "*.parquet"), recursive=True)
    ) == files_before
    # the reverted overwrite is still time-travelable until expired
    assert t.read(as_of=2).count() == 15
    # history moves forward from the rollback
    t.append(spark.createDataFrame(_toy_pdf(30, 33), schema=it.PAGES_ICE_SCHEMA), 4)
    assert t.read().count() == 13
    with pytest.raises(ValueError):
        t.rollback(99, sequence=5)


def test_remove_orphan_files_deletes_only_unreferenced(spark, tmp_table):
    """Crash leftovers (files no snapshot references) are reclaimed; every
    referenced file — current AND historical — survives; the age guard
    protects in-flight attempts."""
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_toy_pdf(0, 10), schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=1,
    )
    t.overwrite(
        spark.createDataFrame(_toy_pdf(10, 20), schema=it.PAGES_ICE_SCHEMA), 2
    )
    # a crashed attempt's private dir: orphan parquet files
    orphan_dir = os.path.join(tmp_table, "data", "c00099-deadbeef")
    os.makedirs(orphan_dir)
    _toy_pdf(0, 3).to_parquet(os.path.join(orphan_dir, "junk.parquet"))
    old = os.path.join(orphan_dir, "old.parquet")
    _toy_pdf(3, 5).to_parquet(old)
    os.utime(old, (1, 1))  # ancient mtime

    # young orphans survive the DEFAULT age-guarded GC (3 days)
    out = t.remove_orphan_files()
    assert out["deleted_orphans"] == 1  # only the ancient one
    assert os.path.exists(os.path.join(orphan_dir, "junk.parquet"))

    out2 = t.remove_orphan_files(older_than_s=0)  # explicit: no live writers
    assert out2["deleted_orphans"] == 1
    assert not os.path.exists(os.path.join(orphan_dir, "junk.parquet"))
    # both snapshots still read intact (historical files untouched)
    assert t.read().count() == 10
    assert t.read(as_of=1).count() == 10
    assert t.read(as_of=2).count() == 10


def test_ice_maintenance_cli(tmp_path, spark):
    """The nightly-ops CLI: rollback -> compact -> expire -> orphan GC over
    a real table, one JSON summary, correct end state."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tbl = str(tmp_path / "tbl")
    t = it.IceTable.create(
        spark, tbl,
        spark.createDataFrame(_toy_pdf(0, 12), schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    good = t._resolve_snapshot(t.metadata(), None, None)["snapshot_id"]
    t.append(spark.createDataFrame(_toy_pdf(12, 18), schema=it.PAGES_ICE_SCHEMA), 20)
    t.overwrite(
        spark.createDataFrame(_toy_pdf(50, 55), schema=it.PAGES_ICE_SCHEMA), 30
    )  # the bad overwrite the rollback reverts
    orphan = os.path.join(tbl, "data", "c00042-dead", "junk.parquet")
    os.makedirs(os.path.dirname(orphan))
    _toy_pdf(0, 2).to_parquet(orphan)

    p = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "ice_maintenance.py"),
            "--table", tbl, "--cores", "2",
            "--rollback", str(good), "--seq", "40",
            "--compact", "50",
            "--expire-from", "40",
            "--orphans", "--older-than-s", "0",
        ],
        capture_output=True, text=True, check=True,
    )
    s = json.loads(p.stdout.strip().splitlines()[-1])
    assert s["rollback"]["rolled_back_to"] == good
    assert s["expire"]["expired_snapshots"] > 0
    assert s["orphans"]["deleted_orphans"] >= 1
    assert not os.path.exists(orphan)
    # end state: the first crawl's rows, compacted, bad overwrite expired
    t2 = it.IceTable(spark, tbl)
    assert _sorted_rows(t2.read()) == _expected_rows(_toy_pdf(0, 12))
    with pytest.raises(Exception):
        t2.read(as_of=30).collect()  # expired overwrite no longer readable


def test_merge_with_schema_evolution(spark, tmp_table):
    """A merge source adding a column evolves the table schema: survivors
    and kept-file rows read NULL for the new column, source rows carry it."""
    pdf = _toy_pdf(0, 20)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=1,
    )
    src = _toy_pdf(0, 4)
    src["text"] = src["text"] + " fixed"
    src["fetcher"] = "crawler-7"
    schema2 = T.StructType(
        it.PAGES_ICE_SCHEMA.fields + [T.StructField("fetcher", T.StringType(), True)]
    )
    t.merge(spark.createDataFrame(src, schema=schema2), ["url"], sequence=2)
    got = t.read()
    assert "fetcher" in got.columns
    vals = {r["url"]: r["fetcher"] for r in got.select("url", "fetcher").collect()}
    assert all(v == "crawler-7" for u, v in vals.items() if u in set(src["url"]))
    assert all(v is None for u, v in vals.items() if u not in set(src["url"]))
    assert got.count() == 20


def test_merge_update_moving_partition_leaves_no_duplicate_key(spark, tmp_table):
    """Regression: an updates-only fix-up whose rows move to a DIFFERENT
    p_day partition (re-fetch 45 days later) must still rewrite the OLD
    partition's files — pruning on a non-key transform (days(warc_ts))
    would hide them and leave duplicate urls behind."""
    pdf = _toy_pdf(0, 12)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=1,  # (days(warc_ts), bucket(url,4))
    )
    src = pdf.head(4).copy()
    src["warc_ts"] = src["warc_ts"] + pd.Timedelta(days=45)
    src["text"] = src["text"] + " refetched"
    snap = t.merge(
        spark.createDataFrame(src, schema=it.PAGES_ICE_SCHEMA), ["url"], sequence=2
    )
    got = t.read()
    assert got.count() == 12  # NOT 16: old versions replaced, not duplicated
    assert got.select("url").distinct().count() == 12
    refetched = {
        r["url"]: r["text"]
        for r in got.filter(F.col("text").endswith("refetched")).collect()
    }
    assert set(refetched) == set(src["url"])
    # bucket(url) IS key-derived, so candidate planning still pruned on it
    assert snap["summary"]["files_candidates"] <= snap["summary"]["files_kept"] + snap["summary"]["files_rewritten"]


def test_incremental_scan_after_merge_and_rollback_is_full(spark, tmp_table):
    """`merge` and `rollback` snapshots change the LIVE row set without an
    append an incremental walk could see — planning across either must
    degrade to a full rescan (default-deny), or an incremental extraction
    tail would serve pre-merge content forever and advance its watermark
    past the change."""
    pdf0 = _toy_pdf(0, 20)
    t = it.IceTable.create(
        spark,
        tmp_table,
        spark.createDataFrame(pdf0, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS,
        sequence=10,
    )
    # the data snapshot, not the empty `create` marker snapshot before it
    first_snap = next(s for s in t.snapshots() if s["sequence"] == 10)[
        "snapshot_id"
    ]
    src = _toy_pdf(5, 6)
    src["text"] = "doc 5 body REFETCHED"
    t.merge(
        spark.createDataFrame(src, schema=it.PAGES_ICE_SCHEMA), ["url"], sequence=20
    )
    _files, report = t.plan_incremental(from_seq=10)
    assert report["files_new"] == report["files_total_snapshot"]
    inc = {r.url: r.text for r in t.read_incremental(from_seq=10).collect()}
    assert len(inc) == 20
    assert inc[src["url"][0]] == "doc 5 body REFETCHED"
    # rollback reverts the live row set the same way: full rescan, and the
    # incremental reader sees the PRE-merge content again
    t.rollback(first_snap, sequence=30)
    _files, report = t.plan_incremental(from_seq=20)
    assert report["files_new"] == report["files_total_snapshot"]
    inc = {r.url: r.text for r in t.read_incremental(from_seq=20).collect()}
    assert inc[src["url"][0]] == "doc 5 body"


def test_commit_point_is_content_atomic(tmp_path):
    """The version file must never be observable without its full JSON: the
    loser of a commit race gets CommitConflict, the winner's content stays
    intact, and no tmp files leak."""
    md = tmp_path / "meta"
    md.mkdir()
    path = str(md / "v00007.json")
    it._atomic_create(path, {"winner": 1})
    with pytest.raises(it.CommitConflict):
        it._atomic_create(path, {"loser": 2})
    with open(path) as fh:
        assert json.load(fh) == {"winner": 1}
    assert [n for n in os.listdir(md) if ".tmp" in n] == []


# ---------------------------------------------------------------------------
# Merge-on-read equality deletes (Iceberg v2 delete files)
# ---------------------------------------------------------------------------


def _urls(lo, hi):
    return [f"https://s{i % 3}.example.org/doc/{i}" for i in range(lo, hi)]


def _keys_df(spark, urls):
    return spark.createDataFrame(pd.DataFrame({"url": urls}))


def test_row_delete_mor_visibility_and_time_travel(spark, tmp_table):
    pdf = _toy_pdf(0, 40)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    files_before, _ = t.plan_files()
    snap = t.delete_rows(_keys_df(spark, _urls(0, 10)), sequence=20)
    assert snap["operation"] == "rowdelete"
    assert snap["summary"]["deleted_keys"] == 10
    # zero data IO: the data file set is untouched, one delete file added
    files_after, rep = t.plan_files()
    assert sorted(files_before) == sorted(files_after)
    assert rep["delete_files"] == 1
    got = _sorted_rows(t.read())
    assert got == _expected_rows(pdf[10:])
    # time travel BEFORE the delete still sees every row
    assert _sorted_rows(t.read(as_of=10)) == _expected_rows(pdf)
    # residual filters compose with the MOR anti-join
    assert (
        t.read([("lang", "=", "pt")]).count()
        == sum(1 for i in range(10, 40) if i % 2)
    )


def test_row_delete_sequence_scoping_reappend_survives(spark, tmp_table):
    pdf = _toy_pdf(0, 20)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.delete_rows(_keys_df(spark, _urls(0, 5)), sequence=20)
    # the same urls come back in a LATER crawl: new data files commit at
    # sequence 30 > applies_below 20, so the old takedown must not hit them
    re_pdf = _toy_pdf(0, 5)
    re_pdf["text"] = re_pdf["text"] + " RECRAWLED"
    t.append(spark.createDataFrame(re_pdf, schema=it.PAGES_ICE_SCHEMA), sequence=30)
    got = dict(
        (r["url"], r["text"]) for r in t.read().select("url", "text").collect()
    )
    for u in _urls(0, 5):
        assert got[u].endswith("RECRAWLED")
    assert len(got) == 20


def test_purge_deletes_is_row_preserving_and_targeted(spark, tmp_table):
    pdf = _toy_pdf(0, 60)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.delete_rows(_keys_df(spark, _urls(0, 6)), sequence=20)
    before = _sorted_rows(t.read())
    _, rep0 = t.plan_files()
    snap = t.purge_deletes(sequence=30)
    assert snap["operation"] == "replace"
    assert snap["summary"]["delete_files_removed"] == 1
    # only files actually holding deleted keys were rewritten
    assert 0 < snap["summary"]["files_rewritten"] < rep0["files_total"]
    _, rep1 = t.plan_files()
    assert rep1["delete_files"] == 0
    assert _sorted_rows(t.read()) == before == _expected_rows(pdf[6:])
    # time travel to the MOR snapshot still applies the delete file
    assert _sorted_rows(t.read(as_of=20)) == before
    # a second purge is a no-op
    assert t.purge_deletes(sequence=40)["operation"] == "noop"


def test_compact_applies_pending_deletes(spark, tmp_table):
    a, b = _toy_pdf(0, 20), _toy_pdf(20, 40)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(a, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.append(spark.createDataFrame(b, schema=it.PAGES_ICE_SCHEMA), sequence=20)
    t.delete_rows(_keys_df(spark, _urls(0, 8)), sequence=30)
    expected = _expected_rows(pd.concat([a[8:], b]))
    t.compact(sequence=40)
    # compacted rows must NOT resurrect deleted ones (rewritten files
    # escape the delete's sequence scope, so the rewrite itself applies it)
    assert _sorted_rows(t.read()) == expected


def test_merge_after_row_delete_no_resurrection(spark, tmp_table):
    pdf = _toy_pdf(0, 30)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.delete_rows(_keys_df(spark, _urls(0, 6)), sequence=20)
    # upsert OTHER urls that share data files with the deleted ones
    src = _toy_pdf(10, 12)
    src["text"] = src["text"] + " MERGED"
    t.merge(
        spark.createDataFrame(src, schema=it.PAGES_ICE_SCHEMA), ["url"], sequence=30
    )
    got = dict(
        (r["url"], r["text"]) for r in t.read().select("url", "text").collect()
    )
    for u in _urls(0, 6):
        assert u not in got
    for u in _urls(10, 12):
        assert got[u].endswith("MERGED")
    assert len(got) == 24


def test_row_delete_keeps_incremental_reads_incremental(spark, tmp_table):
    """A takedown must not degrade the next incremental extraction to an
    O(corpus) rescan: rowdelete adds no data files, and sequence scoping
    applies it exactly to the walk's earlier appends and nothing newer."""
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_toy_pdf(0, 20), schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.append(spark.createDataFrame(_toy_pdf(20, 30), schema=it.PAGES_ICE_SCHEMA), sequence=15)
    # takedown hits base-crawl urls AND two urls from the seq-15 append
    t.delete_rows(_keys_df(spark, _urls(0, 4) + _urls(20, 22)), sequence=20)
    t.append(spark.createDataFrame(_toy_pdf(30, 35), schema=it.PAGES_ICE_SCHEMA), sequence=25)

    _files, report = t.plan_incremental(from_seq=10)
    assert report["full_rescan"] is False
    assert report["files_new"] < report["files_total_snapshot"]
    # incremental rows = the two appends, with the takedown applied to the
    # seq-15 files (15 < 20) but never to the seq-25 ones (25 > 20); the
    # base crawl's deleted urls are not re-seen either way
    assert _sorted_rows(t.read_incremental(from_seq=10)) == _expected_rows(
        _toy_pdf(22, 35)
    )
    # a delete-only window is an EMPTY increment, not a rescan
    _files, rep2 = t.plan_incremental(from_seq=15, as_of=20)
    assert rep2["full_rescan"] is False and rep2["files_new"] == 0
    assert t.read_incremental(from_seq=20).count() == 5  # just the seq-25 append


def test_purge_in_window_does_not_resurrect_deleted_rows(spark, tmp_table):
    """ADVICE r2 (high): purge_deletes commits as a `replace` the
    incremental walk rightly skips, but it also DROPS the delete entries
    from the target's manifests — so an incremental read whose window
    spans append -> rowdelete -> purge used to return the original
    append files with NO deletes applied, resurrecting taken-down rows.
    The walk must union in every walked rowdelete snapshot's delete
    entries."""
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_toy_pdf(0, 5), schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.append(spark.createDataFrame(_toy_pdf(5, 25), schema=it.PAGES_ICE_SCHEMA), sequence=15)
    t.delete_rows(_keys_df(spark, _urls(5, 12)), sequence=20)
    t.purge_deletes(sequence=30)

    # window spans the append, the takedown, and the purge: the walk
    # returns the ORIGINAL seq-15 files, so the seq-20 delete must ride
    # along even though the post-purge target carries no delete entries
    _files, report = t.plan_incremental(from_seq=10)
    assert report["full_rescan"] is False
    assert report["delete_files"] == 1
    assert _sorted_rows(t.read_incremental(from_seq=10)) == _expected_rows(
        _toy_pdf(12, 25)
    )
    # pre-window rowdelete + in-window purge: the purge-rewritten files
    # are not in the walk (replace) and no walked delete applies; the
    # increment is simply empty
    assert t.read_incremental(from_seq=20).count() == 0
    # full snapshot read stays row-exact post-purge
    assert sorted(r.url for r in t.read().collect()) == sorted(
        _urls(0, 5) + _urls(12, 25)
    )


def test_delete_rows_empty_keys_is_noop(spark, tmp_table):
    pdf = _toy_pdf(0, 10)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    n_snaps = len(t.snapshots())
    out = t.delete_rows(spark.createDataFrame([], "url string"), sequence=20)
    assert out == {"operation": "noop", "deleted_keys": 0}
    assert len(t.snapshots()) == n_snaps
    with pytest.raises(ValueError):
        t.delete_rows(
            spark.createDataFrame(pd.DataFrame({"nope": ["x"]})), sequence=20
        )


def test_expire_keeps_live_delete_files(spark, tmp_table):
    pdf = _toy_pdf(0, 20)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.delete_rows(_keys_df(spark, _urls(0, 5)), sequence=20)
    t.append(spark.createDataFrame(_toy_pdf(20, 25), schema=it.PAGES_ICE_SCHEMA), sequence=30)
    t.expire_snapshots(keep_sequences_from=20)
    # the delete file is referenced by live snapshots -> must survive GC,
    # and the MOR read stays correct after expiry
    assert t.read().count() == 20
    t.remove_orphan_files(older_than_s=0.0)
    assert t.read().count() == 20


def test_ice_maintenance_cli_takedown(tmp_path, spark):
    """The takedown flow through the nightly-ops CLI: --delete-keys commits
    a merge-on-read equality delete, --purge-deletes materializes it."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tbl = str(tmp_path / "tbl")
    pdf = _toy_pdf(0, 30)
    it.IceTable.create(
        spark, tbl, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    keys_path = str(tmp_path / "takedown.parquet")
    pd.DataFrame({"url": _urls(0, 6)}).to_parquet(keys_path)

    p = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "ice_maintenance.py"),
            "--table", tbl, "--cores", "2",
            "--delete-keys", keys_path, "--delete-seq", "20",
            "--purge-deletes", "30",
        ],
        capture_output=True, text=True, check=True,
    )
    s = json.loads(p.stdout.strip().splitlines()[-1])
    assert s["row_delete"]["deleted_keys"] == 6
    assert s["purge_deletes"]["delete_files_removed"] == 1
    assert s["purge_deletes"]["files_rewritten"] > 0
    t2 = it.IceTable(spark, tbl)
    assert _sorted_rows(t2.read()) == _expected_rows(pdf[6:])
    _, rep = t2.plan_files()
    assert rep["delete_files"] == 0


# ---------------------------------------------------------------------------
# Z-order clustering rewrite (multi-column data skipping)
# ---------------------------------------------------------------------------

XY_SCHEMA = T.StructType(
    [
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _xy_chunk(c: int, per: int = 250) -> pd.DataFrame:
    # each chunk spans the FULL x/y range (deterministic stride walk), so
    # every pre-cluster file has near-total min/max bounds — the
    # time-ordered-crawl worst case for value probes
    rows = [
        {
            "x": (j * 37 + c * 13) % 1000,
            "y": (j * 61 + c * 29) % 1000,
            "payload": f"p{c}-{j}",
        }
        for j in range(per)
    ]
    return pd.DataFrame(rows, columns=["x", "y", "payload"])


def test_cluster_files_zorder_improves_2d_skipping(spark, tmp_table):
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_xy_chunk(0), schema=XY_SCHEMA), (), sequence=10,
    )
    for c in range(1, 8):
        t.append(spark.createDataFrame(_xy_chunk(c), schema=XY_SCHEMA), sequence=10 + c)
    before_rows = sorted(
        (r["x"], r["y"], r["payload"]) for r in t.read().collect()
    )
    x_slab = [("x", ">=", 100), ("x", "<=", 199)]
    _, rep_before = t.plan_files(x_slab)
    assert rep_before["files_kept"] == rep_before["files_total"]  # no skipping

    snap = t.cluster_files(["x", "y"], sequence=50, bits=8)
    assert snap["operation"] == "replace"
    assert snap["summary"]["files_rewritten"] == rep_before["files_total"]
    # rows bit-identical through the rewrite
    after_rows = sorted(
        (r["x"], r["y"], r["payload"]) for r in t.read().collect()
    )
    assert after_rows == before_rows
    # BOTH dimensions now skip files (each output file covers a narrow
    # x-range AND a narrow y-range — the point of the interleave)
    _, rx = t.plan_files(x_slab)
    _, ry = t.plan_files([("y", ">=", 100), ("y", "<=", 199)])
    assert rx["files_kept"] < rx["files_total"]
    assert ry["files_kept"] < ry["files_total"]
    # and the 2-D probe prunes harder than either alone
    _, rxy = t.plan_files(x_slab + [("y", ">=", 100), ("y", "<=", 199)])
    assert rxy["files_kept"] <= min(rx["files_kept"], ry["files_kept"])
    # filter results stay exact (pruning is conservative + residual row filter)
    got = t.read(x_slab).count()
    assert got == sum(1 for x, _y, _p in before_rows if 100 <= x <= 199)
    # time travel to the pre-cluster snapshot still reads the old layout
    assert t.read(as_of=17).count() == len(before_rows)


def test_cluster_files_applies_pending_deletes_and_partitions(spark, tmp_table):
    pdf = _toy_pdf(0, 40)
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.delete_rows(_keys_df(spark, _urls(0, 5)), sequence=20)
    snap = t.cluster_files(["warc_ts", "url"], sequence=30)
    assert snap["summary"]["files_rewritten"] > 0
    # the rewrite applied the pending takedown — no resurrection — and
    # partition purity held (hidden-partition pruning still works)
    assert _sorted_rows(t.read()) == _expected_rows(pdf[5:])
    target = pdf["url"][20]
    assert [r["url"] for r in t.read([("url", "=", target)]).collect()] == [target]


def test_row_delete_null_key_matches_null_rows(spark, tmp_table):
    """Iceberg v2 equality-delete null semantics: a delete key with NULL
    matches rows whose key column is NULL (a plain equi-join would
    silently no-op the takedown while reporting it deleted)."""
    nk_schema = T.StructType(
        [
            T.StructField("k", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    pdf = pd.DataFrame(
        {
            "k": [None if i == 0 else f"k{i}" for i in range(10)],
            "text": [f"doc {i} body" for i in range(10)],
        }
    )
    t = it.IceTable.create(
        spark, tmp_table, spark.createDataFrame(pdf, schema=nk_schema),
        (), sequence=10,
    )
    t.delete_rows(
        spark.createDataFrame(
            pd.DataFrame({"k": [None, "k3"]}),
            schema=T.StructType([nk_schema["k"]]),
        ),
        sequence=20,
    )
    got = {r["text"] for r in t.read().select("text").collect()}
    assert "doc 0 body" not in got and "doc 3 body" not in got
    assert len(got) == 8
    # the purge materializes the null-key delete too
    t.purge_deletes(sequence=30)
    got2 = {r["text"] for r in t.read().select("text").collect()}
    assert got2 == got


# ---------------------------------------------------------------------------
# Branches, tags, write-audit-publish
# ---------------------------------------------------------------------------


def test_branch_write_audit_publish(spark, tmp_table):
    """The WAP flow: stage on a branch (main readers blind to it, even
    via as_of), audit via ref reads, publish = one atomic metadata
    fast-forward that makes the staged snapshot the main head."""
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_toy_pdf(0, 20), schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.create_branch("audit")
    t.append(
        spark.createDataFrame(_toy_pdf(20, 30), schema=it.PAGES_ICE_SCHEMA),
        sequence=20, branch="audit",
    )
    # main is blind to the staged work — including pinned as_of reads at
    # the branch commit's own sequence (ancestry-scoped resolution)
    assert t.read().count() == 20
    assert t.read(as_of=20).count() == 20
    # the audit read sees base + staged rows
    assert t.read(ref="audit").count() == 30
    assert _sorted_rows(t.read(ref="audit")) == _expected_rows(_toy_pdf(0, 30))

    t.publish_branch("audit")
    assert t.read().count() == 30
    assert t.read(as_of=20).count() == 30  # published: now in main ancestry
    assert "audit" not in t.refs()


def test_branch_divergence_refused_and_abandon(spark, tmp_table):
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_toy_pdf(0, 10), schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.create_branch("audit")
    t.append(
        spark.createDataFrame(_toy_pdf(10, 12), schema=it.PAGES_ICE_SCHEMA),
        sequence=20, branch="audit",
    )
    # main moves on independently -> the branch is diverged
    t.append(
        spark.createDataFrame(_toy_pdf(20, 25), schema=it.PAGES_ICE_SCHEMA),
        sequence=30,
    )
    with pytest.raises(ValueError):
        t.publish_branch("audit")
    # abandoning a failed audit is just dropping the ref; main unaffected
    t.drop_ref("audit")
    assert "audit" not in t.refs()
    assert t.read().count() == 15
    with pytest.raises(KeyError):
        t.read(ref="audit").collect()


def test_tag_pins_snapshot_through_expiry(spark, tmp_table):
    pdf0 = _toy_pdf(0, 10)
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(pdf0, schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.tag("crawl-0")
    t.overwrite(
        spark.createDataFrame(_toy_pdf(10, 15), schema=it.PAGES_ICE_SCHEMA),
        sequence=20,
    )
    t.overwrite(
        spark.createDataFrame(_toy_pdf(20, 24), schema=it.PAGES_ICE_SCHEMA),
        sequence=30,
    )
    out = t.expire_snapshots(keep_sequences_from=30)
    assert out["expired_snapshots"] > 0
    # the tagged snapshot and its files survive GC and read by name
    assert _sorted_rows(t.read(ref="crawl-0")) == _expected_rows(pdf0)
    assert t.read().count() == 4


def test_branch_does_not_leak_into_incremental(spark, tmp_table):
    """The WAP invariant on the INCREMENTAL path: a main-target delta scan
    must never absorb unpublished branch snapshots, even when their
    sequences fall inside the window."""
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_toy_pdf(0, 10), schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.create_branch("audit")
    t.append(
        spark.createDataFrame(_toy_pdf(10, 15), schema=it.PAGES_ICE_SCHEMA),
        sequence=20, branch="audit",
    )
    t.append(
        spark.createDataFrame(_toy_pdf(20, 24), schema=it.PAGES_ICE_SCHEMA),
        sequence=30,
    )
    got = _sorted_rows(t.read_incremental(from_seq=10))
    assert got == _expected_rows(_toy_pdf(20, 24))  # main delta only
    assert t.published_sequence() == 30


def test_branch_schema_private_until_publish(spark, tmp_table):
    """Branch schema evolution must not change main readers' column set
    before publish; publish folds it into the table schema."""
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_toy_pdf(0, 8), schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.create_branch("audit")
    evolved = it._merge_schema(
        it.PAGES_ICE_SCHEMA,
        T.StructType([T.StructField("http_status", T.IntegerType(), True)]),
    )
    staged = _toy_pdf(8, 12).assign(http_status=200)
    t.append(
        spark.createDataFrame(staged, schema=evolved), sequence=20,
        branch="audit",
    )
    # main: neither the rows nor the new column are visible
    main_df = t.read()
    assert "http_status" not in main_df.columns
    assert main_df.count() == 8
    # audit read carries the evolved schema
    audit_df = t.read(ref="audit")
    assert "http_status" in audit_df.columns
    assert audit_df.count() == 12
    t.publish_branch("audit")
    pub = t.read()
    assert "http_status" in pub.columns
    assert pub.filter(F.col("http_status") == 200).count() == 4


def test_expire_preserves_unpublished_branch(spark, tmp_table):
    """Snapshot expiry must not strand a staged branch: every snapshot of
    a LIVE branch survives (publish needs the chain to the fork point);
    dropping the ref releases them."""
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_toy_pdf(0, 6), schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.create_branch("audit")
    for seq, lo in ((20, 6), (21, 9)):
        t.append(
            spark.createDataFrame(
                _toy_pdf(lo, lo + 3), schema=it.PAGES_ICE_SCHEMA
            ),
            sequence=seq, branch="audit",
        )
    t.expire_snapshots(keep_sequences_from=50)
    # the staged chain survived and publishes cleanly
    t.publish_branch("audit")
    assert t.read().count() == 12


def test_rollback_snapshot_ids_stay_unique_with_branches(spark, tmp_table):
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_toy_pdf(0, 5), schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    first = t._resolve_snapshot(t.metadata(), None, None)["snapshot_id"]
    t.append(
        spark.createDataFrame(_toy_pdf(5, 8), schema=it.PAGES_ICE_SCHEMA),
        sequence=20,
    )
    t.create_branch("audit")
    t.append(
        spark.createDataFrame(_toy_pdf(8, 10), schema=it.PAGES_ICE_SCHEMA),
        sequence=30, branch="audit",
    )
    t.rollback(first, sequence=40)
    ids = [s["snapshot_id"] for s in t.snapshots()]
    assert len(ids) == len(set(ids))  # no collision with the branch head
    # main reverted; the branch forked from the pre-rollback head -> the
    # fast-forward check reports divergence instead of corrupting refs
    assert t.read().count() == 5
    with pytest.raises(ValueError):
        t.publish_branch("audit")


def test_takedown_during_audit_blocks_publish(spark, tmp_table):
    """Safety interaction of MOR deletes and WAP: a takedown committed to
    MAIN while an audit branch is staged moves the main head, so the
    fast-forward check refuses the publish — the takedown can never be
    silently lost by publishing a branch that forked before it. The
    operator re-stages from the post-takedown head."""
    t = it.IceTable.create(
        spark, tmp_table,
        spark.createDataFrame(_toy_pdf(0, 12), schema=it.PAGES_ICE_SCHEMA),
        TRANSFORMS, sequence=10,
    )
    t.create_branch("audit")
    t.append(
        spark.createDataFrame(_toy_pdf(12, 15), schema=it.PAGES_ICE_SCHEMA),
        sequence=20, branch="audit",
    )
    # legal takedown lands on main mid-audit
    t.delete_rows(_keys_df(spark, _urls(0, 3)), sequence=30)
    with pytest.raises(ValueError):
        t.publish_branch("audit")
    # main honors the takedown; re-staging from the new head publishes
    assert t.read().count() == 9
    t.drop_ref("audit")
    t.create_branch("audit")
    t.append(
        spark.createDataFrame(_toy_pdf(12, 15), schema=it.PAGES_ICE_SCHEMA),
        sequence=40, branch="audit",
    )
    t.publish_branch("audit")
    got = _sorted_rows(t.read())
    assert got == _expected_rows(
        pd.concat([_toy_pdf(0, 12)[3:], _toy_pdf(12, 15)])
    )


def test_pandas_writer_content_addressed_parts(spark, tmp_table):
    """Review finding (r3): pandas part files are content-addressed —
    identical frames re-stage byte-identically under the SAME names
    (staging idempotency), while different rows for the same target
    version get DIFFERENT names, so a version-race loser can never
    clobber bytes a winner's committed manifest references."""
    from enem_spark.sources.icetable import _write_data_pandas

    pdf = _toy_pdf(0, 6)
    e1 = _write_data_pandas(tmp_table, pdf, it.PAGES_ICE_SCHEMA, [], 1)
    bytes1 = {
        e["path"]: open(os.path.join(tmp_table, e["path"]), "rb").read()
        for e in e1
    }
    e2 = _write_data_pandas(tmp_table, pdf, it.PAGES_ICE_SCHEMA, [], 1)
    assert [e["path"] for e in e1] == [e["path"] for e in e2]
    for e in e2:
        assert open(os.path.join(tmp_table, e["path"]), "rb").read() == bytes1[e["path"]]
    # different content, same target version -> disjoint part names
    other = _toy_pdf(50, 56)
    e3 = _write_data_pandas(tmp_table, other, it.PAGES_ICE_SCHEMA, [], 1)
    assert not ({e["path"] for e in e3} & set(bytes1))
