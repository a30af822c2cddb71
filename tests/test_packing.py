"""pack_sequences — kernel invariants + Spark/kernel agreement.

DuckDB value parity (tokenizer + kernel, materialized oracle) lives in
test_entry_parity; here the greedy-packing properties the hash can't
explain are pinned directly, plus Hypothesis over the pure kernel.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from enem_spark import packing

SF_DIR = "/root/testdata/sf0.01"


@given(
    st.lists(st.integers(min_value=0, max_value=300), max_size=60),
    st.integers(min_value=1, max_value=200),
)
@settings(max_examples=200, deadline=None)
def test_pack_bins_invariants(sizes, capacity):
    items = list(enumerate(sizes))
    out = packing.pack_bins(items, capacity)
    assert [d for d, *_ in out] == [d for d, _ in items]  # order preserved
    fills: dict[int, int] = {}
    last_bin = 0
    for doc_id, bin_id, offset, n_used in out:
        assert 0 <= n_used <= capacity
        assert n_used == min(sizes[doc_id], capacity)  # truncate-only
        assert bin_id >= last_bin  # bins open monotonically
        last_bin = bin_id
        assert offset == fills.get(bin_id, 0)  # dense within a bin
        fills[bin_id] = offset + n_used
    assert all(f <= capacity for f in fills.values())
    # greedy: a doc only starts a new bin when it truly didn't fit
    for i in range(1, len(out)):
        prev, cur = out[i - 1], out[i]
        if cur[1] != prev[1]:
            prev_fill = prev[2] + prev[3]
            assert prev_fill + cur[3] > capacity or prev_fill >= capacity


def test_spark_matches_kernel_per_shard(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        tuple(r) for r in packing.pack_sequences(docs).collect()
    )
    counts = sorted(
        (r.doc_id, r.n_tokens)
        for r in packing._shard_token_counts(docs, packing.PACK_SHARDS).collect()
    )
    exp = []
    for shard in range(packing.PACK_SHARDS):
        items = [
            (d, n) for d, n in counts if d % packing.PACK_SHARDS == shard
        ]
        for d, b, off, n in packing.pack_bins(items, packing.PACK_CAPACITY):
            exp.append((d, shard, b, off, n))
    assert got == sorted(exp)
    # packing must be total: every doc placed exactly once
    assert len(got) == docs.count()
