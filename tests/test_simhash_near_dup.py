"""Completeness guard for the banded SimHash near-dup operator: the
pigeonhole candidate join must find EXACTLY the pairs a brute-force
all-pairs hamming scan finds (banding is a pruning, never a recall loss,
whenever max_hamming < bands)."""

from __future__ import annotations

import hashlib
import itertools
import re

import pytest

from enem_spark import textops

SF_DIR = "/root/testdata/sf0.001"


def _simhash_py(text: str) -> str:
    """Pure-python mirror of textops.simhash (md5 nibble parity; beyond 32
    bits the hash extends with md5('1:' || token), same as the engine)."""
    toks = re.split(r"\s+", text.strip())
    sums = [0] * textops.SIMHASH_BITS
    for w in toks:
        h = hashlib.md5(w.encode()).hexdigest()
        if textops.SIMHASH_BITS > 32:
            h += hashlib.md5(("1:" + w).encode()).hexdigest()
        for j in range(textops.SIMHASH_BITS):
            sums[j] += 1 if h[j] in "13579bdf" else -1
    return "".join("1" if s >= 0 else "0" for s in sums)


@pytest.fixture(scope="module")
def docs(spark):
    """Corpus + planted exact copies and one-token mutants: at 64 bits the
    raw corpus has no near-collisions, so without planting the differential
    would compare two empty sets."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    did = F.col("doc_id")
    df = base.unionByName(
        base.filter(did % 4 == 0).select((did + 10000).alias("doc_id"), "text")
    ).unionByName(
        base.filter(did % 4 == 1).select(
            (did + 20000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" mutanttoken")).alias("text"),
        )
    )
    return df, {r.doc_id: r.text for r in df.collect()}


def _brute_pairs(texts: dict, max_hamming: int) -> set:
    sigs = {d: _simhash_py(t) for d, t in texts.items()}
    out = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        ham = sum(x != y for x, y in zip(sigs[a], sigs[b]))
        if ham <= max_hamming:
            out.add((a, b, ham))
    return out


@pytest.mark.parametrize("max_hamming", [0, 2, 3])
def test_banded_equals_brute_force(docs, max_hamming):
    df, texts = docs
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in textops.simhash_near_dup(df, max_hamming=max_hamming).collect()
    }
    assert got == _brute_pairs(texts, max_hamming)


def test_pigeonhole_guard():
    with pytest.raises(ValueError):
        textops.simhash_near_dup(None, max_hamming=4, bands=4)
    with pytest.raises(ValueError):
        textops.simhash_near_dup(None, max_hamming=-1, bands=4)
    with pytest.raises(ValueError):
        textops.simhash_near_dup(None, max_hamming=2, bands=5)


def test_no_cartesian_in_plan(spark, docs):
    df, _ = docs
    plan = textops.simhash_near_dup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
