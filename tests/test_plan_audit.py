"""Physical-plan audit across the ENTIRE driver query inventory.

test_plan_shape.py checks a handful of operators in depth; this sweep is the
breadth guard: every `queries()` entry is built at sf0.001 and its plan text
is scanned for the three patterns that kill a 100 TB run —

- CartesianProduct: O(n^2) rows shipped; never acceptable.
- BatchEvalPython: a row-at-a-time (non-Arrow) Python UDF in the plan; every
  Python crossing in this engine must be Arrow-vectorized (ArrowEvalPython /
  FlatMapGroupsInPandas / MapInPandas).
- BroadcastNestedLoopJoin OUTSIDE the allowlist below. The allowlisted
  queries attach a bounded scalar/statistics frame via an explicit
  `crossJoin(F.broadcast(...))` — a 1-row aggregate (corpus N, priors,
  thresholds) or a tiny query/centroid set — where BNLJ over a one-row
  broadcast side IS the intended plan (a scalar subquery). Anything new
  showing a BNLJ must either justify itself onto the allowlist or fix its
  join keys.

Plan construction only (no .collect()); queries that stage driver stores in
/tmp pay their one-time staging cost here, which subsequent test sessions
reuse.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

QUERIES = entry_mod.queries()

# Every entry here corresponds to a crossJoin(F.broadcast(<bounded frame>))
# site; see classify.py, retrieval.py, simsearch.py, textops.py:1573 (tfidf
# corpus-N), htmlops.py:1426 (curate threshold row).
BNLJ_ALLOWED = {
    "ann_cosine_topk",  # simsearch.py:126 — broadcast query-vector set
    "ann_ivf_topk",  # simsearch.py:294/331 — broadcast centroid table
    "ann_ivf_store",  # same shape: broadcast STORED centroid table (the
    # corpus-side assignment crossJoin only runs for store-uncovered rows)
    "ann_ivf_probe",  # serving shape — external queries x broadcast cents
    "ann_pq_topk",  # simsearch.py pq_topk — broadcast per-query ADC tables
    # (5 rows x m*n_cent ints; the corpus side streams as codes)
    "bm25_search",  # retrieval.py:63 — broadcast corpus stats (1 row)
    "ccnet_buckets",  # textops.py:2004 — broadcast percentile cut row
    "char_lm_score",  # textops.py:2062 — broadcast model totals (1 row)
    "dsir_weights",  # textops.py:1870 — broadcast feature totals
    "html_curate",  # htmlops.py:1426 — broadcast threshold row
    "mixture_sample",  # broadcast per-source target-rate rows
    "nb_classifier",  # classify.py:55/78 — broadcast priors/totals
    "tfidf_top_terms",  # textops.py:1573 — broadcast corpus-N row
}


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_scale_killers(spark, name):
    plan = _plan(spark, QUERIES[name](spark, SF_DIR))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF (non-Arrow) in plan"
    )
    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNLJ_ALLOWED, (
            f"{name}: BroadcastNestedLoopJoin outside the scalar-broadcast "
            "allowlist — add equi-join keys or justify a bounded broadcast "
            "side in BNLJ_ALLOWED"
        )


def test_bnlj_allowlist_is_tight():
    # entries must name real queries (catch renames leaving stale grants)
    assert BNLJ_ALLOWED <= set(QUERIES), BNLJ_ALLOWED - set(QUERIES)
