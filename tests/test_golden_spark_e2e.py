"""REAL reference text through the FULL Spark path.

test_oracle_golden.py inverts the committed goldens into raw page texts and
validates the pure-Python oracle byte-for-byte. This module closes the last
gap in that chain: the SAME golden-derived raw pages (real ENEM question
bodies, headers, barcodes, numbering gaps, answer-key text) are loaded as a
pages DataFrame and pushed through the distributed pipeline —
with_url_metadata -> page UDF -> numbering window -> broadcast key join ->
routing -> applyInPandas sinks — and the sink output must be byte-identical
to the reference's golden files. The layout-reconstruction rule is thereby
exercised end-to-end on text the reference actually produced, not only on
the synthetic corpus."""

from __future__ import annotations

import pandas as pd
import pytest

from enem_spark.extract import ExtractorConfig, extract_questions, render_sink_files

from test_oracle_golden import (
    D1_SUBJECTS,
    D2_SUBJECTS,
    GOLDEN_ROOT,
    build_answer_key_raw,
    doc_cases,
    load_golden_questions,
    reconstruct_pages,
)

CASES = list(doc_cases())


def _pages_df(spark, dirname: str):
    year_s, day = dirname.split("_")[:2]
    questions = load_golden_questions(dirname)
    pages = reconstruct_pages(questions)
    raw_answers = build_answer_key_raw(questions, day)
    # real INEP contract: D1 cadernos are colors 1-4, D2 colors 5-8 — and
    # the reference's day detection is a bare `"D1" in path`, which "CD1"
    # would false-positive on a D2 exam (the color ranges prevent it)
    color = "1" if day == "D1" else "5"
    prefix = f"cc://enem/{year_s}_PV_impresso_{day}_CD{color}"
    rows = [
        {
            "url": f"{prefix}/page/{idx}",
            "warc_ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=idx),
            "html": None,
            "text": text,
            "lang": "pt",
        }
        for idx, text in enumerate(pages)
        if idx >= 1  # page 0 = cover; absent upstream, skipped by F2 anyway
    ]
    rows.append(
        {
            "url": f"cc://enem/{year_s}_GB_impresso_{day}_CD{color}/page/0",
            "warc_ts": pd.Timestamp("2024-01-01"),
            "html": None,
            "text": raw_answers,
            "lang": "pt",
        }
    )
    from enem_spark.sources.documents_bridge import PAGES_SCHEMA

    return spark.createDataFrame(pd.DataFrame(rows), schema=PAGES_SCHEMA), prefix


@pytest.mark.parametrize("dirname", CASES)
@pytest.mark.parametrize("output_type", ["json", "txt"])
def test_spark_pipeline_reproduces_goldens(spark, dirname, output_type):
    pages_df, prefix = _pages_df(spark, dirname)
    cfg = ExtractorConfig(output_type=output_type, process_images=False)
    files = {
        f["filename"]: f["content"]
        for f in render_sink_files(extract_questions(pages_df, cfg), cfg).collect()
        if f["doc_id"] == prefix
    }
    year_s, day = dirname.split("_")[:2]
    subjects = D1_SUBJECTS if day == "D1" else D2_SUBJECTS
    for s in subjects:
        name = f"{year_s}_{s}_questions.{output_type}"
        golden = (GOLDEN_ROOT / dirname / name).read_text()
        assert files[name] == golden, f"{dirname}/{name} bytes differ (Spark path)"
