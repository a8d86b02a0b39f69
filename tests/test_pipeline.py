"""Curation pipeline composition + engine index-management API."""

from __future__ import annotations

import pytest

from datafusion_uwheel_spark import WheelEngine
from datafusion_uwheel_spark.operators import pipeline


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs into the field"),
        (2, "the quick brown fox jumps over the lazy dog and runs into the field"),
        (3, "der hund ist ein gutes tier und das ist auch gut so"),
        (4, "1 2 3 4 5 6 7 8 9 0 1 2 3 4 5"),
        (5, "ok"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_pipeline(docs):
    out = pipeline.curate(
        docs,
        steps=[
            pipeline.length_filter(min_tokens=3),
            pipeline.lang_filter(("en",)),
            pipeline.quality_filter(min_score=0.5),
        ],
    )
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert kept == [1]  # 2 exact-dup, 3 German, 4 digits (low quality), 5 short


def test_curate_without_dedup(docs):
    out = pipeline.curate(docs, steps=[pipeline.length_filter(min_tokens=3)],
                          exact_dedup=False)
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert kept == [1, 2, 3, 4]


def test_index_management(spark, minimal_agg):
    eng = WheelEngine(spark, "mgmt_tbl", minimal_agg, time_column="timestamp",
                      min_max_columns=("agg_col",))
    eng.build_index("agg_col")
    eng.build_index("agg_col", filter="agg_col >= 5.0")
    meta = eng.list_indexes()
    assert {m["kind"] for m in meta} == {"count", "min_max", "agg"}
    assert any(m["filter"] == "agg_col >= 5.0" for m in meta)
    assert all(m["size_bytes"] >= 0 for m in meta)

    epoch = eng.index_epoch
    assert eng.drop_index("agg_col", filter="agg_col >= 5.0")
    assert eng.index_epoch == epoch + 1
    assert not eng.drop_index("agg_col", filter="agg_col >= 5.0")  # already gone
    sql = "SELECT SUM(agg_col) AS s FROM mgmt_tbl WHERE timestamp >= '2024-05-10 00:00:00' AND timestamp < '2024-05-10 00:00:10' AND agg_col >= 5.0"
    assert eng.explain_route(sql).kind == "delegate"  # keyed wheel dropped


def test_curate_with_domain_cap_and_normalization(spark):
    from datafusion_uwheel_spark.operators.pipeline import (
        curate,
        domain_cap,
        normalize_text,
    )

    rows = [
        (i, f"doc  {i}\twith   spaces", "hot" if i < 8 else "cold")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate(
        df,
        steps=[normalize_text(), domain_cap("source", 3)],
        exact_dedup=False,
    )
    got = out.collect()
    # normalization appended text_norm with collapsed whitespace
    assert all("  " not in r["text_norm"] and "\t" not in r["text_norm"] for r in got)
    # hot source capped at 3 (lowest ids kept), cold kept whole
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert sorted(by_src["hot"]) == [0, 1, 2]
    assert sorted(by_src["cold"]) == [8, 9]
