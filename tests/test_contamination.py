"""N-gram decontamination vs a pure-Python oracle (exact n-gram set
arithmetic over the same normalization) — the train/eval leakage guard."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators import contamination


def _oracle_grams(text: str, n: int) -> set[str]:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def corpora(spark, sf_small_dir):
    docs = spark.read.parquet(f"{sf_small_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # held-out set: verbatim snippets of some docs (guaranteed overlap),
    # plus novel text (guaranteed none)
    rows = [r for r in docs.limit(6).collect()]
    held = [(100 + i, r["text"][: max(len(r["text"]) // 2, 200)]) for i, r in enumerate(rows[:3])]
    held.append((200, "entirely novel benchmark question about synthetic zebras " * 5))
    held_df = spark.createDataFrame(held, "doc_id long, text string")
    return docs, held_df


def test_matches_python_oracle(spark, corpora):
    docs, held = corpora
    n = 8
    got = {
        r["doc_id"]: (r["n_shared_ngrams"], r["contaminated"])
        for r in contamination.with_contamination(docs.limit(50), held, n=n).collect()
    }
    held_grams = set()
    for r in held.collect():
        held_grams |= _oracle_grams(r["text"], n)
    for r in docs.limit(50).collect():
        shared = len(_oracle_grams(r["text"], n) & held_grams)
        assert got[r["doc_id"]] == (shared, shared > 0), r["doc_id"]
    # the seeded verbatim snippets must actually be flagged
    assert sum(1 for v in got.values() if v[1]) >= 3


def test_decontaminate_drops_exactly_the_flagged(spark, corpora):
    docs, held = corpora
    n = 8
    flagged = {
        r["doc_id"]
        for r in contamination.with_contamination(docs, held, n=n)
        .filter("contaminated")
        .collect()
    }
    clean = contamination.decontaminate(docs, held, n=n)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    everyone = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert kept == everyone - flagged
    assert flagged  # the snippets guarantee a non-trivial test
    assert set(clean.columns) == set(docs.columns)


def test_short_docs_never_flagged(spark):
    train = spark.createDataFrame(
        [(1, "only five words right here"), (2, "tiny")],
        "doc_id long, text string",
    )
    held = spark.createDataFrame(
        [(9, "only five words right here and more")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["contaminated"]
        for r in contamination.with_contamination(train, held, n=13).collect()
    }
    assert out == {1: False, 2: False}


def test_normalization_catches_case_and_punct(spark):
    train = spark.createDataFrame(
        [(1, "The Quick, Brown Fox -- JUMPS over the lazy dog today!")],
        "doc_id long, text string",
    )
    held = spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    out = contamination.with_contamination(train, held, n=10).collect()[0]
    assert out["contaminated"] and out["n_shared_ngrams"] == 1


def test_no_udfs_in_plan(spark, corpora):
    docs, held = corpora
    plan = contamination.with_contamination(
        docs, held, n=13
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
