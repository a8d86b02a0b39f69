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


# ------------------------------------------------------------ bloom path
def test_bloom_matches_exact_rowforrow(spark, corpora):
    """prefilter + verify ≡ exact: the bloom has no false negatives and
    the verify join removes every false positive, so values match
    row-for-row — not just the contaminated flag."""
    docs, held = corpora
    n = 8
    exact = {
        r["doc_id"]: (r["n_shared_ngrams"], r["contaminated"])
        for r in contamination.with_contamination(docs, held, n=n).collect()
    }
    got = {
        r["doc_id"]: (r["n_shared_ngrams"], r["contaminated"])
        for r in contamination.with_contamination_bloom(docs, held, n=n).collect()
    }
    assert got == exact
    assert any(v[1] for v in exact.values())  # non-trivial


def test_bloom_decontaminate_matches_exact(spark, corpora):
    docs, held = corpora
    n = 8
    exact = {r["doc_id"] for r in contamination.decontaminate(docs, held, n=n).collect()}
    got = {
        r["doc_id"]
        for r in contamination.decontaminate_bloom(docs, held, n=n).collect()
    }
    assert got == exact


def test_bloom_tiny_fpp_and_sizing_override(spark, corpora):
    """expected_items skips the sizing count; an aggressive fpp still
    yields exact results (FPs only ever add verify work)."""
    docs, held = corpora
    n = 8
    exact = {
        (r["doc_id"], r["n_shared_ngrams"])
        for r in contamination.with_contamination(docs, held, n=n).collect()
    }
    got = {
        (r["doc_id"], r["n_shared_ngrams"])
        for r in contamination.with_contamination_bloom(
            docs, held, n=n, fpp=0.5, expected_items=100
        ).collect()
    }
    assert got == exact


def test_bloom_empty_heldout_flags_nothing(spark, corpora):
    docs, _ = corpora
    held = spark.createDataFrame([], "doc_id long, text string")
    out = contamination.with_contamination_bloom(docs.limit(10), held, n=8)
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["n_shared_ngrams"] == 0 and not r["contaminated"] for r in rows)
    # schema matches the exact operator's (driver-compare discipline)
    exact = contamination.with_contamination(docs.limit(10), held, n=8)
    assert [f.name for f in out.schema.fields] == [f.name for f in exact.schema.fields]
    assert [f.dataType for f in out.schema.fields] == [
        f.dataType for f in exact.schema.fields
    ]


def test_bloom_prefilter_plan_has_no_join_before_verify(spark, corpora):
    """The corpus gram stream must hit uw_might_contain as a plain Filter
    (no join, no shuffle) — the whole point of the bloom path. The verify
    join exists downstream, but the prefilter Filter must reference the
    function."""
    docs, held = corpora
    plan = contamination.with_contamination_bloom(
        docs, held, n=8
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan
    # still zero Python in the row path
    phys = contamination.with_contamination_bloom(
        docs, held, n=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys


def test_bloom_fallback_without_shim(spark, corpora, monkeypatch):
    """A shim-less session answers identically through the exact join,
    with a visible warning."""
    import warnings

    docs, held = corpora
    monkeypatch.setattr(contamination, "_ensure_bloom_fns", lambda s: False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = contamination.with_contamination_bloom(docs.limit(20), held, n=8)
        rows = {r["doc_id"]: r["n_shared_ngrams"] for r in out.collect()}
    assert any("exact join" in str(x.message) for x in w)
    exact = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in contamination.with_contamination(docs.limit(20), held, n=8).collect()
    }
    assert rows == exact


def test_bloom_rejects_bad_args(spark, corpora):
    docs, held = corpora
    with pytest.raises(ValueError):
        contamination.with_contamination_bloom(docs, held, n=0)
    with pytest.raises(ValueError):
        contamination.with_contamination_bloom(docs, held, fpp=0.0)
    with pytest.raises(ValueError):
        contamination.with_contamination_bloom(docs, held, fpp=1.0)
    # a 0 NDV estimate with a real held-out set must refuse, not silently
    # size-for-nothing and report every doc clean
    with pytest.raises(ValueError):
        contamination.with_contamination_bloom(docs, held, expected_items=0)
