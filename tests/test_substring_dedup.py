"""Exact substring-span dedup (operators/substring.py) — the ExactSubstr
pass: fixed-window duplicated-gram spans + the remove-all-but-one mask.

Three-way pinning: Spark rows vs a brute-force Python oracle (independent
tokenize/count/island implementation) AND vs the DuckDB oracle SQL
(oracles.substring_spans_sql — the future registry row's other half)."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pandas as pd
import pytest

from datafusion_uwheel_spark.operators.substring import (
    duplicate_spans,
    mask_duplicate_spans,
)
from datafusion_uwheel_spark.oracles import substring_spans_sql

W = 4  # window small enough to plant passages by hand

BOILER = "all rights reserved by the example corporation of somewhere"
PASSAGE = "the quick brown fox jumps over the lazy dog again today"

DOCS = [
    (1, f"intro text one {BOILER} and a unique tail here"),
    (2, f"{BOILER} opens this second document with different words after"),
    (3, f"totally unique document three with {PASSAGE} inside the middle"),
    (4, f"{PASSAGE} starts document four then rambles on uniquely forever"),
    (5, "short doc"),  # < window tokens: emits no windows
    (6, None),  # NULL text
    (7, "  "),  # blank text -> empty token array
    (8, "self repeat zone alpha beta gamma delta self repeat zone alpha "
        "beta gamma delta end"),  # within-doc duplicate
]


def _bf_spans(docs, window, min_count=2, cross_doc=False, keep_first=False):
    toks = {
        d: t.split()
        for d, t in docs
        if t is not None and t.strip()
    }
    occ = defaultdict(list)
    for d, t in toks.items():
        for p in range(len(t) - window + 1):
            occ[" ".join(t[p : p + window])].append((d, p))
    dup = []
    for lst in occ.values():
        if len(lst) < min_count:
            continue
        if cross_doc and len({d for d, _ in lst}) < 2:
            continue
        lst = sorted(lst)
        dup.extend(lst[1:] if keep_first else lst)
    by_doc = defaultdict(set)
    for d, p in dup:
        by_doc[d].add(p)
    spans = []
    for d, ps in by_doc.items():
        ps = sorted(ps)
        start = prev = ps[0]
        cnt = 1
        for p in ps[1:]:
            if p - prev > window:
                spans.append((d, start, prev + window, cnt))
                start, cnt = p, 0
            prev = p
            cnt += 1
        spans.append((d, start, prev + window, cnt))
    return sorted(spans)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_spans_match_bruteforce_and_duckdb(spark, docs_df):
    got = _rows(duplicate_spans(docs_df, window=W))
    assert got == _bf_spans(DOCS, W)
    assert got  # the fixture genuinely plants duplicates
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(DOCS, columns=["doc_id", "text"])
    )
    oracle = [
        tuple(r)
        for r in con.execute(substring_spans_sql(window=W)).fetchall()
    ]
    assert got == oracle


def test_cross_doc_excludes_within_doc_repeats(spark, docs_df):
    all_spans = _rows(duplicate_spans(docs_df, window=W))
    cross = _rows(duplicate_spans(docs_df, window=W, cross_doc=True))
    assert cross == _bf_spans(DOCS, W, cross_doc=True)
    # doc 8's self-repeat is flagged only without the cross_doc gate
    assert any(r[0] == 8 for r in all_spans)
    assert not any(r[0] == 8 for r in cross)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    assert cross == [
        tuple(r)
        for r in con.execute(
            substring_spans_sql(window=W, cross_doc=True)
        ).fetchall()
    ]


def test_keep_first_exempts_first_occurrence(spark, docs_df):
    kept = _rows(duplicate_spans(docs_df, window=W, keep_first=True))
    assert kept == _bf_spans(DOCS, W, keep_first=True)
    # the boilerplate's first occurrence (doc 1) is exempt; doc 2 flagged
    flagged = {r[0] for r in kept}
    assert 2 in flagged and 4 in flagged
    # doc 1's boiler windows are all first occurrences -> doc 1 only
    # appears if some OTHER gram dups there (it doesn't in this fixture)
    assert 1 not in flagged and 3 not in flagged


def test_hashed_matches_exact(spark, docs_df):
    exact = _rows(duplicate_spans(docs_df, window=W))
    hashed = _rows(duplicate_spans(docs_df, window=W, hashed=True))
    assert hashed == exact


def test_mask_removes_all_but_one_copy(spark, docs_df):
    out = {
        r["doc_id"]: r["text_dedup"]
        for r in mask_duplicate_spans(docs_df, window=W).collect()
    }
    # keep_first=True default: doc 1 keeps the boiler, doc 2 loses it
    assert BOILER in out[1]
    assert BOILER not in out[2]
    assert PASSAGE in out[3]
    assert PASSAGE not in out[4]
    # untouched docs come back whitespace-normalized but content-identical
    assert out[5] == "short doc"
    assert out[6] is None
    assert out[7] == ""
    # each doc's unique tails survive masking
    assert "unique tail here" in out[1]
    assert "different words after" in out[2]
    # masked corpus has no cross-doc duplicated window left except the
    # kept first copies: re-running spans with keep_first finds nothing
    remasked = mask_duplicate_spans(
        spark.createDataFrame(
            [(k, v) for k, v in out.items()], "doc_id int, text string"
        ),
        window=W,
    )
    again = {r["doc_id"]: r["text_dedup"] for r in remasked.collect()}
    assert again == out  # idempotent: one pass converged


def test_mask_without_keep_first_removes_every_copy(spark, docs_df):
    out = {
        r["doc_id"]: r["text_dedup"]
        for r in mask_duplicate_spans(
            docs_df, window=W, keep_first=False
        ).collect()
    }
    assert BOILER not in out[1] and BOILER not in out[2]


def test_short_window_and_param_validation(spark, docs_df):
    with pytest.raises(ValueError, match="window"):
        duplicate_spans(docs_df, window=0)
    with pytest.raises(ValueError, match="min_count"):
        duplicate_spans(docs_df, min_count=1)
    # a window longer than every doc: no spans at all
    assert _rows(duplicate_spans(docs_df, window=500)) == []


def test_no_python_row_path(spark, docs_df):
    # the whole pipeline is JVM expressions + joins/windows: no
    # BatchEvalPython / ArrowEvalPython stage anywhere in the plan
    plan = duplicate_spans(docs_df, window=W)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    plan2 = mask_duplicate_spans(docs_df, window=W)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan2
