"""Cross-table LSH near-dup join + fuzzy decontamination vs the DuckDB
oracle, plus the motivating case: an EDITED leak the exact n-gram guard
misses and the fuzzy guard flags."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators import contamination, dedup
from datafusion_uwheel_spark.oracles import fuzzy_decon_sql, lsh_join_sql

T = 0.35


def _sig(df, text="text", id_col=None):
    sel = df if id_col is None else df.select(id_col, text)
    return dedup.with_minhash_signature(sel, text=text)


def test_lsh_join_matches_duckdb(spark, sf_small_dir):
    docs = spark.read.parquet(f"{sf_small_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    left = docs.filter(F.col("doc_id") % 2 == 0)
    right = docs.filter(F.col("doc_id") % 2 == 1)
    pairs = dedup.lsh_join(
        _sig(left), _sig(right), min_est_jaccard=T
    )
    got = sorted(
        (r["id_left"], r["id_right"], round(r["est_jaccard"], 9))
        for r in pairs.collect()
    )
    dedup.release_signatures(pairs)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_small_dir}/documents.parquet'"
    )
    exp = sorted(
        (a, b, round(e, 9))
        for a, b, e in con.execute(
            lsh_join_sql(
                T,
                "SELECT doc_id AS id, text FROM documents WHERE doc_id % 2 = 0",
                "SELECT doc_id AS id, text FROM documents WHERE doc_id % 2 = 1",
            )
        ).fetchall()
    )
    assert got == exp
    assert len(got) > 0  # the synthetic corpus carries cross-half near-dups


def test_fuzzy_decon_matches_duckdb(spark, sf_small_dir):
    docs = spark.read.parquet(f"{sf_small_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    held = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.substring("text", 1, 400).alias("text")
    )
    out = contamination.with_contamination_fuzzy(
        docs, held, min_est_jaccard=0.5
    )
    got = sorted(
        (r["doc_id"], round(r["max_est_jaccard"], 6))
        for r in out.filter("contaminated").collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_small_dir}/documents.parquet'"
    )
    exp = sorted(
        (i, round(e, 6))
        for i, e in con.execute(fuzzy_decon_sql(0.5)).fetchall()
    )
    assert got == exp
    # every held-out source doc leaks against its own truncated snippet
    assert len(got) >= held.count() // 2 and len(got) > 0


def test_fuzzy_catches_edited_leak_exact_misses(spark):
    """The motivating case: every 8th word of the leaked passage was
    edited, so no 13 consecutive tokens survive (the exact guard sees
    nothing) — but 3-gram shingle overlap stays high and the fuzzy
    guard flags the document."""
    base = ("the quarterly benchmark question about synthetic market "
            "dynamics considers how agents respond when liquidity "
            "vanishes overnight and prices gap through every stop level "
            "while volatility doubles across correlated assets ") * 3
    words = base.split()
    edited = [
        (w.upper() + "x") if i % 8 == 4 else w for i, w in enumerate(words)
    ]
    train = spark.createDataFrame(
        [(1, " ".join(edited)), (2, "completely unrelated text about gardening tips")],
        "doc_id long, text string",
    )
    held = spark.createDataFrame([(9, base)], "doc_id long, text string")
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in contamination.with_contamination(train, held, n=13).collect()
    }
    assert exact == {1: False, 2: False}  # the edit defeats verbatim 13-grams
    # recall tuning matters: a ~0.38-estimated leak almost never agrees on
    # a full 4-row band (P ≈ J⁴ per band), so the default bands=8 misses
    # it — 2-row bands (bands=16) catch it. The guard exposes the knob for
    # exactly this reason.
    fuzzy8 = {
        r["doc_id"]: r["contaminated"]
        for r in contamination.with_contamination_fuzzy(
            train, held, min_est_jaccard=0.3
        ).collect()
    }
    assert fuzzy8 == {1: False, 2: False}
    fuzzy16 = {
        r["doc_id"]: (round(r["max_est_jaccard"], 3), r["contaminated"])
        for r in contamination.with_contamination_fuzzy(
            train, held, min_est_jaccard=0.3, bands=16
        ).collect()
    }
    assert fuzzy16 == {1: (0.375, True), 2: (0.0, False)}


def test_fuzzy_unmatched_docs_zero_and_schema(spark):
    train = spark.createDataFrame(
        [(1, "some words that are long enough to shingle properly"),
         (2, "")],
        "doc_id long, text string",
    )
    held = spark.createDataFrame(
        [(9, "nothing in common with the training rows at all today")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["max_est_jaccard"], r["contaminated"])
        for r in contamination.with_contamination_fuzzy(
            train, held, min_est_jaccard=0.9
        ).collect()
    }
    assert rows == {1: (0.0, False), 2: (0.0, False)}


def test_lsh_join_low_cap_parity(spark, sf_small_dir):
    """Cross-table twin of the cap-claim regression: with a tight per-side
    cap, pairs whose earlier agreeing band was dropped must still arrive
    through later bands, matching the oracle exactly."""
    docs = spark.read.parquet(f"{sf_small_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    left = docs.filter(F.col("doc_id") % 2 == 0)
    right = docs.filter(F.col("doc_id") % 2 == 1)
    pairs = dedup.lsh_join(
        _sig(left), _sig(right), min_est_jaccard=T, max_bucket_size=2
    )
    got = sorted(
        (r["id_left"], r["id_right"], round(r["est_jaccard"], 9))
        for r in pairs.collect()
    )
    dedup.release_signatures(pairs)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_small_dir}/documents.parquet'"
    )
    exp = sorted(
        (a, b, round(e, 9))
        for a, b, e in con.execute(
            lsh_join_sql(
                T,
                "SELECT doc_id AS id, text FROM documents WHERE doc_id % 2 = 0",
                "SELECT doc_id AS id, text FROM documents WHERE doc_id % 2 = 1",
                max_bucket_size=2,
            )
        ).fetchall()
    )
    assert got == exp


def test_decontaminate_fuzzy_release_hook(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    out = contamination.decontaminate_fuzzy(df, df, min_est_jaccard=0.99)
    out.collect()
    assert out._uw_release() is True


def test_release_hook_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    out = contamination.with_contamination_fuzzy(df, df, min_est_jaccard=0.5)
    out.collect()
    assert out._uw_release() is True
    with pytest.raises(ValueError):
        contamination.with_contamination_fuzzy(df, df, min_est_jaccard=0.0)
    with pytest.raises(ValueError):
        dedup.lsh_join(_sig(df), _sig(df), k=32, bands=7)  # 7 doesn't divide 32


def test_decontaminate_fuzzy_drops_flagged(spark, sf_small_dir):
    docs = spark.read.parquet(f"{sf_small_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    held = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.substring("text", 1, 400).alias("text")
    )
    flagged = {
        r["doc_id"]
        for r in contamination.with_contamination_fuzzy(docs, held, 0.5)
        .filter("contaminated")
        .collect()
    }
    kept = {
        r["doc_id"]
        for r in contamination.decontaminate_fuzzy(docs, held, 0.5).collect()
    }
    everyone = {r["doc_id"] for r in docs.collect()}
    assert kept == everyone - flagged and flagged


def test_fuzzy_decon_broadcasts_the_heldout_side(spark, sf_small_dir):
    """r15 verdict #4: the banded bucket join must BROADCAST the bounded
    held-out side — the training side is then never exchanged by band key
    (at 100 TB that exchange was the operator's dominant shuffle) — and
    the broadcast hint must not change a single verdict."""
    docs = spark.read.parquet(f"{sf_small_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    held = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.substring("text", 1, 300).alias("text")
    )
    out = contamination.with_contamination_fuzzy(docs, held, 0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # no sort-merge band join anywhere in the pairs pipeline
    assert "SortMergeJoin [__band" not in plan, plan
    got = {
        (r["doc_id"], r["contaminated"], round(r["max_est_jaccard"], 9))
        for r in out.collect()
    }
    out._uw_release()
    # same verdicts without the hint (the r14 shape)
    from datafusion_uwheel_spark.operators.dedup import (
        lsh_join,
        with_minhash_signature,
    )

    ho = held.select(
        F.monotonically_increasing_id().alias("__ho_id"),
        F.col("text").alias("__ho_text"),
    )
    pairs = lsh_join(
        with_minhash_signature(docs.select("doc_id", "text"), text="text", n=3),
        with_minhash_signature(ho, text="__ho_text", n=3),
        left_id="doc_id",
        right_id="__ho_id",
        min_est_jaccard=0.5,
        broadcast_right=False,
    )
    worst = pairs.groupBy("id_left").agg(
        F.max("est_jaccard").alias("m")
    )
    ref = {
        (r["doc_id"], r["m"] is not None and r["m"] >= 0.5,
         round(r["m"] if r["m"] is not None else 0.0, 9))
        for r in docs.join(
            worst.select(F.col("id_left").alias("doc_id"), "m"),
            on="doc_id", how="left",
        ).collect()
    }
    assert got == ref
