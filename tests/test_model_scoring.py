"""Model-scoring injection point (operators/model_scoring.py): the
classifier-filter pipeline stage. The model itself is injected (no ML
libraries in this container — the multimodal decoder-injection
discipline), so the contract under test is the PLUMBING: exact scores vs
a driver-side mirror, null handling, micro-batch slicing, row-alignment
failure, lazy per-worker model loading, and the narrow single-pass plan
shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators.model_scoring import (
    filter_by_score,
    score_texts,
)
from datafusion_uwheel_spark.sources import read_parquet


def _mk_vowel_scorer():
    """Deterministic stand-in 'model': vowel fraction in [0, 1]. Built as
    a CLOSURE so cloudpickle ships it by value — a module-level function
    in a test file pickles by reference and the executors cannot import
    the test module."""

    def scorer(texts: list) -> list:
        out = []
        for t in texts:
            n = len(t)
            out.append(sum(c in "aeiouAEIOU" for c in t) / n if n else 0.0)
        return out

    return scorer


def _ref_score(text: str) -> float:
    """Driver-side reference mirror of the vowel scorer."""
    n = len(text)
    return sum(c in "aeiouAEIOU" for c in text) / n if n else 0.0


def _mk_lazy_model():
    """The lazy callable-object pattern: pickling ships the config; the
    'weights' (here, the vowel set) load on first call and cache on self
    — amortized across the micro-batches of ONE TASK (a by-value pickle
    re-deserializes per task; true per-worker caching needs a
    module-level cache in an importable module, per the operator's
    docstring). Defined in local scope so cloudpickle serializes the
    CLASS by value (same reason as _mk_vowel_scorer)."""

    class LazyModel:
        def __init__(self):
            self._weights = None
            self.loads = 0

        def __call__(self, texts: list) -> list:
            if self._weights is None:
                self._weights = set("aeiouAEIOU")  # the 'model load'
                self.loads += 1
            return [
                (sum(c in self._weights for c in t) / len(t) if t else 0.0)
                for t in texts
            ]

    return LazyModel()


@pytest.fixture(scope="module")
def docs(spark, sf_small_dir):
    return read_parquet(spark, f"{sf_small_dir}/documents.parquet")


def test_scores_match_driver_mirror(spark, docs):
    """Exact parity with the same function applied driver-side — the
    Arrow plumbing must not reorder, drop, or misalign rows."""
    scored = score_texts(docs, _mk_vowel_scorer()).select("doc_id", "score")
    got = {r["doc_id"]: r["score"] for r in scored.collect()}
    want = {
        r["doc_id"]: _ref_score(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    assert got == want and len(got) == docs.count()


def test_null_texts_score_null_without_model_calls(spark):
    """NULL texts never reach the model: encode the model's view into the
    scores (executor-side closures can't report back through driver
    lists) — every scored row proves its call saw only non-null texts."""

    def counting(texts):
        assert all(t is not None for t in texts)  # executor-side guard
        return [float(len(texts))] * len(texts)

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "id long, text string"
    ).coalesce(1)
    rows = {r["id"]: r["score"] for r in score_texts(df, counting).collect()}
    # the single call saw exactly the TWO non-null texts
    assert rows == {1: 2.0, 2: None, 3: 2.0, 4: None}


def test_nan_scores_normalize_to_null_and_are_dropped(spark):
    """A model returning NaN (numeric failure) must NOT pass the filter:
    Spark sorts NaN above every double, so an un-normalized NaN score
    would survive ANY >= threshold — the broken documents kept."""
    df = spark.createDataFrame(
        [(1, "good"), (2, "bad")], "id long, text string"
    )
    scored = score_texts(
        df, lambda ts: [1.0 if t == "good" else float("nan") for t in ts]
    )
    rows = {r["id"]: r["score"] for r in scored.collect()}
    assert rows == {1: 1.0, 2: None}
    kept = filter_by_score(
        df, lambda ts: [1.0 if t == "good" else float("nan") for t in ts],
        threshold=0.5,
    )
    assert [r["id"] for r in kept.collect()] == [1]

    # np.float32 NaN — the commonest REAL model dtype — must land NULL
    # too. This pins the END-TO-END contract (whichever layer enforces
    # it: the operator's explicit normalization, or the pandas->Arrow
    # serializer's NaN masking) — a future output path that stops
    # masking must still never leak a NaN score
    def np32(ts):
        import numpy as np

        return list(
            np.asarray(
                [1.0 if t == "good" else float("nan") for t in ts],
                dtype=np.float32,
            )
        )

    rows32 = {r["id"]: r["score"] for r in score_texts(df, np32).collect()}
    assert rows32[2] is None and rows32[1] == 1.0


def test_non_string_column_rejected_and_case_insensitive_resolution(spark):
    """Non-string text columns raise (their NULLs surface as pandas NaN
    and would be scored as the literal 'nan'); column resolution is
    case-insensitive like Spark's analyzer."""
    df = spark.createDataFrame([(1, 2.5)], "id long, Text double")
    with pytest.raises(ValueError, match="not string"):
        score_texts(df, _mk_vowel_scorer(), text_column="text")
    sdf = spark.createDataFrame([(1, "aeiou")], "id long, Text string")
    rows = score_texts(sdf, _mk_vowel_scorer(), text_column="text").collect()
    assert rows[0]["score"] == 1.0
    with pytest.raises(ValueError, match="already exists"):
        score_texts(sdf, _mk_vowel_scorer(), text_column="Text",
                    output_column="TEXT")
    # case-variant COLLISIONS raise instead of silently picking one
    # (an exact-name match is not asserted: under the default
    # caseSensitive=false Spark itself cannot operate on such frames —
    # the guard exists so the OPERATOR never silently picks a column)
    amb = spark.createDataFrame(
        [(1, "a", "b")], "id long, Text string, text string"
    )
    with pytest.raises(ValueError, match="ambiguous"):
        score_texts(amb, _mk_vowel_scorer(), text_column="TEXT")


def test_duplicate_exact_name_columns_rejected(spark):
    """r10 ADVICE: duplicate EXACT names are legal in Spark DataFrames
    (e.g. after a join) but pdf[text_column] inside the mapInPandas
    worker would return a two-column DataFrame instead of a Series —
    an opaque executor-side failure; and df.schema[name] silently
    type-checks only the first duplicate. Reject up front, driver-side."""
    df = spark.createDataFrame([(1, "a")], "id long, text string")
    dup = df.select("id", "text", "text")
    with pytest.raises(ValueError, match="appears 2 times"):
        score_texts(dup, _mk_vowel_scorer())


def test_model_micro_batches_respect_batch_size(spark):
    """The scorer must never see more than batch_size texts per call,
    regardless of Arrow batch sizing — encode each call's size into its
    scores so the property survives the executor boundary."""

    def size_scorer(texts):
        return [float(len(texts))] * len(texts)

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "id long, text string"
    ).coalesce(1)
    scores = [
        r["score"]
        for r in score_texts(df, size_scorer, batch_size=7).collect()
    ]
    assert len(scores) == 100
    assert all(1.0 <= s <= 7.0 for s in scores)
    assert max(scores) == 7.0  # 100 texts in one partition: full calls exist


def test_misaligned_scorer_output_raises(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, text string")
    with pytest.raises(Exception, match="refusing to misalign"):
        # one extra score per call — wrong for every batch size
        score_texts(df, lambda ts: [1.0] * (len(ts) + 1)).collect()


def test_scorer_none_scores_pass_through_and_validation(spark, docs):
    """A model abstaining with None yields a NULL score; missing scorer
    and bad args raise with guidance."""
    df = spark.createDataFrame([(1, "ab"), (2, "cd")], "id long, text string")
    rows = score_texts(
        df, lambda ts: [None] * len(ts)
    ).select("score").collect()
    assert [r["score"] for r in rows] == [None, None]
    with pytest.raises(NotImplementedError, match="injected model"):
        score_texts(df, None)
    with pytest.raises(ValueError, match="batch_size"):
        score_texts(df, _mk_vowel_scorer(), batch_size=0)
    with pytest.raises(ValueError, match="no column"):
        score_texts(df, _mk_vowel_scorer(), text_column="nope")
    with pytest.raises(ValueError, match="already exists"):
        score_texts(df, _mk_vowel_scorer(), output_column="text")


def test_lazy_model_object_loads_and_scores(spark, docs):
    """The callable-object pattern pickles cleanly and scores identically
    to the plain function — the per-worker weight cache is executor-side
    state the driver copy never sees (its loads stays 0)."""
    model = _mk_lazy_model()
    got = {
        r["doc_id"]: r["score"]
        for r in score_texts(docs, model).select("doc_id", "score").collect()
    }
    want = {
        r["doc_id"]: _ref_score(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    assert got == want
    assert model.loads == 0  # driver copy untouched; loading is per-worker


def test_filter_by_score_pipeline(spark, docs):
    """The classifier-filter stage: threshold semantics (NULL drops),
    schema control, and agreement with a manual score-then-filter."""
    thr = 0.3
    kept = filter_by_score(docs, _mk_vowel_scorer(), thr)
    manual = [
        r["doc_id"]
        for r in docs.select("doc_id", "text").collect()
        if _ref_score(r["text"]) >= thr
    ]
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(manual)
    assert "score" in kept.columns
    assert (kept.agg(F.min("score")).collect()[0][0] or thr) >= thr
    bare = filter_by_score(docs, _mk_vowel_scorer(), thr, keep_score=False)
    assert bare.columns == docs.columns
    # abstentions (None) are dropped, the conservative default
    df = spark.createDataFrame([(1, "aaa"), (2, "zzz")], "id long, text string")
    kept2 = filter_by_score(
        df, lambda ts: [1.0 if "a" in t else None for t in ts], 0.5
    )
    assert [r["id"] for r in kept2.collect()] == [1]


def test_single_narrow_pass_plan(docs):
    """Scoring + filtering is ONE narrow stage: no Exchange (shuffle) in
    the physical plan — the property that makes this a 100 TB-safe
    pipeline stage (parallel scan, fused filter, nothing wide)."""
    plan = filter_by_score(
        docs, _mk_vowel_scorer(), 0.3
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1200]
    assert plan.count("MapInPandas") == 1, plan[:1200]


def test_cached_scorer_loads_once_per_worker_process(spark):
    """The shipped per-worker weight cache (CachedScorer, r10): N tasks →
    at most 1 loader call per worker PROCESS. The loader bumps a counter
    in the worker's module-global cache and bakes (count, pid) into every
    score; with 32 single-row-group tasks on local[4], reused workers run
    several tasks each — so (a) every observed load count must be 1, and
    (b) the distinct-pid count must be well under the task count, proving
    the cache survived ACROSS tasks in a process, not merely within one."""
    from datafusion_uwheel_spark.operators.model_scoring import CachedScorer

    def loader():
        import os

        import datafusion_uwheel_spark.operators.model_scoring as ms

        n = ms._WORKER_MODEL_CACHE.get("__test_loads", 0) + 1
        ms._WORKER_MODEL_CACHE["__test_loads"] = n
        pid = os.getpid()
        return lambda texts: [float(n * 10_000_000 + pid)] * len(texts)

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(64)], "id long, text string"
    ).repartition(32)
    scores = [
        r["score"]
        for r in score_texts(df, CachedScorer("test-weights-v1", loader)).collect()
    ]
    assert len(scores) == 64
    loads = {int(s) // 10_000_000 for s in scores}
    pids = {int(s) % 10_000_000 for s in scores}
    assert loads == {1}, f"a worker loaded the model more than once: {loads}"
    assert len(pids) < 32, "no worker process was reused across tasks"


def test_cached_scorer_token_validation_and_sharing(spark):
    from datafusion_uwheel_spark.operators import model_scoring as ms

    with pytest.raises(ValueError, match="token"):
        ms.CachedScorer("", lambda: None)
    with pytest.raises(ValueError, match="token"):
        ms.CachedScorer(123, lambda: None)
    # driver-side call path: same token shares one model instance, and a
    # loader returning None still caches (1-tuple wrapping)
    calls = []

    def loader():
        calls.append(1)
        return lambda texts: [0.5] * len(texts)

    a = ms.CachedScorer("tok-shared", loader)
    b = ms.CachedScorer("tok-shared", loader)
    try:
        assert a(["x"]) == [0.5] and b(["y", "z"]) == [0.5, 0.5]
        assert len(calls) == 1
    finally:
        ms._WORKER_MODEL_CACHE.pop("tok-shared", None)


def test_third_generation_evicts_first_and_reloads(monkeypatch):
    """The r10 cache bound under real contention (r10 verdict #7): a third
    token generation evicts the oldest-inserted entry, and the evicted
    loader RELOADS on next use with its own weights — never a stale score
    from a superseded generation. Driver-side call path: deterministic
    (same insertion-order dict semantics the worker runs)."""
    from datafusion_uwheel_spark.operators import model_scoring as ms

    monkeypatch.setattr(ms, "_WORKER_MODEL_CACHE", {})
    loads = {"v1": 0, "v2": 0, "v3": 0}

    def mk(tok, val):
        def loader():
            loads[tok] += 1
            return lambda texts: [val] * len(texts)

        return ms.CachedScorer(f"gen-{tok}", loader)

    s1, s2, s3 = mk("v1", 1.0), mk("v2", 2.0), mk("v3", 3.0)
    assert s1(["x"]) == [1.0] and s2(["x"]) == [2.0]
    assert loads == {"v1": 1, "v2": 1, "v3": 0}
    assert s3(["x"]) == [3.0]  # third generation: the bound (2) evicts v1
    assert set(ms._WORKER_MODEL_CACHE) == {"gen-v2", "gen-v3"}
    # the evicted generation reloads on next use — fresh weights, correct
    # scores, and the reload in turn evicts the next-oldest (v2)
    assert s1(["x"]) == [1.0]
    assert loads == {"v1": 2, "v2": 1, "v3": 1}
    assert set(ms._WORKER_MODEL_CACHE) == {"gen-v3", "gen-v1"}
    # a reload of v2 still scores with v2's weights (no cross-token leak)
    assert s2(["y", "z"]) == [2.0, 2.0]
    assert loads["v2"] == 2


def test_eviction_across_reused_worker_no_stale_scores(spark):
    """Executor-boundary contention: four sequential stages (v1, v2, v3,
    then v1 again) through one-task jobs on reused workers. Every stage
    must score with ITS generation's weights (no stale entry served after
    eviction), and any worker process that ran v1 both times must show
    load count 2 — the eviction forced the reload."""
    from datafusion_uwheel_spark.operators.model_scoring import (
        CachedScorer,
        score_texts,
    )

    def mk(tok, val):
        def loader():
            import os

            import datafusion_uwheel_spark.operators.model_scoring as ms

            # side counter OUTSIDE the bounded cache (an in-cache counter
            # would itself be evicted): per-token loads in this process
            d = ms.__dict__.setdefault("_test_gen_loads", {})
            d[tok] = d.get(tok, 0) + 1
            n, pid = d[tok], os.getpid()
            return lambda texts: [val + n * 1e4 + pid * 1e8] * len(texts)

        return CachedScorer(f"egen-{tok}", loader)

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "id long, text string"
    ).repartition(1)
    seen = []  # (token, val, load_n, pid) per stage
    for tok, val in [("v1", 1.0), ("v2", 2.0), ("v3", 3.0), ("v1", 1.0)]:
        scores = {
            r["score"]
            for r in score_texts(df, mk(tok, val)).collect()
        }
        assert len(scores) == 1  # one worker, one load generation
        s = scores.pop()
        pid = int(s // 1e8)
        n = int((s - pid * 1e8) // 1e4)
        got_val = s - pid * 1e8 - n * 1e4
        assert got_val == val, f"stage {tok} scored stale weights: {s}"
        seen.append((tok, val, n, pid))
    first_v1, last_v1 = seen[0], seen[3]
    if first_v1[3] == last_v1[3]:
        # same worker process ran v1 both times: v3 evicted it in between,
        # so the second run must be load #2
        assert last_v1[2] == 2, seen
