"""SemDeDup (cluster-pruned semantic dedup) vs a pure-Python oracle and
the DuckDB SQL oracle (the future registry row's other half).

The Python oracle re-implements the whole rule with explicit left-fold
float arithmetic — the same sequential order the Spark expressions and
the DuckDB `+` chains use — so parity is exact, not approximate."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators.semantic_dedup import (
    semantic_dup_pairs,
    semdedup,
    with_semantic_cells,
)
from datafusion_uwheel_spark.operators.similarity import ivf_centroids
from datafusion_uwheel_spark.oracles import semdedup_pairs_sql, semdedup_sql

DIM = 8
K = 3
CENTS = ivf_centroids(DIM, K, seed=7)
T = 0.92


def _fold_dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s = s + float(x) * float(y)
    return s


def _norm(a):
    return _fold_dot(a, a) ** 0.5


def _round(x, nd=6):
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-nd), ROUND_HALF_UP))


def _bf_rule(rows, cents, t, keep="low_centroid_sim", nd=6):
    """(pairs, dropped, kept) under the exact operator contract."""
    keyed = []
    for rid, v in rows:
        dots = [_fold_dot(v, c) for c in cents]
        cell = dots.index(max(dots)) + 1  # first argmax, 1-based
        denom = _norm(v) * _norm(cents[cell - 1])
        csim = None if denom == 0 else dots[cell - 1] / denom
        k = (
            ((-2.0 if csim is None else _round(csim, nd)), rid)
            if keep == "low_centroid_sim"
            else (rid,)
        )
        keyed.append((rid, v, cell, k))
    pairs = []
    for ra in keyed:
        for rb in keyed:
            if ra[2] != rb[2] or not (ra[3] < rb[3]):
                continue
            na, nb = _norm(ra[1]), _norm(rb[1])
            if na == 0 or nb == 0:
                continue
            sim = _round(_fold_dot(ra[1], rb[1]) / (na * nb), nd)
            if sim >= t:
                pairs.append((ra[0], rb[0], ra[2], sim))
    dropped = {p[1] for p in pairs}
    kept = [rid for rid, *_ in keyed if rid not in dropped]
    return pairs, dropped, kept


@pytest.fixture(scope="module")
def synth(spark):
    import random

    rng = random.Random(11)
    rows = []
    rid = 0
    # three tight bundles of near-duplicates + background noise + a zero vec
    for _ in range(3):
        base = [rng.uniform(-1, 1) for _ in range(DIM)]
        for _ in range(4):
            rows.append((rid, [x + rng.uniform(-0.01, 0.01) for x in base]))
            rid += 1
    for _ in range(12):
        rows.append((rid, [rng.uniform(-1, 1) for _ in range(DIM)]))
        rid += 1
    rows.append((rid, [0.0] * DIM))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    # the BF oracle must see the FLOAT32-narrowed values Spark stores
    stored = [(r["vec_id"], list(r["embedding"])) for r in df.collect()]
    return df, sorted(stored)


@pytest.mark.parametrize("kernel", [True, False], ids=["kernel", "expr"])
def test_pairs_match_python_oracle(spark, synth, kernel):
    df, rows = synth
    exp_pairs, _, _ = _bf_rule(rows, CENTS, T)
    got = sorted(
        (r["id_keep"], r["id_drop"], r["cell"], r["sim"])
        for r in semantic_dup_pairs(
            df, CENTS, threshold=T, use_pandas_udf=kernel
        ).collect()
    )
    assert got == sorted(exp_pairs)
    assert len(got) >= 3  # the seeded bundles guarantee a non-trivial test


@pytest.mark.parametrize("kernel", [True, False], ids=["kernel", "expr"])
def test_semdedup_keeps_exactly_the_unflagged(spark, synth, kernel):
    df, rows = synth
    _, _, exp_kept = _bf_rule(rows, CENTS, T)
    out = semdedup(df, CENTS, threshold=T, use_pandas_udf=kernel)
    assert sorted(r["vec_id"] for r in out.collect()) == sorted(exp_kept)
    assert out.columns == df.columns


def test_min_id_keep_policy(spark, synth):
    df, rows = synth
    exp_pairs, _, exp_kept = _bf_rule(rows, CENTS, T, keep="min_id")
    got = sorted(
        (r["id_keep"], r["id_drop"]) for r in
        semantic_dup_pairs(df, CENTS, threshold=T, keep="min_id").collect()
    )
    assert got == sorted((a, b) for a, b, *_ in exp_pairs)
    # min_id: id_keep < id_drop always
    assert all(a < b for a, b in got)
    kept = semdedup(df, CENTS, threshold=T, keep="min_id")
    assert sorted(r["vec_id"] for r in kept.collect()) == sorted(exp_kept)


def test_idempotent(spark, synth):
    """Survivors contain no pair above threshold (every survivor had no
    earlier similar item), so a second pass drops nothing."""
    df, _ = synth
    once = semdedup(df, CENTS, threshold=T)
    twice = semdedup(once, CENTS, threshold=T)
    assert sorted(r["vec_id"] for r in twice.collect()) == sorted(
        r["vec_id"] for r in once.collect()
    )


def test_zero_vector_always_kept(spark, synth):
    df, rows = synth
    zid = max(r[0] for r in rows)  # the appended zero vector
    kept = {r["vec_id"] for r in semdedup(df, CENTS, threshold=-1.0).collect()}
    assert zid in kept
    cells = with_semantic_cells(df, CENTS)
    zrow = cells.filter(F.col("vec_id") == zid).head()
    assert zrow["csim"] is None


def test_large_k_assignment_kernel_bit_equal(spark, synth):
    """The plan-size guard (k > max_expr_centroids) swaps the O(k)-plan
    expression assignment for the Arrow kernel; the sequential component
    folds make the swap bit-invisible — (cell, csim) must be EXACTLY the
    expression path's, including the zero vector's NULLs (r11 ADVICE:
    the expression forms blow up plan analysis at the paper's k ~ N/1000)."""
    df, _ = synth
    expr = sorted(
        (r["vec_id"], r["cell"], r["csim"])
        for r in with_semantic_cells(df, CENTS).select(
            "vec_id", "cell", "csim"
        ).collect()
    )
    kern = sorted(
        (r["vec_id"], r["cell"], r["csim"])
        for r in with_semantic_cells(
            df, CENTS, max_expr_centroids=0
        ).select("vec_id", "cell", "csim").collect()
    )
    assert kern == expr
    # a genuinely large k (> default bound) routes to the kernel on its
    # own and still folds bit-equal to the expression plan
    big = ivf_centroids(DIM, 70, seed=13)
    expr_big = sorted(
        (r["vec_id"], r["cell"], r["csim"])
        for r in with_semantic_cells(
            df, big, max_expr_centroids=1_000
        ).select("vec_id", "cell", "csim").collect()
    )
    auto_big = sorted(
        (r["vec_id"], r["cell"], r["csim"])
        for r in with_semantic_cells(df, big).select(
            "vec_id", "cell", "csim"
        ).collect()
    )
    assert auto_big == expr_big
    # pairs/semdedup derive solely from (cell, csim, vec), so (cell, csim)
    # equality pins the end-to-end pass across the switch; sanity: the
    # large-k pass still runs end-to-end through the kernel assignment
    assert semdedup(df, big, threshold=0.9).count() > 0


def test_nan_and_null_element_vectors_null_on_both_paths(spark):
    """r12 ADVICE: unguarded, a NaN element rides Spark's NaN-is-largest
    ordering through array_max/array_position to a REAL cell on the
    expression path, while the Arrow kernel (which cannot distinguish a
    NULL element from NaN in a float64 batch) masks the row — crossing
    the k > max_expr_centroids boundary would silently change cell/csim.
    The contract is now: NaN-carrying, NULL-element, NULL, and
    wrong-width vectors all get (cell NULL, csim NULL) on BOTH paths."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),  # valid
        (1, [float("nan"), 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),  # NaN elem
        (2, [None, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),  # NULL elem
        (3, None),  # NULL vector
        (4, [0.0] * DIM),  # zero vector: real cell, NULL csim
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for k_cap in (1_000, 0):  # expression path, then kernel path
        got = {
            r["vec_id"]: (r["cell"], r["csim"])
            for r in with_semantic_cells(
                df, CENTS, max_expr_centroids=k_cap
            ).collect()
        }
        assert got[0][0] is not None and got[0][1] is not None, k_cap
        for rid in (1, 2, 3):
            assert got[rid] == (None, None), (k_cap, rid, got[rid])
        assert got[4][0] is not None and got[4][1] is None, k_cap
    # and the invalid rows never pair (they pass through semdedup kept)
    kept = {r["vec_id"] for r in semdedup(df, CENTS, threshold=0.5).collect()}
    assert {1, 2, 3, 4} <= kept


def test_duckdb_oracle_parity_real_table(spark, sf_small_dir):
    emb = spark.read.parquet(f"{sf_small_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").head()[0])
    cents = ivf_centroids(dim, 8, seed=42)
    t = 0.98
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_small_dir}/embeddings.parquet'"
    )
    exp = sorted(
        tuple(r) for r in con.execute(
            semdedup_pairs_sql(cents, t, dim=dim)
        ).fetchall()
    )
    for kernel in (False, True):  # both paths equal the SQL oracle
        got = sorted(
            (r["id_keep"], r["id_drop"], r["cell"], r["sim"])
            for r in semantic_dup_pairs(
                emb, cents, threshold=t, use_pandas_udf=kernel
            ).collect()
        )
        assert got == exp, f"kernel={kernel}"
    kept = sorted(
        r["vec_id"] for r in semdedup(emb, cents, threshold=t).collect()
    )
    exp_kept = sorted(
        r[0] for r in con.execute(
            semdedup_sql(cents, t, dim=dim, select="vec_id")
        ).fetchall()
    )
    assert kept == exp_kept


def test_no_cartesian_and_no_python_in_plan(spark, synth):
    """Expression path (the oracle-mirrored spec): pure JVM, no cartesian.
    Kernel path: exactly one grouped-map Pandas stage over the cell
    shuffle — Python is the point there, but never a cartesian."""
    df, _ = synth
    phys = (
        semantic_dup_pairs(df, CENTS, threshold=T, use_pandas_udf=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in phys and "BroadcastNestedLoopJoin" not in phys
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys
    kphys = (
        semantic_dup_pairs(df, CENTS, threshold=T, use_pandas_udf=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FlatMapGroupsInPandas" in kphys
    assert "CartesianProduct" not in kphys and "Join" not in kphys


def test_max_cell_rows_guard(spark, synth):
    df, _ = synth
    with pytest.raises(ValueError, match="max_cell_rows"):
        semantic_dup_pairs(df, CENTS, threshold=T, max_cell_rows=2)
    # generous cap passes through
    assert semantic_dup_pairs(df, CENTS, threshold=T, max_cell_rows=10_000).count() >= 0


# ----------------------------------------------- engine + handle routing
@pytest.fixture(scope="module")
def sim_engine(spark, sf_small_dir, tmp_path_factory):
    from datafusion_uwheel_spark import SimilarityEngine

    emb = spark.read.parquet(f"{sf_small_dir}/embeddings.parquet")
    eng = SimilarityEngine(
        spark, "embeddings", emb, dim=64,
        index_root=str(tmp_path_factory.mktemp("semdd_idx")),
    )
    return eng, emb


def _pairs_set(df):
    return sorted(
        (r["id_keep"], r["id_drop"], r["cell"], r["sim"]) for r in df.collect()
    )


def test_engine_routes_query_time_then_indexed(spark, sim_engine):
    eng, emb = sim_engine
    t = 0.4
    before = _pairs_set(eng.semdedup_pairs(t))
    assert eng.last_route.kind == "query_time"
    eng.build_index(kind="ivf", n_centroids=8)
    after = _pairs_set(eng.semdedup_pairs(t))
    assert eng.last_route.kind == "indexed"
    assert after == before  # stored cells ARE the seeded assignment
    assert len(after) > 0
    kept = eng.semdedup(t)
    assert eng.last_route.kind == "indexed"
    dropped = {p[1] for p in after}
    assert sorted(r["vec_id"] for r in kept.collect()) == sorted(
        r["vec_id"] for r in emb.collect() if r["vec_id"] not in dropped
    )
    assert kept.columns == emb.columns


def test_trained_handle_uses_manifest_centroids(spark, sim_engine):
    from datafusion_uwheel_spark.operators.semantic_dedup import (
        semantic_dup_pairs as _op,
    )

    eng, emb = sim_engine
    idx = eng.build_index(kind="ivf", n_centroids=8, train=True)
    assert idx.m["centroids"]  # trained quantizer pinned in the manifest
    got = _pairs_set(idx.semdedup_pairs(0.4))
    exp = _pairs_set(_op(emb, idx.m["centroids"], 0.4))
    assert got == exp and len(got) > 0


def test_quantized_handle_refused(spark, sim_engine):
    eng, _ = sim_engine
    idx = eng.build_index(kind="ivf", n_centroids=8, quantize="int8")
    with pytest.raises(ValueError, match="exact cosines"):
        idx.semdedup_pairs(0.4)


def test_lsh_handle_refused(spark, sim_engine):
    eng, _ = sim_engine
    idx = eng.build_index(kind="lsh", bits=4, tables=2)
    with pytest.raises(ValueError, match="IVF"):
        idx.semdedup_pairs(0.4)


def test_stale_index_falls_back(spark, sf_small_dir, tmp_path_factory):
    from datafusion_uwheel_spark import SimilarityEngine

    emb = spark.read.parquet(f"{sf_small_dir}/embeddings.parquet")
    eng = SimilarityEngine(
        spark, "embeddings", emb, dim=64,
        index_root=str(tmp_path_factory.mktemp("semdd_stale")),
        max_delta_fraction=0.0,
    )
    eng.build_index(kind="ivf", n_centroids=8)
    fresh = _pairs_set(eng.semdedup_pairs(0.4))
    assert eng.last_route.kind == "indexed"
    eng.append(emb.limit(0).unionByName(emb.limit(3)))  # any delta trips 0.0
    stale = _pairs_set(eng.semdedup_pairs(0.4))
    assert eng.last_route.kind == "query_time"
    assert eng.last_route.detail.get("reason") == "stale"
    # fallback runs over the UNCHANGED source df -> identical pairs
    assert stale == fresh


def test_arg_validation(spark, synth):
    df, _ = synth
    with pytest.raises(ValueError):
        semantic_dup_pairs(df, CENTS, threshold=1.5)
    with pytest.raises(ValueError):
        semantic_dup_pairs(df, CENTS, keep="nope")
    with pytest.raises(ValueError):
        with_semantic_cells(df, [])
