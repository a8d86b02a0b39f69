"""SimilarityEngine: registry hit, query-time fallback, and parity between
the two physical paths (VERDICT r2 item 3 — indexed path is the default
path, mirroring the wheel registry's route-or-delegate)."""

from __future__ import annotations

import random

import pytest

from datafusion_uwheel_spark import SimilarityEngine
from datafusion_uwheel_spark.operators import similarity
from datafusion_uwheel_spark.sources import read_parquet

DIM = 64
K = 10
_rng = random.Random(123)
QUERY = [round(_rng.uniform(-1.0, 1.0), 6) for _ in range(DIM)]


@pytest.fixture(scope="module")
def emb(spark, sf_small_dir):
    return read_parquet(spark, f"{sf_small_dir}/embeddings.parquet")


@pytest.fixture()
def engine(spark, emb, tmp_path):
    return SimilarityEngine(
        spark, "embeddings", emb, dim=DIM, index_root=str(tmp_path)
    )


def test_fallback_when_no_index(engine, emb):
    got = engine.topk(QUERY, k=K, kind="lsh", bits=4, tables=2).collect()
    assert engine.last_route.kind == "query_time"
    want = similarity.ann_topk(emb, QUERY, k=K, bits=4, tables=2).collect()
    assert got == want


def test_registry_hit_same_results(engine, emb):
    engine.build_index(kind="lsh", bits=4, tables=2)
    got = engine.topk(QUERY, k=K, kind="lsh", bits=4, tables=2).collect()
    assert engine.last_route.kind == "indexed"
    want = similarity.ann_topk(emb, QUERY, k=K, bits=4, tables=2).collect()
    assert got == want
    # Different parameters than the built index → falls back, not a wrong
    # answer from a mismatched index.
    engine.topk(QUERY, k=K, kind="lsh", bits=8, tables=2).collect()
    assert engine.last_route.kind == "query_time"


def test_ivf_route_and_fallback(engine, emb):
    engine.build_index(kind="ivf", n_centroids=8)
    got = engine.topk(QUERY, k=K, kind="ivf", nprobe=2, n_centroids=8).collect()
    assert engine.last_route.kind == "indexed"
    want = similarity.ivf_topk(emb, QUERY, k=K, nprobe=2, n_centroids=8).collect()
    assert got == want
    engine.topk(QUERY, k=K, kind="ivf", nprobe=2, n_centroids=16).collect()
    assert engine.last_route.kind == "query_time"


def test_exact_kind(engine, emb):
    got = engine.topk(QUERY, k=K, kind="exact").collect()
    assert engine.last_route.kind == "exact"
    assert got == similarity.cosine_topk(emb, QUERY, k=K).collect()


def test_dup_pairs_route_and_parity(engine, emb):
    want = sorted(
        map(tuple, similarity.embedding_dup_pairs(
            emb, threshold=0.4, bits=8, tables=2, dim=DIM
        ).collect())
    )
    got_fallback = sorted(map(tuple, engine.dup_pairs(0.4, bits=8, tables=2).collect()))
    assert engine.last_route.kind == "query_time"
    engine.build_index(kind="lsh", bits=8, tables=2)
    got_indexed = sorted(map(tuple, engine.dup_pairs(0.4, bits=8, tables=2).collect()))
    assert engine.last_route.kind == "indexed"
    assert got_fallback == want
    assert got_indexed == want


def test_dup_clusters_transitive_groups(engine):
    """Pairs → connected components through the engine: members agree with
    a union-find over the same pair set, survivors are the min ids."""
    pairs = [(r["id_a"], r["id_b"]) for r in engine.dup_pairs(0.4, bits=8, tables=2).collect()]
    got = {
        r["id"]: r["cluster_id"]
        for r in engine.dup_clusters(0.4, bits=8, tables=2).collect()
    }
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want and len(got) > 0


def test_trained_index_not_registered_for_seeded_routing(engine):
    idx = engine.build_index(kind="ivf", n_centroids=4, train=True, train_sample=256, train_iters=2)
    assert idx.m["centroids"]  # pinned in manifest
    engine.topk(QUERY, k=K, kind="ivf", n_centroids=4).collect()
    assert engine.last_route.kind == "query_time"  # trained never serves seeded
    with pytest.raises(ValueError):
        engine.register_index(idx)


def test_register_index_rejects_dim_mismatch(spark, engine, tmp_path):
    idx = engine.build_index(kind="lsh", bits=4, tables=2)
    other = SimilarityEngine(spark, "other", engine.df, dim=32)
    with pytest.raises(ValueError):
        other.register_index(idx)


def test_drop_index_restores_fallback(engine):
    engine.build_index(kind="lsh", bits=4, tables=2)
    engine.topk(QUERY, k=2, kind="lsh", bits=4, tables=2).collect()
    assert engine.last_route.kind == "indexed"
    assert engine.drop_index("lsh", bits=4, tables=2)
    assert not engine.drop_index("lsh", bits=4, tables=2)
    engine.topk(QUERY, k=2, kind="lsh", bits=4, tables=2).collect()
    assert engine.last_route.kind == "query_time"


# --------------------------------------------- kernel/expression equivalence
def test_lsh_kernel_matches_expression_path(emb):
    a = similarity.with_lsh_buckets(emb, DIM, bits=8, tables=3, use_pandas_udf=True)
    b = similarity.with_lsh_buckets(emb, DIM, bits=8, tables=3, use_pandas_udf=False)
    cols = ["vec_id", "bucket_0", "bucket_1", "bucket_2"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_ivf_kernel_matches_expression_path(emb):
    cents = similarity.ivf_centroids(DIM, 8)
    a = similarity.with_ivf_cells(emb, cents, use_pandas_udf=True)
    b = similarity.with_ivf_cells(emb, cents, use_pandas_udf=False)
    cols = ["vec_id", "cell"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_kernels_null_and_ragged_vectors(spark):
    rows = [
        (1, [0.5] * 4),
        (2, None),           # NULL vector
        (3, [0.5, 0.5]),     # ragged (wrong dim)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["bucket_0"], r["cell"])
        for r in similarity.with_ivf_cells(
            similarity.with_lsh_buckets(df, 4, bits=4, tables=1),
            similarity.ivf_centroids(4, 2),
        ).collect()
    }
    want = {
        r["vec_id"]: (r["bucket_0"], r["cell"])
        for r in similarity.with_ivf_cells(
            similarity.with_lsh_buckets(df, 4, bits=4, tables=1, use_pandas_udf=False),
            similarity.ivf_centroids(4, 2),
            use_pandas_udf=False,
        ).collect()
    }
    assert got == want
    assert got[2] == (0, None)  # NULL vec → bucket 0, cell NULL


def test_registry_save_load_round_trip(spark, emb, tmp_path):
    eng = SimilarityEngine(
        spark, "embeddings", emb, dim=DIM, index_root=str(tmp_path)
    )
    eng.build_index(kind="lsh", bits=4, tables=2)
    eng.build_index(kind="ivf", n_centroids=8)
    reg = eng.save_registry()
    fresh = SimilarityEngine(spark, "embeddings", emb, dim=DIM)
    assert fresh.load_registry(reg) == 2
    got = fresh.topk(QUERY, k=K, kind="lsh", bits=4, tables=2).collect()
    assert fresh.last_route.kind == "indexed"
    assert got == eng.topk(QUERY, k=K, kind="lsh", bits=4, tables=2).collect()
    wrong_dim = SimilarityEngine(spark, "embeddings", emb.limit(1), dim=32)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        wrong_dim.load_registry(reg)


# ------------------------------------------------------------- batch kNN join
def test_knn_join_matches_per_query_probes(engine, emb):
    """Every query's rows from the batch join must equal that query's
    single-vector indexed probe — same candidates, same rerank, same
    tiebreak."""
    idx = engine.build_index(kind="lsh", bits=4, tables=2)
    qs = emb.limit(5)
    got = idx.knn_join(qs, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["sim"], r["rank"]))
    for qrow in qs.collect():
        want = [
            (r["vec_id"], r["sim"], i + 1)
            for i, r in enumerate(idx.topk(list(qrow["embedding"]), k=3).collect())
        ]
        assert sorted(by_q[qrow["vec_id"]]) == sorted(want)


def test_knn_join_ivf_matches_probes(engine, emb):
    idx = engine.build_index(kind="ivf", n_centroids=8)
    qs = emb.limit(4)
    got = idx.knn_join(qs, k=3, nprobe=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["sim"]))
    for qrow in qs.collect():
        want = [
            (r["vec_id"], r["sim"])
            for r in idx.topk(list(qrow["embedding"]), k=3, nprobe=2).collect()
        ]
        assert sorted(by_q[qrow["vec_id"]]) == sorted(want)


def test_engine_knn_join_routes_and_refuses(engine, emb):
    qs = emb.limit(3)
    with pytest.raises(ValueError, match="no registered"):
        engine.knn_join(qs, k=2, kind="lsh", bits=4, tables=2)
    engine.build_index(kind="lsh", bits=4, tables=2)
    out = engine.knn_join(qs, k=2, kind="lsh", bits=4, tables=2)
    assert engine.last_route.kind == "indexed"
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {r["vec_id"] for r in qs.collect()}
    assert all(r["rank"] <= 2 for r in rows)


def test_knn_join_drops_invalid_query_vectors(engine, emb):
    """NULL / wrong-dimension query vectors must yield NO rows (ADVICE r3:
    the LSH kernel would otherwise fold them to bucket 0 and return
    plausible-looking neighbours with NULL sim)."""
    from pyspark.sql import functions as F

    idx = engine.build_index(kind="lsh", bits=4, tables=2)
    good = emb.select("vec_id", "embedding").limit(2)
    bad = good.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.when(F.col("vec_id").isNull(), F.col("embedding")).alias("embedding"),
    ).union(
        good.select(
            (F.col("vec_id") + 2_000_000).alias("vec_id"),
            F.slice(F.col("embedding"), 1, 3).alias("embedding"),
        )
    )
    rows = idx.knn_join(good.unionByName(bad), k=2).collect()
    qids = {r["query_id"] for r in rows}
    assert qids == {r["vec_id"] for r in good.collect()}
    assert all(r["sim"] is not None for r in rows)


def test_engine_knn_join_exact_is_ground_truth(engine, emb):
    """Exact kNN join top-1 for a query that IS an index row must be the
    row itself at sim 1.0, and indexed recall ⊆ exact candidates."""
    qs = emb.limit(3)
    exact = engine.knn_join(qs, k=1, kind="exact").collect()
    assert engine.last_route.kind == "exact"
    for r in exact:
        assert r["query_id"] == r["vec_id"] and r["sim"] == 1.0


def test_cosine_topk_matches_duckdb_real_table(spark, sf_small_dir):
    """Funding for the r12 registry rotation (sim_topk_bruteforce out for
    decon_fuzzy): the retired row's DuckDB hash check moves here verbatim —
    exact fold-cosine top-k over the real embeddings table vs
    oracles.cosine_topk_sql, same seeded query vector as the registry row.
    The fold kernel itself stays hash-checked every round through
    sim_ivf_topk / sim_knn_join's exact rerank."""
    import duckdb

    from datafusion_uwheel_spark.oracles import cosine_topk_sql

    rng = random.Random(123)
    qvec = [round(rng.uniform(-1.0, 1.0), 6) for _ in range(64)]
    emb = read_parquet(spark, f"{sf_small_dir}/embeddings.parquet")
    got = sorted(
        (r["vec_id"], r["sim"])
        for r in similarity.cosine_topk(emb, qvec, k=10).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_small_dir}/embeddings.parquet'"
    )
    exp = sorted(
        tuple(r)
        for r in con.execute(cosine_topk_sql(qvec, k=10, dim=64)).fetchall()
    )
    assert got == exp and len(got) == 10


def test_dup_pairs_match_duckdb_real_table(engine, emb, sf_medium_dir, spark):
    """Funding for the r13 registry rotation (sim_dup_pairs_indexed out
    for dedup_exact_keep): the retired row's DuckDB hash check moves here
    verbatim — the bits=8 LSH near-dup pairs at the registry threshold
    (0.4) vs oracles.embedding_dup_pairs_sql, exact, at the driver's
    comparison scale (sf0.01). The route taken here is query-time; the
    indexed route returns the identical pair set, pinned by
    test_dup_pairs_route_and_parity above."""
    import duckdb

    from datafusion_uwheel_spark import SimilarityEngine
    from datafusion_uwheel_spark.oracles import embedding_dup_pairs_sql

    emb_real = read_parquet(spark, f"{sf_medium_dir}/embeddings.parquet")
    eng = SimilarityEngine(spark, "embeddings_r13", emb_real, dim=DIM)
    got = sorted(
        map(
            tuple,
            eng.dup_pairs(0.4, bits=8, tables=2)
            .select("id_a", "id_b", "sim")
            .collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_medium_dir}/embeddings.parquet'"
    )
    exp = sorted(
        map(
            tuple,
            con.execute(
                embedding_dup_pairs_sql(0.4, dim=DIM, bits=8, tables=2)
            ).fetchall(),
        )
    )
    assert got == exp and len(got) > 0
