"""Connected-component dup clustering: label propagation vs a union-find
oracle, transitive dedup semantics, and convergence guards."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators import dedup


def union_find(pairs):
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
    # canonical min-representative per member
    out = {}
    for x in list(parent):
        r = find(x)
        out[x] = min(out.get(r, r), r)
    return {x: find(x) for x in parent}


def clusters_of(df):
    return {r["id"]: r["cluster_id"] for r in df.collect()}


def test_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    got = clusters_of(dedup.dup_clusters(pairs))
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_transitive_closure_without_direct_pair(spark):
    """A≈B and B≈C must cluster A with C even though (A, C) never paired —
    the semantics pairwise dropping cannot express."""
    pairs = spark.createDataFrame([(30, 10), (10, 20)], "id_a long, id_b long")
    got = clusters_of(dedup.dup_clusters(pairs))
    assert got == {10: 10, 20: 10, 30: 10}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(10, 50))
            }
        )
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = clusters_of(dedup.dup_clusters(pairs))
        want = union_find(edges)
        assert got == want, (trial, edges)


def test_dedup_clustered_keeps_min_and_unpaired(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    kept = sorted(
        r["doc_id"] for r in dedup.dedup_clustered(docs, pairs).collect()
    )
    # clusters {1,2,3} -> keep 1; {5,6} -> keep 5; 4 and 7 unpaired -> kept
    assert kept == [1, 4, 5, 7]


def test_real_lsh_pairs_cluster(spark, sf_small_dir):
    from datafusion_uwheel_spark.sources import read_parquet

    docs = read_parquet(spark, f"{sf_small_dir}/documents.parquet")
    pairs = dedup.lsh_candidate_pairs(
        dedup.with_minhash_signature(docs), min_est_jaccard=0.35
    )
    edge_rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    dedup.release_signatures(pairs)
    if not edge_rows:
        pytest.skip("no candidate pairs at this SF")
    got = clusters_of(dedup.dup_clusters(pairs))
    assert got == union_find(edge_rows)
    # end-to-end: clustered dedup keeps exactly one doc per cluster
    kept = dedup.dedup_clustered(docs, pairs).count()
    n_losers = sum(1 for x, r in got.items() if x != r)
    assert kept == docs.count() - n_losers


def test_max_iter_guard(spark):
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dup_clusters(chain, max_iter=2)
    # and converges when allowed to run
    got = clusters_of(dedup.dup_clusters(chain, max_iter=40))
    assert set(got.values()) == {0}


def test_symmetric_edges_plan_shape(spark):
    """r15 regression pin: the edge list is built in ONE pass over the pair
    plan (no Union — the upstream pairs subplan must not execute twice)
    with ONE exchange (repartition-by-dst, reused by the dedup aggregate),
    and round 1's min-label aggregation adds NO exchange on top of the
    checkpointed layout."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3), (5, 6), (7, 7)],
        "id_a long, id_b long",
    )
    edges = dedup._symmetric_edges(pairs, "id_a", "id_b")
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan, plan
    assert plan.count("Exchange") == 1, plan

    # duplicate, reversed and self pairs collapse to one symmetric edge set
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == {(1, 2), (2, 1), (2, 3), (3, 2), (5, 6), (6, 5), (7, 7)}

    # the round-1 aggregation over the pinned checkpoint layout is
    # exchange-free (the r15 groupBy("dst") claim). A plain
    # localCheckpoint would NOT give this: under AQE the captured
    # LogicalRDD loses the hash partitioning — _pinned_checkpoint exists
    # exactly to keep it.
    ck = dedup._pinned_checkpoint(edges)
    round1 = ck.groupBy("dst").agg(F.min("src").alias("__nbr"))
    r1_plan = round1._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in r1_plan, r1_plan

    # and the per-round frontier join consumes the edge checkpoint without
    # re-exchanging it (the loop's 'partitioned once, reused every round'
    # claim, broken under AQE before the pinned capture)
    frontier = dedup._pinned_checkpoint(
        ck.groupBy("dst")
        .agg(F.min("src").alias("cluster_id"))
        .select(F.col("dst").alias("id"), "cluster_id")
    )
    joined = ck.join(frontier, ck["dst"] == frontier["id"])
    j_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in j_plan, j_plan

    # and the full clustering still matches the oracle on this graph
    got_labels = clusters_of(dedup.dup_clusters(pairs))
    assert got_labels == union_find(
        [(1, 2), (2, 3), (5, 6), (7, 7)]
    )
