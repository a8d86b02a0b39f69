"""r15 probe: dup_clusters shuffle count — old vs new edge/round-1 shape.

Builds both layouts inline (no checkpoints, so the full plan is visible),
counts Exchange nodes in each physical plan, asserts row-identical labels
on the real LSH pair graph, and times the full dedup_cluster_pipeline
bench body.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_uwheel_spark import get_spark
from datafusion_uwheel_spark.operators import dedup
from datafusion_uwheel_spark.sources import read_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(
    "probe_cc", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
)
docs = read_parquet(spark, f"{SF_DIR}/documents.parquet")

pairs = dedup.lsh_candidate_pairs(
    dedup.with_minhash_signature(docs), min_est_jaccard=0.35
)
base = pairs.select(
    F.col("id_a").alias("src"), F.col("id_b").alias("dst")
).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
sym = base.unionByName(
    base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
)

old_edges = sym.distinct().repartition("dst")
old_round1 = (
    old_edges.groupBy("src")
    .agg(F.min("dst").alias("__nbr"))
    .select(
        F.col("src").alias("id"),
        F.least(F.col("src"), F.col("__nbr")).alias("cluster_id"),
    )
)
new_edges = sym.repartition("dst").dropDuplicates()
new_round1 = (
    new_edges.groupBy("dst")
    .agg(F.min("src").alias("__nbr"))
    .select(
        F.col("dst").alias("id"),
        F.least(F.col("dst"), F.col("__nbr")).alias("cluster_id"),
    )
)


def nexch(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


print(f"old round1 Exchange count: {nexch(old_round1)}")
print(f"new round1 Exchange count: {nexch(new_round1)}")

a = {(r["id"], r["cluster_id"]) for r in old_round1.collect()}
b = {(r["id"], r["cluster_id"]) for r in new_round1.collect()}
assert a == b, f"round1 diverged: {len(a ^ b)} differing rows"
print(f"round1 rows identical ({len(a)} vertices)")

full_old = {
    (r["id"], r["cluster_id"])
    for r in dedup.dup_clusters(pairs).collect()
}
print(f"full clustering: {len(full_old)} labelled vertices")

for rep in range(5):
    t0 = time.perf_counter()
    p = dedup.lsh_candidate_pairs(
        dedup.with_minhash_signature(docs), min_est_jaccard=0.35
    )
    n = dedup.dedup_clustered(docs, p).count()
    dedup.release_signatures(p)
    print(f"cluster_run rep={rep}: {time.perf_counter() - t0:.2f}s n={n}",
          flush=True)
dedup.release_signatures(pairs)
