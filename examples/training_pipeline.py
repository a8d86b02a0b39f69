"""End-to-end LLM training-data pipeline over the driver testdata: ingest
dedup (streaming digest corpus) → quality gates (incl. the Gopher rule set)
→ exact + near-dup removal (transitive clusters) → embedding near-dup
removal → eval decontamination → token accounting with sketch-backed
monitoring → sequence packing → mixture blending. Every stage is an
operator this engine ships; the pipeline is pure DataFrame composition —
one driver program a 1000-executor cluster would run unchanged.

Run: ``python examples/training_pipeline.py`` (env ``SPARK_GRAFT_SF_DIR``
to point at a larger SF).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from pyspark.sql import functions as F

    from datafusion_uwheel_spark import SimilarityEngine, get_spark
    from datafusion_uwheel_spark.operators import dedup, packing
    from datafusion_uwheel_spark.operators import text as text_ops
    from datafusion_uwheel_spark.sources import read_parquet

    spark = get_spark("training-pipeline", master="local[8]", shuffle_partitions=8)
    t0 = time.perf_counter()

    raw = read_parquet(spark, f"{SF_DIR}/documents.parquet").repartition(8)
    n_raw = raw.count()

    # 0. Ingest dedup (r5): two crawl snapshots through the persistent
    # digest corpus — the second snapshot re-crawls everything in the
    # first, so only its genuinely new documents survive; repeated content
    # inside a snapshot keeps its lowest doc_id. This is the streaming
    # front door of the pipeline, here driven as two batches.
    import tempfile

    from datafusion_uwheel_spark.operators.stream_dedup import CorpusDedup

    ingest = CorpusDedup(
        spark,
        tempfile.mkdtemp(prefix="pipeline_ingest_") + "/digests",
        n_buckets=32,
    )
    crawl1 = raw.filter(F.col("doc_id") % 2 == 0)
    batch1 = ingest.filter_batch(crawl1)
    batch2 = ingest.filter_batch(raw)  # re-crawl: half dup, half new
    docs = batch1.unionByName(batch2)
    n0 = docs.count()

    # 1. Quality gates: language, score, repetition, and the Gopher rule
    # set (r5; thresholds relaxed for the short synthetic docs) — all JVM
    # expressions.
    scored = text_ops.with_gopher_rules(
        text_ops.with_repetition_stats(
            text_ops.with_lang_id(
                text_ops.with_quality(text_ops.with_token_stats(docs))
            )
        ),
        min_words=5,
        min_required_words=1,
    )
    kept = scored.filter(
        (F.col("quality_score") > 0.3)
        & (F.col("n_tokens") >= 10)
        & (F.col("dup_token_ratio") < 0.9)
        & F.col("gopher_pass")
    )
    n1 = kept.count()

    # 2. Exact dedup (digest keep-lowest), then exact substring-span
    # masking (r11) BEFORE fuzzy dedup: strip repeated passages at window
    # granularity, keeping one copy corpus-wide (the ExactSubstr
    # remove-all-but-one discipline) — document COUNT is unchanged, text
    # shrinks where a passage repeated, and boilerplate stops making
    # distinct documents look like near-duplicates to MinHash.
    from datafusion_uwheel_spark.operators import substring as subdup

    exact = dedup.dedup_exact(kept)
    masked = subdup.mask_duplicate_spans(
        exact, window=8, hashed=True, keep_first=True
    )
    # count docs that lost TOKENS (the mask rebuilds text whitespace-
    # normalized, so a raw length compare would also count every doc that
    # merely had a double space)
    ntok = lambda c: F.size(F.split(F.trim(c), r"\s+"))  # noqa: E731
    n_masked = masked.filter(ntok("text_dedup") < ntok("text")).count()
    exact = masked.withColumn("text", F.col("text_dedup")).drop("text_dedup")

    # then near-dup CLUSTERS from MinHash/LSH pairs — transitive
    # keep-one, not pairwise dropping.
    pairs = dedup.lsh_candidate_pairs(
        dedup.with_minhash_signature(exact), min_est_jaccard=0.5
    )
    text_clean = dedup.dedup_clustered(exact, pairs)
    dedup.release_signatures(pairs)
    n2 = text_clean.count()

    # 3. Embedding near-dup removal through the SimilarityEngine (stored
    # buckets when an index exists; query-time otherwise) — drop every
    # cluster member except the canonical survivor.
    emb = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    sim = SimilarityEngine(spark, "embeddings", emb, dim=64)
    losers = (
        sim.dup_clusters(threshold=0.995, bits=8, tables=2)
        .filter(F.col("id") != F.col("cluster_id"))
        .select(F.col("id").alias("vec_id"))
    )
    # vec_id keys the embedding table; doc_id keys documents — testdata
    # aligns them 1:1, so the anti-join composes directly.
    final = text_clean.join(
        losers.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_anti"
    )
    n3 = final.count()

    # 3b. SemDeDup (r11): cluster-pruned SEMANTIC dedup on the surviving
    # embeddings — trained spherical-k-means cells, within-cluster pairs
    # only, keep the lowest-centroid-similarity representative. Catches
    # same-topic redundancy the 0.995 near-dup pass is too strict for.
    from datafusion_uwheel_spark.operators import semantic_dedup as semdd
    from datafusion_uwheel_spark.operators.similarity import train_ivf_centroids

    surviving_emb = emb.join(
        final.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    cents = train_ivf_centroids(surviving_emb, 64, k=16, seed=42)
    sem_drops = (
        semdd.semantic_dup_pairs(surviving_emb, cents, threshold=0.4)
        .select(F.col("id_drop").alias("doc_id"))
        .distinct()
    )
    final = final.join(sem_drops, "doc_id", "left_anti")
    n3b = final.count()

    # 4. Decontaminate against a (synthetic) held-out eval set: verbatim
    # snippets of surviving corpus docs stand in for leaked benchmark
    # text — the 13-gram guard must drop their source documents.
    from datafusion_uwheel_spark.operators import contamination

    held_out = (
        final.filter(F.length("text") >= 150)  # snippet must carry >=13 grams
        .limit(8)
        .select("doc_id", F.substring("text", 1, 150).alias("text"))
    )
    # Cut lineage once the corpus is final: every stage below (token
    # accounting, the monitoring engine's two rollup scans, packing,
    # blending) re-reads it, and without the checkpoint each would replay
    # the whole dedup/ANN/decontamination DAG from scratch.
    # r11: the BLOOM path — the eval grams collapse into one broadcast
    # blob, the corpus gram stream filters join-free, only survivors pay
    # the exact verify join; identical rows to the exact operator.
    final = contamination.decontaminate_bloom(
        final, held_out, n=13
    ).localCheckpoint()
    n4 = final.count()

    # 5. Token accounting for the cleaned corpus.
    stats = text_ops.with_token_stats(final).agg(
        F.sum("n_tokens").alias("tokens"), F.count(F.lit(1)).alias("docs")
    ).collect()[0]

    # 5b. Corpus monitoring (r8): "top sources in the crawl window" from
    # the heavy-hitters rollup — O(buckets x capacity) regardless of
    # corpus size, with [est, upper] bounds (exact here: capacity covers
    # the source cardinality). The crawl timestamp is synthesized from
    # doc_id the same way stage 0 pretends two snapshots; a real crawl
    # carries its own fetch time.
    from datafusion_uwheel_spark import WheelEngine

    crawl = final.withColumn(
        "crawl_ts",
        F.expr(
            "timestamp'2024-01-01 00:00:00' "
            "+ make_interval(0, 0, 0, 0, CAST(doc_id % 72 AS INT), 0, 0)"
        ),
    )
    mon = WheelEngine(spark, "crawl_mon", crawl, time_column="crawl_ts")
    mon.build_topk_index("source", bucket_seconds=3600, capacity=16)
    top_sources = mon.approx_topk(
        "source", "2024-01-01 00:00:00", "2024-01-04 00:00:00", k=3
    ).collect()
    assert top_sources and all(r["est"] == r["upper"] for r in top_sources)

    # 6. Pack into 2048-token training sequences (deterministic BFD).
    # Few shards at this tiny SF: per-shard waste is at most one open bin,
    # so utilization needs enough docs per shard to amortize it (at corpus
    # scale the default parallelism-derived shard count is right).
    packed = packing.pack_sequences(
        text_ops.with_token_stats(final).select("doc_id", "n_tokens"),
        2048,
        shards=4,
    )
    n_seq = packed.filter(~F.col("oversize")).select("seq_id").distinct().count()
    util = (
        packed.filter(~F.col("oversize")).agg(F.sum("n_tokens")).collect()[0][0]
        / (n_seq * 2048)
    )

    # 7. Blend with a (synthetic) second source at 80/20 toward a budget.
    src_b = text_ops.with_token_stats(docs).select("doc_id", "n_tokens")
    main_src = text_ops.with_token_stats(final).select("doc_id", "n_tokens")
    mt = main_src.agg(F.sum("n_tokens")).collect()[0][0]
    bt = src_b.agg(F.sum("n_tokens")).collect()[0][0]
    budget = int(0.8 * min(mt / 0.8, bt / 0.2))
    blend = packing.mixture_sample(
        {"clean": main_src, "raw": src_b}, {"clean": 4.0, "raw": 1.0}, budget
    )
    shares = {
        r["source"]: r["t"]
        for r in blend.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }

    dt = time.perf_counter() - t0
    print(
        f"pipeline: {n_raw} crawled -> ingest-dedup {n0} -> quality {n1} -> "
        f"text-dedup {n2} (substring-masked {n_masked}) -> embed-dedup {n3} "
        f"-> semdedup {n3b} -> decontaminated {n4}; {stats['tokens']} tokens"
    )
    print(
        f"packed into {n_seq} x 2048-token sequences ({util:.0%} utilization); "
        f"blend shares {shares} vs budget {budget}"
    )
    print(
        "top sources: "
        + ", ".join(f"{r['item']}={r['est']}" for r in top_sources)
    )
    print(f"total {dt:.1f}s at {SF_DIR}")
    assert n_raw >= n0 >= n1 >= n2 >= n3 >= n3b > n4 > 0  # snippets must drop docs
    assert util > 0.5
    print("OK training pipeline")


if __name__ == "__main__":
    main()
