"""Multimodal → similarity end-to-end: binary media in, ANN search out.

The training-data-pipeline composition the operators were built for:

  1. media arrives as an opaque ``binary`` column (+ typed metadata),
  2. exact dedup by content digest (pure JVM expressions),
  3. feature extraction via Arrow-batched ``mapInPandas`` (the codec layer
     is the deterministic fake in this container — the Spark-side plumbing
     is the real thing),
  4. the feature vectors feed a :class:`SimilarityEngine`: a partitioned
     ANN index is built once, then top-k probes and near-dup pairs are
     partition-pruned reads (route-or-delegate, ``last_route`` shows it).

Run:  python examples/media_pipeline.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from datafusion_uwheel_spark import SimilarityEngine, get_spark  # noqa: E402
from datafusion_uwheel_spark.operators import multimodal  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DIM = 32


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:<38} {1e3 * (time.perf_counter() - t0):8.1f} ms")
    return out


def main() -> None:
    spark = get_spark("media-pipeline", master="local[8]", shuffle_partitions=8)

    # 1. binary media column (documents' UTF-8 bytes stand in for payloads)
    media = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.encode("text", "UTF-8").alias("data"))
    )

    # 2. exact media dedup on the content digest
    stats = multimodal.with_media_stats(media)
    n_total = media.count()
    n_unique = timed("digest dedup (distinct payloads)", lambda: stats.select("digest").distinct().count())
    print(f"  {n_total} payloads, {n_unique} unique")

    # 3. binary → feature vectors (Arrow-batched mapInPandas), materialized
    # once — the real pipeline shape at scale: the feature table is written,
    # then indexed (otherwise the extraction re-runs in every downstream job)
    feat_dir = tempfile.mkdtemp(prefix="media_feats_")
    timed(
        "feature extraction (mapInPandas)",
        lambda: multimodal.extract_features(media, dim=DIM, id_col="doc_id")
        .write.mode("overwrite")
        .parquet(feat_dir),
    )
    feats = spark.read.parquet(feat_dir)

    # 4. features → ANN: build once, probe partition-pruned
    eng = SimilarityEngine(
        spark, "media_features", feats, dim=DIM,
        vec_col="feature", id_col="doc_id",
        index_root=tempfile.mkdtemp(prefix="media_ann_"),
    )
    timed("ANN index build (lsh, partitioned)", lambda: eng.build_index(kind="lsh", bits=6, tables=2))

    qvec = [float(x) for x in feats.select("feature").head()[0]]
    top = timed("top-k probe (routed)", lambda: eng.topk(qvec, k=5, kind="lsh", bits=6, tables=2).collect())
    assert eng.last_route.kind == "indexed", eng.last_route
    print("  nearest:", [(r["doc_id"], r["sim"]) for r in top[:3]])

    pairs = timed("near-dup pairs (routed)", lambda: eng.dup_pairs(0.95, bits=6, tables=2).count())
    assert eng.last_route.kind == "indexed", eng.last_route
    print(f"  {pairs} near-dup feature pairs at sim >= 0.95")

    # fallback proof: unindexed parameters delegate to query-time hashing
    eng.topk(qvec, k=5, kind="lsh", bits=4, tables=1).collect()
    assert eng.last_route.kind == "query_time", eng.last_route
    print("route-or-delegate: unindexed params fell back to query-time hashing")


if __name__ == "__main__":
    main()
