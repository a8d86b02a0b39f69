"""r14: the streaming semantic dedup's corpus join runs as ONE cogrouped
Arrow kernel (``corpus_drop_ids``) instead of an interpreted per-pair HOF
cosine fold. Bit-equality pin: the kernel's drop-id set must equal the
expression form it replaced (``join on cell`` +
``F.round(cosine_pair_col(...)) >= t``) on real embeddings, full-precision
AND int8-quantized corpus state, including NULL/zero/NaN vectors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_uwheel_spark.operators.ann_index import _q8_col
from datafusion_uwheel_spark.operators.semantic_dedup import (
    corpus_drop_ids,
    with_semantic_cells,
)
from datafusion_uwheel_spark.operators.similarity import cosine_pair_col

T = 0.4
ND = 6


def _expression_drop_ids(batch, corpus, threshold, nd, vec_col="embedding"):
    sim = F.round(cosine_pair_col(F.col(vec_col), F.col("__corpus_v")), nd)
    return (
        batch.join(
            corpus.select(F.col("cell"), F.col("embedding").alias("__corpus_v")),
            on="cell",
        )
        .filter(sim >= threshold)
        .select("vec_id")
        .distinct()
    )


@pytest.mark.parametrize("quantize", [False, True])
def test_kernel_equals_expression_on_real_embeddings(spark, sf_small_dir, quantize):
    from datafusion_uwheel_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_small_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").head()[0])
    cents = similarity.train_ivf_centroids(emb, dim, k=4, seed=42)
    assigned = with_semantic_cells(emb, cents).filter(F.col("csim").isNotNull())
    batch = assigned.select("vec_id", "embedding", "cell")
    # "corpus" = the odd vec_ids, as the stream would have recorded them
    corpus = assigned.filter(F.col("vec_id") % 2 == 1)
    if quantize:
        corpus = corpus.select(
            _q8_col(F.col("embedding").cast("array<double>")).alias("embedding"),
            "cell",
        )
    else:
        corpus = corpus.select(
            F.col("embedding").cast("array<float>").alias("embedding"), "cell"
        )
    want = sorted(
        r[0] for r in _expression_drop_ids(batch, corpus, T, ND).collect()
    )
    got = sorted(
        r[0]
        for r in corpus_drop_ids(
            batch, corpus, dim, T, round_digits=ND
        ).collect()
    )
    assert got == want
    assert len(got) > 0  # the odd half matches itself at cosine 1.0


def test_kernel_masks_degenerate_vectors(spark):
    cents = [[1.0, 0.0], [0.0, 1.0]]
    batch = spark.createDataFrame(
        [
            (1, [1.0, 0.01], 1),
            (2, [0.0, 0.0], 1),  # zero: NULL cosine → never drops
            (3, None, 1),  # NULL vector
            (4, [float("nan"), 1.0], 2),  # NaN element
        ],
        "vec_id long, embedding array<float>, cell long",
    )
    corpus = spark.createDataFrame(
        [([1.0, 0.0], 1), ([0.0, 0.0], 1), ([0.5, 0.5], 2)],
        "embedding array<float>, cell long",
    )
    got = sorted(
        r[0] for r in corpus_drop_ids(batch, corpus, 2, 0.9, round_digits=ND).collect()
    )
    # the _vec_matrix contract: NULL/zero/NaN vectors never pair. (The raw
    # expression join differs on the NaN row ONLY because Spark orders NaN
    # above every numeric, so `round(NaN) >= t` is true — but NaN-carrying
    # vectors can never reach the stream's corpus join: with_semantic_cells
    # NULLs their csim and prepare_batch filters on csim, the r13 guard.
    # On the eligibility-filtered domain the two forms agree, pinned by
    # test_kernel_equals_expression_on_real_embeddings.)
    assert got == [1]
    eligible = batch.filter(F.col("vec_id") == 1)  # the post-filter domain
    want = sorted(
        r[0] for r in _expression_drop_ids(eligible, corpus, 0.9, ND).collect()
    )
    assert (
        sorted(
            r[0]
            for r in corpus_drop_ids(eligible, corpus, 2, 0.9, round_digits=ND).collect()
        )
        == want
        == [1]
    )


def test_kernel_q8_codes_equal_expression(spark, sf_small_dir):
    """r15 verdict #5: the assignment kernel's fused ``__q8`` output must
    be BIT-EQUAL to the ``_q8_col`` expression it replaces in the stream's
    decided projection — on real embeddings AND on adversarial rows
    (zero vector, exact .5 rounding boundaries, the IEEE x+0.5 overshoot
    edge, mixed magnitudes)."""
    import random

    from pyspark.sql import functions as F

    from datafusion_uwheel_spark.operators.ann_index import _q8_col
    from datafusion_uwheel_spark.operators.semantic_dedup import (
        with_semantic_cells,
    )

    emb = spark.read.parquet(f"{sf_small_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dim = len(emb.first()["embedding"])
    rng = random.Random(5)
    extra = [
        (10_001, [0.0] * dim),
        (10_002, [0.5] * (dim // 2) + [-0.5] * (dim - dim // 2)),
        (10_003, [0.49999999999999994, 1.0] + [0.0] * (dim - 2)),
        (10_004, [rng.uniform(-1, 1) * 10 ** rng.randrange(-9, 9) for _ in range(dim)]),
    ]
    df = emb.unionByName(
        spark.createDataFrame(extra, "vec_id long, embedding array<double>")
    )
    cents = [
        [rng.uniform(-1, 1) for _ in range(dim)] for _ in range(4)
    ]
    got = with_semantic_cells(
        df, cents, "embedding", prefer_kernel=True, emit_q8=True
    ).withColumn("__ref", _q8_col(F.col("embedding")))
    mismatches = got.filter(
        F.col("csim").isNotNull() & ~F.col("__q8").eqNullSafe(F.col("__ref"))
    ).count()
    assert mismatches == 0
    # the zero vector matches the expression too (zero codes, NULL csim),
    # and MASKED rows (NULL/NaN vectors) carry NULL codes
    zrow = got.filter(F.col("vec_id") == 10_001).first()
    assert zrow["csim"] is None and list(zrow["__q8"]) == [0] * dim
    masked = got.withColumn(
        "__bad", F.isnan(F.array_max(F.col("embedding")))
    ).filter(F.col("__bad") & F.col("__q8").isNotNull())
    assert masked.count() == 0
