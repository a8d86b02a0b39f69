"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

North-star extensions beyond the reference's surface (BASELINE.json;
SURVEY.md §2.2 note). All implementations are declarative DataFrame
pipelines over built-in JVM expressions — no Python UDFs anywhere — so
Catalyst/Tungsten keep the row path codegen'd, and every step is an exact
SQL expression the DuckDB oracle can reproduce.

Scale design (100 TB):

* **Exact dedup** — hash + ``groupBy``: one shuffle on the digest, map-side
  partial aggregation; the canonical distributed dedup.
* **Jaccard pairs** — inverted-index join (explode shingles → join on
  shingle → count intersections), the sparse-similarity pattern: cost is
  Σ posting-list², not n². Hot shingles are the skew risk — AQE skew-join
  handles moderate skew; stopword-shingle filtering is the content-level fix.
* **MinHash + LSH** — fixed-size signatures (k hashes) per doc, banding into
  (band, key) buckets, candidate pairs only within buckets: the linear-time
  near-dup path. Signature build is a per-row projection; the only shuffle
  is the bucket self-join.
* **SimHash** — one 32-bit fingerprint per doc; near-dups share band bytes.

Hashing is the portable rolling hash (:func:`..operators.text.fingerprint_col`
arithmetic), not ``xxhash64``/``md5``-dependent, so Spark and DuckDB produce
identical signatures.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import ROLLING_HASH_MOD, tokens_col

__all__ = [
    "MINHASH_NUM_PERM",
    "MINHASH_BANDS",
    "minhash_params",
    "exact_dup_groups",
    "dedup_exact",
    "shingle_hashes_col",
    "jaccard_pairs",
    "with_minhash_signature",
    "lsh_candidate_pairs",
    "with_simhash",
]

MINHASH_NUM_PERM = 32
MINHASH_BANDS = 8  # → 4 rows per band


def minhash_params(k: int = MINHASH_NUM_PERM, seed: int = 42) -> tuple[list[int], list[int]]:
    """Deterministic universal-hash parameters ``(a_i, b_i)`` for
    ``h_i(x) = (a_i·x + b_i) mod (2^31-1)``. Seeded so signatures are
    reproducible across runs and engines."""
    rng = random.Random(seed)
    a = [rng.randrange(1, ROLLING_HASH_MOD) for _ in range(k)]
    b = [rng.randrange(0, ROLLING_HASH_MOD) for _ in range(k)]
    return a, b


# ------------------------------------------------------------------ exact
def exact_dup_groups(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group rows by content digest: ``(digest, n_docs, keeper_id)``.

    ``md5`` of the raw text — hex-identical in Spark and DuckDB. One shuffle
    on the digest; partial counts are combined map-side.
    """
    return (
        df.select(F.md5(F.col(text)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keeper_id"))
    )


def dedup_exact(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact content duplicate group.

    Implemented as groups → semi-join back (two shuffles on digest/id), not
    a global window — a window over the whole table would single-partition
    nothing but still sort; this shape lets AQE pick broadcast when the
    keeper set is small.
    """
    keepers = exact_dup_groups(df, text, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return df.join(keepers, on=id_col, how="semi")


# --------------------------------------------------------------- shingles
def shingle_hashes_col(text: str | Column = "text", n: int = 3) -> Column:
    """Distinct hashed word-``n``-gram shingles of a text column.

    ``tokens → n-grams (join by space) → rolling-hash → distinct``, all as
    nested lambda expressions (codegen'd). The rolling hash matches
    :func:`..operators.text.fingerprint_col` so oracles can reproduce it.
    """
    toks = tokens_col(text)
    # Guard short docs: Spark's sequence(1, 0) yields a *descending* [1, 0],
    # and slice(_, 0, n) throws — fewer-than-n tokens must mean no shingles.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    ngrams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    hashes = F.transform(
        ngrams,
        lambda s: F.aggregate(
            F.split(s, ""),
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * 31 + F.ascii(ch)) % ROLLING_HASH_MOD,
        ),
    )
    return F.array_distinct(hashes)


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ ``threshold``.

    Inverted-index shape: explode shingles, self-join on the shingle hash
    (only docs sharing ≥1 shingle ever pair), count shared shingles, then
    ``J = |∩| / (|A| + |B| − |∩|)``. Returns ``(id_a, id_b, jaccard)`` with
    ``id_a < id_b``. Integer counts → the division is exact-reproducible.
    """
    sh = df.select(
        F.col(id_col).alias("__id"), shingle_hashes_col(text, n).alias("__sh")
    ).filter(F.size("__sh") > 0)
    sizes = sh.select("__id", F.size("__sh").alias("__n"))
    posting = sh.select("__id", F.explode("__sh").alias("__h"))
    a = posting.select(F.col("__id").alias("id_a"), "__h")
    b = posting.select(F.col("__id").alias("id_b"), "__h")
    inter = (
        a.join(b, on="__h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    na = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("__inter").cast("double")
            / (F.col("__na") + F.col("__nb") - F.col("__inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------- minhash
def with_minhash_signature(
    df: DataFrame,
    text: str = "text",
    n: int = 3,
    k: int = MINHASH_NUM_PERM,
    seed: int = 42,
) -> DataFrame:
    """Append a ``signature array<long>`` MinHash column.

    ``sig_i = min over shingles x of (a_i·x + b_i) mod p`` — a per-row
    projection over the shingle set, no shuffle. Rows with no shingles are
    dropped (no signature is defined)."""
    a_params, b_params = minhash_params(k, seed)
    a_arr = F.array(*[F.lit(x).cast("long") for x in a_params])
    b_arr = F.array(*[F.lit(x).cast("long") for x in b_params])
    out = df.withColumn("__sh", shingle_hashes_col(text, n)).filter(F.size("__sh") > 0)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("__sh"),
                lambda x: (F.element_at(a_arr, i + 1) * x + F.element_at(b_arr, i + 1))
                % ROLLING_HASH_MOD,
            )
        ),
    )
    return out.withColumn("signature", sig).drop("__sh")


def lsh_candidate_pairs(
    df_with_sig: DataFrame,
    id_col: str = "doc_id",
    k: int = MINHASH_NUM_PERM,
    bands: int = MINHASH_BANDS,
    min_est_jaccard: float | None = None,
) -> DataFrame:
    """LSH banding over MinHash signatures → candidate near-dup pairs.

    Signatures are cut into ``bands`` bands of ``k/bands`` rows; docs
    agreeing on *all* rows of any band land in the same bucket and pair up.
    Output: ``(id_a, id_b, est_jaccard)`` where ``est_jaccard`` is the
    fraction of agreeing signature components (the unbiased MinHash
    estimator). The only shuffle is the bucket self-join; bucket keys are
    the banded signature slices themselves.
    """
    r = k // bands
    bandrows = df_with_sig.select(
        F.col(id_col).alias("__id"),
        F.col("signature"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.struct(
                    bnd.alias("band"),
                    F.concat_ws(
                        "-", F.transform(F.slice(F.col("signature"), bnd * r + 1, r), lambda v: v.cast("string"))
                    ).alias("key"),
                ),
            )
        ).alias("__b"),
    ).select("__id", "signature", F.col("__b.band").alias("__band"), F.col("__b.key").alias("__key"))
    a = bandrows.select(
        F.col("__id").alias("id_a"), F.col("signature").alias("__sig_a"), "__band", "__key"
    )
    b = bandrows.select(
        F.col("__id").alias("id_b"), F.col("signature").alias("__sig_b"), "__band", "__key"
    )
    pairs = (
        a.join(b, on=["__band", "__key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sig_a", "__sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("__sig_a"), F.col("__sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(float(k))
    )
    out = pairs.withColumn("est_jaccard", est).select("id_a", "id_b", "est_jaccard")
    if min_est_jaccard is not None:
        out = out.filter(F.col("est_jaccard") >= min_est_jaccard)
    return out


# ---------------------------------------------------------------- simhash
def with_simhash(df: DataFrame, text: str = "text", bits: int = 32) -> DataFrame:
    """Append a ``simhash`` column: ``bits``-wide bit-majority fingerprint
    over distinct token hashes.

    For each bit position, sum +1/−1 over token hashes having/lacking the
    bit; the fingerprint sets bits with positive sums. Near-duplicate texts
    (mostly-shared token sets) agree on most bits. Per-row projection —
    no shuffle."""
    toks = tokens_col(text)
    tok_hashes = F.array_distinct(
        F.transform(
            toks,
            lambda t: F.aggregate(
                F.split(t, ""),
                F.lit(0).cast("long"),
                lambda acc, ch: (acc * 31 + F.ascii(ch)) % ROLLING_HASH_MOD,
            ),
        )
    )
    def pow2(b: Column) -> Column:
        # 2^b as exact long (b ≤ 31, values < 2^53 → double math is exact);
        # shiftleft/shiftright can't take a Column shift amount.
        return F.pow(F.lit(2.0), b.cast("double")).cast("long")

    def bit_vote(b: Column) -> Column:
        # Closure factory (not a default-arg lambda, which PySpark would
        # misread as a 3-parameter aggregate merge function).
        return F.aggregate(
            tok_hashes,
            F.lit(0).cast("long"),
            lambda s, h: s
            + F.when((F.floor(h / pow2(b)) % 2) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )

    sim = F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(bit_vote(b) > 0, pow2(b)).otherwise(F.lit(0).cast("long")),
    )
    return df.withColumn("simhash", sim)
