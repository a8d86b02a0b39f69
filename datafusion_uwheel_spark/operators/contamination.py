"""Train/eval decontamination: flag training documents that share word
n-grams with a held-out set (the GPT-3/PaLM-style 13-gram rule). A
training corpus that leaks benchmark text inflates evals; this operator is
the standard guard an LLM-data pipeline runs between "clean corpus" and
"training batches".

Beyond the reference (which stops at query acceleration) — pure
declarative DataFrame ops:

* tokens: ``lower`` + split on non-alphanumeric runs — the aggressive
  normalization decontamination wants (punctuation/case differences must
  not hide a leaked benchmark passage), deliberately stricter than the
  whitespace tokens the quality stats use;
* n-grams: ``transform(sequence(...))`` over the token array, each gram
  hashed with ``xxhash64`` — 64-bit hashes instead of strings keep the
  shuffle narrow (collisions only ever OVER-flag at ~2^-64 per pair:
  acceptable for a guard whose failure mode should be conservative);
* the join: training grams against the DISTINCT held-out grams —
  Catalyst/AQE broadcasts the held-out side whenever it is small (the
  typical shape: eval sets are millions of grams, corpora are billions of
  docs), so the scan of the training side is one pass with no big
  shuffle.

Whole-stage-codegen end to end; no Python in the row path, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ngram_hashes_col",
    "with_contamination",
    "decontaminate",
    "with_contamination_bloom",
    "decontaminate_bloom",
    "with_contamination_fuzzy",
    "decontaminate_fuzzy",
]


def ngram_hashes_col(text: str | Column, n: int) -> Column:
    """``array<bigint>`` of xxhash64'd word ``n``-grams of ``text`` —
    DISTINCT hashes (a gram repeated inside one document still counts
    once), empty when the document has fewer than ``n`` tokens."""
    src = F.col(text) if isinstance(text, str) else text
    toks = F.filter(
        F.split(F.lower(src), r"[^a-z0-9]+"), lambda t: F.length(t) > 0
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<bigint>"))
    )


def with_contamination(
    train: DataFrame,
    held_out: DataFrame,
    n: int = 13,
    text: str = "text",
    held_out_text: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Annotate every training document with ``n_shared_ngrams`` (distinct
    ``n``-grams it shares with ANY held-out document) and ``contaminated``
    (≥1 shared gram). One pass over each side: held-out grams are exploded
    and deduplicated (tiny vs the corpus — AQE broadcasts them), training
    grams are exploded once and semi-joined; docs shorter than ``n`` tokens
    are never flagged.

    Scale: the only shuffle is the gram join keyed on a 64-bit hash; 13-
    grams are near-unique, so there is no skew to salt. The held-out side
    is ``distinct()``-ed before the join — its size bounds the broadcast,
    not the number of eval documents."""
    if n <= 0:
        raise ValueError("n must be positive")
    ho_text = held_out_text or text
    ho_grams = (
        held_out.select(F.explode(ngram_hashes_col(ho_text, n)).alias("__gram"))
        .distinct()
    )
    train_grams = train.select(
        F.col(id_col), F.explode(ngram_hashes_col(text, n)).alias("__gram")
    )
    shared = (
        train_grams.join(ho_grams, on="__gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )
    return (
        train.join(shared, on=id_col, how="left")
        .withColumn(
            "n_shared_ngrams", F.coalesce("n_shared_ngrams", F.lit(0))
        )
        .withColumn("contaminated", F.col("n_shared_ngrams") > 0)
    )


def decontaminate(
    train: DataFrame,
    held_out: DataFrame,
    n: int = 13,
    text: str = "text",
    held_out_text: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop contaminated training documents (the enforcement form of
    :func:`with_contamination`): an anti-join of the corpus against the
    flagged ids — original columns unchanged, no flag columns added."""
    flagged = with_contamination(
        train, held_out, n=n, text=text, held_out_text=held_out_text,
        id_col=id_col,
    ).filter("contaminated").select(id_col)
    return train.join(flagged, on=id_col, how="left_anti")


# --------------------------------------------------------------- bloom path
# session wiring, sizing, build and probe live in .bloomfilter (shared
# with .bloomjoin); module-level names so tests can monkeypatch the shim
# probe here
from .bloomfilter import build_bloom as _build_bloom  # noqa: E402
from .bloomfilter import ensure_bloom_fns as _ensure_bloom_fns  # noqa: E402
from .bloomfilter import might_contain as _might_contain  # noqa: E402


def with_contamination_bloom(
    train: DataFrame,
    held_out: DataFrame,
    n: int = 13,
    text: str = "text",
    held_out_text: str | None = None,
    id_col: str = "doc_id",
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> DataFrame:
    """:func:`with_contamination` behind a broadcast bloom prefilter —
    IDENTICAL rows, different physical plan for the 100 TB corpus side.

    The exact operator ships the full distinct held-out gram set through a
    (usually broadcast) join that every corpus gram must probe. Here the
    held-out grams aggregate into ONE fixed-size bloom blob
    (``uw_bloom_agg`` — Spark's own codegen'd ``BloomFilterAggregate``,
    shim-registered since the public registry omits it), the corpus gram
    stream filters on ``uw_might_contain(blob, gram)`` — a literal in the
    plan, no join, no shuffle, one lazy deserialize per task — and only
    the tiny surviving fraction (true sharers + ~``fpp`` of the corpus
    grams) pays the exact verify join that removes the false positives.
    No false negatives (bloom contract), so prefilter+verify ≡ exact:
    same ``n_shared_ngrams`` / ``contaminated`` values row-for-row.

    ``expected_items`` (> 0) skips the sizing pass; without it the item
    estimate is the TOTAL per-doc-distinct gram count — one scan of the
    (small) held-out side with NO explode shuffle, and an overestimate of
    the distinct-gram NDV, which only improves fpp until the bits cap
    clamps (see :func:`.bloomfilter.bloom_num_bits`; at the default ~8 MB
    cap a 4M-gram eval suite keeps ``fpp``, far larger suites degrade fpp
    gracefully). On a shim-less session (no jar on the driver classpath)
    this falls back to the exact join with a ``RuntimeWarning`` — same
    answer, no prefilter."""
    if n <= 0:
        raise ValueError("n must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    if expected_items is not None and expected_items <= 0:
        # a 0 here would silently size-for-nothing while the held-out set
        # is real — refuse instead of reporting every doc clean
        raise ValueError(f"expected_items must be positive, got {expected_items}")
    spark = train.sparkSession
    if not _ensure_bloom_fns(spark):
        import warnings

        warnings.warn(
            "uw_bloom_agg unavailable (shim jar not on the driver "
            "classpath) — decontamination runs the exact join instead",
            RuntimeWarning,
            stacklevel=2,
        )
        return with_contamination(
            train, held_out, n=n, text=text,
            held_out_text=held_out_text, id_col=id_col,
        )
    ho_text = held_out_text or text
    ho_grams = (
        held_out.select(F.explode(ngram_hashes_col(ho_text, n)).alias("__gram"))
        .distinct()
    )
    items = expected_items
    if items is None:
        items = held_out.agg(
            F.coalesce(
                F.sum(F.size(ngram_hashes_col(ho_text, n))), F.lit(0)
            ).alias("n")
        ).head()["n"]
    blob = (
        _build_bloom(ho_grams, "__gram", fpp=fpp, expected_items=max(int(items), 1))
        if items > 0
        else None
    )
    if blob is None:  # empty held-out set: nothing can be contaminated
        return (
            train.withColumn("n_shared_ngrams", F.lit(0).cast("long"))
            .withColumn("contaminated", F.lit(False))
        )
    train_grams = train.select(
        F.col(id_col), F.explode(ngram_hashes_col(text, n)).alias("__gram")
    )
    survivors = train_grams.filter(_might_contain(blob, "__gram"))
    shared = (
        survivors.join(ho_grams, on="__gram")  # exact verify: kills FPs
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )
    return (
        train.join(shared, on=id_col, how="left")
        .withColumn("n_shared_ngrams", F.coalesce("n_shared_ngrams", F.lit(0)))
        .withColumn("contaminated", F.col("n_shared_ngrams") > 0)
    )


def decontaminate_bloom(
    train: DataFrame,
    held_out: DataFrame,
    n: int = 13,
    text: str = "text",
    held_out_text: str | None = None,
    id_col: str = "doc_id",
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> DataFrame:
    """:func:`decontaminate` through the bloom prefilter — identical
    surviving rows (the prefilter+verify composition is exact)."""
    flagged = with_contamination_bloom(
        train, held_out, n=n, text=text, held_out_text=held_out_text,
        id_col=id_col, fpp=fpp, expected_items=expected_items,
    ).filter("contaminated").select(id_col)
    return train.join(flagged, on=id_col, how="left_anti")


# --------------------------------------------------------------- fuzzy path
def with_contamination_fuzzy(
    train: DataFrame,
    held_out: DataFrame,
    min_est_jaccard: float = 0.5,
    n: int = 3,
    k: int | None = None,
    bands: int | None = None,
    text: str = "text",
    held_out_text: str | None = None,
    id_col: str = "doc_id",
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """NEAR-duplicate decontamination: flag training documents whose
    MinHash-estimated shingle Jaccard against ANY held-out document
    reaches ``min_est_jaccard``. The exact n-gram guard
    (:func:`with_contamination`) only sees VERBATIM leaks — a benchmark
    passage that was lightly paraphrased, truncated, or re-wrapped slips
    through it; the fuzzy guard catches what survives editing, the same
    reason corpus dedup runs MinHash next to exact digests.

    Pure cross-table LSH (:func:`.dedup.lsh_join`): both sides sign once,
    band keys bucket-join (the only shuffle), over-cap buckets drop per
    side. Appends ``max_est_jaccard`` (NULL → 0.0 for unmatched or
    shingle-less docs) and ``contaminated``. Thresholds compare the
    MinHash ESTIMATOR — the same quantity the within-corpus near-dup
    pass gates on, with the same k-permutation resolution."""
    from .dedup import MINHASH_BANDS, MINHASH_NUM_PERM, release_signatures
    from .dedup import lsh_join as _lsh_join
    from .dedup import with_minhash_signature as _sign

    k = MINHASH_NUM_PERM if k is None else k
    bands = MINHASH_BANDS if bands is None else bands
    if not (0.0 < min_est_jaccard <= 1.0):
        raise ValueError(
            f"min_est_jaccard must be in (0, 1], got {min_est_jaccard}"
        )
    ho_text = held_out_text or text
    # the held-out side needs SOME id for banding; output never uses it
    ho = held_out.select(
        F.monotonically_increasing_id().alias("__ho_id"),
        F.col(ho_text).alias("__ho_text"),
    )
    pairs = _lsh_join(
        _sign(train.select(F.col(id_col), F.col(text)), text=text, n=n, k=k),
        _sign(ho, text="__ho_text", n=n, k=k),
        left_id=id_col,
        right_id="__ho_id",
        k=k,
        bands=bands,
        min_est_jaccard=min_est_jaccard,
        max_bucket_size=max_bucket_size,
        # The held-out side is a benchmark suite — bounded by contract,
        # orders of magnitude smaller than the training corpus. Broadcast
        # its banded rows (guide §3.1) so the TRAIN side is never
        # exchanged by band key at all (r15; was a sort-merge join
        # shuffling both sides).
        broadcast_right=True,
    )
    # Persist the per-doc verdict, not just the signatures: the verdict
    # frame is one tiny row per FLAGGED doc, while re-deriving it pays the
    # band-explode + bucket join + groupBy again. Callers routinely run
    # several actions on the annotated frame (flagged count, per-source
    # count, the enforcement anti-join) — with only the signature persist,
    # every one of those replayed the join (measured: the bench row's
    # second count was a full join replay). Lazy persist: no extra job at
    # construction; the first action materializes it.
    from pyspark import StorageLevel

    worst = (
        pairs.groupBy("id_left")
        .agg(F.max("est_jaccard").alias("max_est_jaccard"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out = (
        train.join(
            worst.select(F.col("id_left").alias(id_col), "max_est_jaccard"),
            on=id_col,
            how="left",
        )
        .withColumn(
            "max_est_jaccard", F.coalesce("max_est_jaccard", F.lit(0.0))
        )
        .withColumn("contaminated", F.col("max_est_jaccard") >= min_est_jaccard)
    )

    def _release():
        worst.unpersist()
        return release_signatures(pairs)

    out._uw_release = _release
    return out


def decontaminate_fuzzy(
    train: DataFrame,
    held_out: DataFrame,
    min_est_jaccard: float = 0.5,
    n: int = 3,
    k: int | None = None,
    bands: int | None = None,
    text: str = "text",
    held_out_text: str | None = None,
    id_col: str = "doc_id",
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Drop training documents the fuzzy guard flags (the enforcement form
    of :func:`with_contamination_fuzzy`) — original columns unchanged. The
    signature-cache release hook rides through to the returned frame:
    call ``out._uw_release()`` after the final action in long-lived
    sessions."""
    annotated = with_contamination_fuzzy(
        train, held_out, min_est_jaccard, n=n, k=k, bands=bands, text=text,
        held_out_text=held_out_text, id_col=id_col,
        max_bucket_size=max_bucket_size,
    )
    flagged = annotated.filter("contaminated").select(id_col)
    out = train.join(flagged, on=id_col, how="left_anti")
    out._uw_release = annotated._uw_release
    return out
