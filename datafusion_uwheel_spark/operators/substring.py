"""Exact substring-span deduplication — the ExactSubstr pass.

The document-level dedup family (:mod:`.dedup`: exact digests, MinHash/LSH,
SimHash, Jaccard) removes WHOLE near-duplicate documents, but a large crawl
corpus also repeats long VERBATIM PASSAGES inside otherwise-distinct
documents — boilerplate headers, licenses, templated paragraphs, quoted
chain mail. The public remedy (Lee et al. 2021, "Deduplicating Training
Data Makes Language Models Better": any ≥50-token substring occurring more
than once is removed, keeping one occurrence) builds a corpus-wide suffix
array — a single-machine structure that does not distribute. This module
implements the standard scalable reformulation: **fixed-length token
windows**. Every run of ``window`` consecutive tokens is a candidate; a
window whose gram occurs ≥ ``min_count`` times corpus-wide is duplicated,
and overlapping/adjacent duplicated windows merge into maximal spans.
Window-based spans are a superset-of-boundaries approximation of the
suffix-array spans for duplicates of length ≥ ``window`` (every such
duplicate contains at least one duplicated window; spans round outward to
window granularity) — the trade every distributed implementation of this
pass makes.

Scale shape (the 100 TB plan):

* gram construction is pure JVM higher-order expressions
  (``transform``/``slice``/``concat_ws`` over :func:`..operators.text.
  tokens_col`) — zero Python in the hot path;
* occurrence counting is ``groupBy(gram).agg(...)`` — map-side partial
  aggregation absorbs hot boilerplate grams (a window function over a
  billion-row key partition would not);
* the duplicated-window join back is 1-row-per-key on the build side, so
  AQE's skew-join split handles hot grams without row explosion;
* span merging is a per-document ``lag`` + running-sum island pass —
  partitioned by doc, never corpus-wide state.

``hashed=True`` swaps the shuffle key from the gram STRING (~6 bytes/token)
to ``xxhash64(gram)`` (8 bytes total) — at corpus scale this is the right
key; a 64-bit collision can only MERGE two distinct grams (inflating a
count), which for masking errs toward removing — never keeps a true
duplicate. Exact mode is the default because it is oracle-reproducible
(DuckDB groups the same strings; see ``oracles.substring_spans_sql``).

The reference engine has no substring/passage operator of any kind (its
surface is time-indexed aggregation — SURVEY.md §2.1); this is an
extension row of the LLM-data family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col

__all__ = ["duplicate_spans", "mask_duplicate_spans"]


def _window_grams(
    df: DataFrame, text: str, id_col: str, window: int
) -> DataFrame:
    """``(__doc, __pos, __gram)`` — one row per ``window``-token run.
    Documents with fewer than ``window`` tokens emit nothing (posexplode
    drops empty arrays); gram text is the single-space join of the run,
    the same convention as :func:`..operators.dedup.shingle_hashes_col`."""
    toks = tokens_col(text)
    nwin = F.size(toks) - F.lit(window - 1)
    grams = F.when(
        nwin > 0,
        F.transform(
            F.sequence(F.lit(0), nwin - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, F.lit(window))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col).alias("__doc"), F.posexplode(grams).alias("__pos", "__gram")
    )


def duplicate_spans(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    min_count: int = 2,
    cross_doc: bool = False,
    hashed: bool = False,
    keep_first: bool = False,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    A window (``window`` consecutive whitespace tokens) is *duplicated*
    when its gram occurs at least ``min_count`` times corpus-wide —
    within-document repeats included, matching the suffix-array semantics
    (``cross_doc=True`` additionally requires the gram in ≥ 2 distinct
    documents, the boilerplate-only variant). ``keep_first=True`` exempts
    each gram's globally first occurrence (ordered by ``(doc, pos)``) so a
    downstream mask keeps one copy of every passage — the paper's
    remove-all-but-one discipline. Overlapping or exactly-adjacent
    duplicated windows merge into one span.

    Returns ``(id_col, span_start, span_end, n_windows)`` — token indices,
    end exclusive, ordered by ``(id_col, span_start)``. Positions index
    the :func:`..operators.text.tokens_col` tokenization (whitespace runs
    collapse), not raw character offsets. ``id_col`` must be unique per
    document (the corpus contract every dedup operator here shares) —
    duplicate ids would interleave two documents' window positions into
    one island stream.
    """
    return _spans_unordered(
        df, text, id_col, window, min_count, cross_doc, hashed, keep_first
    ).orderBy(id_col, "span_start")


def _spans_unordered(
    df: DataFrame,
    text: str,
    id_col: str,
    window: int,
    min_count: int,
    cross_doc: bool,
    hashed: bool,
    keep_first: bool,
) -> DataFrame:
    """:func:`duplicate_spans` without the final global sort — the mask
    regroups per document, so ordering there would only add a
    range-partition exchange the next groupBy throws away."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    grams = _window_grams(df, text, id_col, window)
    key = F.xxhash64("__gram") if hashed else F.col("__gram")
    grams = grams.select("__doc", "__pos", key.alias("__key"))
    # One aggregation with map-side combine; every state is a monoid, so a
    # billion-occurrence boilerplate gram costs partial rows, not a
    # single-task window partition.
    aggs = [F.count(F.lit(1)).alias("__n")]
    if cross_doc:
        aggs += [F.min("__doc").alias("__d0"), F.max("__doc").alias("__d1")]
    if keep_first:
        aggs.append(F.min(F.struct("__doc", "__pos")).alias("__first"))
    keyagg = grams.groupBy("__key").agg(*aggs)
    cond = F.col("__n") >= min_count
    if cross_doc:
        cond &= F.col("__d0") != F.col("__d1")
    keyagg = keyagg.filter(cond)
    dup = grams.join(keyagg, "__key")
    if keep_first:
        dup = dup.filter(
            (F.col("__doc") != F.col("__first.__doc"))
            | (F.col("__pos") != F.col("__first.__pos"))
        )
    # islands: windows whose starts differ by <= window overlap or touch
    wdoc = Window.partitionBy("__doc").orderBy("__pos")
    marked = dup.select(
        "__doc",
        "__pos",
        F.when(
            F.col("__pos") - F.lag("__pos").over(wdoc) > window, 1
        ).otherwise(0).alias("__brk"),
    ).withColumn("__island", F.sum("__brk").over(wdoc))
    return (
        marked.groupBy("__doc", "__island")
        .agg(
            F.min("__pos").cast("int").alias("span_start"),
            (F.max("__pos") + window).cast("int").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("__doc").alias(id_col), "span_start", "span_end", "n_windows"
        )
    )


def mask_duplicate_spans(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    min_count: int = 2,
    cross_doc: bool = False,
    hashed: bool = False,
    keep_first: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """``df`` plus ``{text}_dedup``: the text with every duplicated span's
    tokens removed (``keep_first=True`` by default, so exactly one copy of
    each passage survives corpus-wide — the remove-all-but-one pass a
    training pipeline actually runs). Output text is whitespace-normalized
    (tokens re-joined with single spaces — the tokenization the spans
    index); NULL text stays NULL. The span join is per-document
    (``collect_list`` of that doc's few spans, never corpus state), and
    token filtering is a JVM higher-order ``filter``/``exists`` — no
    Python row path anywhere."""
    out_col = out_col or f"{text}_dedup"
    spans = _spans_unordered(
        df, text, id_col, window, min_count, cross_doc, hashed, keep_first
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    joined = df.join(per_doc, id_col, "left")
    toks = tokens_col(text)
    # the WHEN guard means the filter branch only evaluates where __spans
    # is a real array — no NULL-array exists() semantics to reason about
    kept = F.when(F.col("__spans").isNull(), toks).otherwise(
        F.filter(
            toks,
            lambda t, i: ~F.exists(
                F.col("__spans"),
                lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
            ),
        )
    )
    return joined.withColumn(
        out_col,
        F.when(F.col(text).isNull(), F.lit(None).cast("string")).otherwise(
            F.concat_ws(" ", kept)
        ),
    ).drop("__spans")
