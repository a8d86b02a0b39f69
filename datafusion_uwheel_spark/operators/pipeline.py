"""Training-data curation pipeline: compose the LLM-data operators.

The individual operators (:mod:`.dedup`, :mod:`.text`, :mod:`.similarity`)
are DataFrame→DataFrame transforms; this module chains them into the shape a
real curation run takes — annotate, filter, dedup — as one lazy Spark plan
(no materialization between steps; Catalyst fuses the projections).

Everything stays declarative: the returned DataFrame can be written
partitioned, sampled, or joined downstream like any other.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup
from . import text as text_ops

__all__ = [
    "curate",
    "domain_cap",
    "lang_filter",
    "length_filter",
    "normalize_text",
    "quality_filter",
]


def quality_filter(min_score: float = 0.5) -> Callable[[DataFrame], DataFrame]:
    """Keep rows whose composite quality score clears ``min_score``
    (annotates via :func:`..operators.text.with_quality` if needed)."""

    def step(df: DataFrame) -> DataFrame:
        if "quality_score" not in df.columns:
            df = text_ops.with_quality(df)
        return df.filter(F.col("quality_score") >= min_score)

    return step


def lang_filter(langs: Sequence[str] = ("en",)) -> Callable[[DataFrame], DataFrame]:
    """Keep rows whose predicted language is in ``langs``."""

    def step(df: DataFrame) -> DataFrame:
        if "lang_pred" not in df.columns:
            df = text_ops.with_lang_id(df)
        return df.filter(F.col("lang_pred").isin(list(langs)))

    return step


def length_filter(
    min_tokens: int = 1, max_tokens: int | None = None
) -> Callable[[DataFrame], DataFrame]:
    def step(df: DataFrame) -> DataFrame:
        if "n_tokens" not in df.columns:
            df = text_ops.with_token_stats(df)
        out = df.filter(F.col("n_tokens") >= min_tokens)
        if max_tokens is not None:
            out = out.filter(F.col("n_tokens") <= max_tokens)
        return out

    return step


def normalize_text(lowercase: bool = False) -> Callable[[DataFrame], DataFrame]:
    """Append ``text_norm`` (control strip, whitespace collapse, trim,
    optional casefold) — run it FIRST so downstream digests/signatures see
    canonical bytes (:func:`..operators.text.with_normalized_text`)."""

    def step(df: DataFrame) -> DataFrame:
        return text_ops.with_normalized_text(df, lowercase=lowercase)

    return step


def domain_cap(
    key: str,
    max_rows: int,
    order_by=None,
    id_col: str = "doc_id",
) -> Callable[[DataFrame], DataFrame]:
    """Keep at most ``max_rows`` documents per ``key`` value (domain,
    source, ...) — the Gopher/MassiveWeb frequency cap, via the skew-safe
    two-stage top-k (:func:`..operators.packing.cap_per_key`)."""

    def step(df: DataFrame) -> DataFrame:
        from .packing import cap_per_key

        return cap_per_key(df, key, max_rows, order_by=order_by, id_col=id_col)

    return step


def curate(
    df: DataFrame,
    steps: Sequence[Callable[[DataFrame], DataFrame]] = (),
    exact_dedup: bool = True,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Run a curation pipeline: optional exact dedup first (cheapest volume
    reduction), then each annotate/filter step in order.

    ``steps`` entries are ``DataFrame -> DataFrame`` callables — use the
    factories above or any custom transform (e.g. a MinHash near-dup pass
    via :func:`..operators.dedup.lsh_candidate_pairs` keyed to drop
    ``id_b``)."""
    out = dedup.dedup_exact(df, text=text, id_col=id_col) if exact_dedup else df
    for step in steps:
        out = step(out)
    return out
