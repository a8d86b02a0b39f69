"""Text-analysis operators for large-scale training-data pipelines.

Not part of the reference crate (its surface is temporal indexing only —
SURVEY.md §2.2 "explicitly absent"); these are the BASELINE.json north-star
extensions: language-ID, quality scoring, token counting, and document
fingerprinting over a ``documents(doc_id, text, ...)`` table.

Design rules for 100 TB:

* **Built-in JVM expressions only** — ``split`` / ``filter`` / ``aggregate``
  / ``regexp_replace`` lambdas run inside whole-stage codegen; there is no
  Python in the row path, no UDF serialization, no shuffle (all operators
  here are embarrassingly parallel per-row projections).
* Every operator has an exact ANSI-SQL equivalent runnable by DuckDB
  (see ``__spark_entry__.oracle_sql``): same tokenizer regex, same hash
  arithmetic, verified to produce identical integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "STOPWORDS",
    "tokens_col",
    "with_token_stats",
    "with_quality",
    "with_lang_id",
    "with_fingerprint",
    "with_pii_scrub",
    "with_repetition_stats",
    "PII_PATTERNS",
    "ROLLING_HASH_MOD",
]

#: Small per-language stopword lists for the n-gram/stopword-vote language
#: heuristic. Deliberately tiny and frozen: the operator contract is
#: deterministic votes, not linguistic accuracy.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "pour", "dans"),
    "es": ("el", "los", "las", "y", "es", "un", "una", "por", "para", "con"),
}

#: Modulus for the portable rolling hash — a Mersenne prime that keeps
#: ``acc*31 + c`` inside int64 (max acc ≈ 2^31 · 31 + 127 ≪ 2^63).
ROLLING_HASH_MOD = 2_147_483_647


def tokens_col(text: str | Column = "text") -> Column:
    """Whitespace tokens of ``text`` as an array column; empty/blank text →
    empty array (``split`` alone would yield ``['']``)."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def with_token_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Token count + char count + mean token length.

    Token counting here is the whitespace baseline; a BPE-ish subword count
    is approximated by ``n_chars/4`` (the common chars-per-token heuristic),
    kept as arithmetic so the oracle can reproduce it exactly.
    """
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text))
    return df.withColumns(
        {
            "n_tokens": n_tokens.cast("long"),
            "n_chars_m": n_chars.cast("long"),
            "est_bpe_tokens": (n_chars.cast("double") / F.lit(4.0)),
            "avg_token_len": F.when(n_tokens == 0, F.lit(None).cast("double")).otherwise(
                # chars excluding whitespace / token count
                F.length(F.regexp_replace(F.col(text), r"\s", "")).cast("double")
                / n_tokens.cast("double")
            ),
        }
    )


def with_quality(df: DataFrame, text: str = "text") -> DataFrame:
    """Heuristic quality signals + a composite score in [0, 1].

    Ratios are exact integer-division-to-double arithmetic so Spark and the
    DuckDB oracle agree bit-for-bit (no summation-order sensitivity).
    """
    toks = tokens_col(text)
    length = F.length(F.col(text)).cast("double")
    n_tokens = F.size(toks).cast("double")
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    alpha = F.length(F.regexp_replace(F.col(text), "[^a-zA-Z]", "")).cast("double")
    digit = F.length(F.regexp_replace(F.col(text), "[^0-9]", "")).cast("double")
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t))).cast("double")
    empty = length == 0
    alpha_ratio = F.when(empty, F.lit(0.0)).otherwise(alpha / length)
    digit_ratio = F.when(empty, F.lit(0.0)).otherwise(digit / length)
    stop_ratio = F.when(n_tokens == 0, F.lit(0.0)).otherwise(stop_hits / n_tokens)
    score = (
        F.lit(0.5) * alpha_ratio
        + F.lit(0.3) * stop_ratio
        + F.lit(0.2) * (F.lit(1.0) - digit_ratio)
    )
    return df.withColumns(
        {
            "alpha_ratio": alpha_ratio,
            "digit_ratio": digit_ratio,
            "stopword_ratio": stop_ratio,
            "quality_score": score,
        }
    )


def with_lang_id(df: DataFrame, text: str = "text") -> DataFrame:
    """Stopword-vote language ID.

    One vote per token found in a language's stopword list; the winner is
    the highest vote count with fixed precedence ``en > de > fr > es`` on
    ties, ``und`` (undetermined) when no list scores at all. Pure
    ``filter``/``size`` expressions — codegen'd, shuffle-free.
    """
    toks = tokens_col(text)

    def vote_counter(arr: Column) -> Column:
        # Closure factory: a default-arg lambda (lambda t, a=arr: ...) would
        # make PySpark see a 2-parameter higher-order function and mis-bind.
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    votes = {}
    for lang, words in STOPWORDS.items():
        votes[lang] = vote_counter(F.array(*[F.lit(w) for w in words]))
    best = F.greatest(*votes.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in ("en", "de", "fr", "es"):  # fixed precedence
        pred = pred.when(votes[lang] == best, F.lit(lang))
    out = df
    for lang in STOPWORDS:
        out = out.withColumn(f"votes_{lang}", votes[lang].cast("long"))
    return out.withColumn("lang_pred", pred)


def fingerprint_col(text: str | Column = "text") -> Column:
    """Portable rolling polynomial hash of the full text:
    ``h = (h*31 + codepoint) mod (2^31 - 1)``.

    Engine-independent by construction (plain integer arithmetic — verified
    identical in Spark and DuckDB), unlike ``xxhash64``/``md5`` whose
    availability differs. Used for fingerprint dedup and as the shingle hash
    inside MinHash (see :mod:`.dedup`).
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % ROLLING_HASH_MOD,
    )


def with_fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", fingerprint_col(text))


#: PII patterns — deliberately simple heuristics in the RE2 ∩ Java-regex
#: dialect (character classes, bounded repeats, \b; no lookarounds) so the
#: identical pattern runs in Spark codegen AND the DuckDB oracle. The
#: contract is deterministic redaction of these shapes, not NER-grade recall.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+\d{7,15}|\b\d{3}[-.]\d{3,4}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def with_pii_scrub(df: DataFrame, text: str = "text") -> DataFrame:
    """Redact PII-shaped spans and count them per category.

    Adds ``{text}_scrubbed`` (emails → ``<EMAIL>``, phones → ``<PHONE>``,
    IPv4 → ``<IP>``, applied in that order — an email's host part can no
    longer be misread as a phone/IP once replaced) plus ``n_email`` /
    ``n_phone`` / ``n_ipv4`` counts from the ORIGINAL text. Pure
    ``regexp_replace`` / ``regexp_extract_all`` projections — codegen'd,
    shuffle-free, no UDFs."""
    src = F.col(text)
    counts = {
        f"n_{name}": F.size(F.regexp_extract_all(src, F.lit(pat), F.lit(0))).cast("long")
        for name, pat in PII_PATTERNS.items()
    }
    scrubbed = src
    for name, pat in PII_PATTERNS.items():
        scrubbed = F.regexp_replace(
            scrubbed, pat, {"email": "<EMAIL>", "phone": "<PHONE>", "ipv4": "<IP>"}[name]
        )
    return df.withColumns({**counts, f"{text}_scrubbed": scrubbed})


def with_repetition_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Repetition-based quality signals (the C4/RefinedWeb-style filters):

    * ``dup_token_ratio`` — 1 − distinct_tokens / tokens (0 when empty);
    * ``dup_line_ratio`` — 1 − distinct_lines / lines over non-blank lines;
    * ``top_token_ratio`` — frequency share of the most common token.

    Exact integer-to-double arithmetic over ``split`` / ``array_distinct`` /
    ``aggregate`` expressions; DuckDB reproduces every value bit-for-bit
    (see ``tests/test_llm_ops.py``), no Python in the row path."""
    toks = tokens_col(text)
    n = F.size(toks).cast("double")
    nd = F.size(F.array_distinct(toks)).cast("double")
    lines = F.filter(F.split(F.col(text), r"\n"), lambda x: F.length(F.trim(x)) > 0)
    nl = F.size(lines).cast("double")
    nld = F.size(F.array_distinct(lines)).cast("double")
    # max token frequency via a fold over the distinct tokens: for each
    # distinct token count its occurrences — O(distinct · tokens) per row,
    # fine for the ≤ few-KB documents this targets.
    max_freq = F.aggregate(
        F.array_distinct(toks),
        F.lit(0).cast("long"),
        lambda acc, t: F.greatest(
            acc, F.size(F.filter(toks, lambda x: x == t)).cast("long")
        ),
    ).cast("double")
    return df.withColumns(
        {
            "dup_token_ratio": F.when(n == 0, F.lit(0.0)).otherwise(F.lit(1.0) - nd / n),
            "dup_line_ratio": F.when(nl == 0, F.lit(0.0)).otherwise(F.lit(1.0) - nld / nl),
            "top_token_ratio": F.when(n == 0, F.lit(0.0)).otherwise(max_freq / n),
        }
    )
