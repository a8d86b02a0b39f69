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
    "with_normalized_text",
    "with_pii_scrub",
    "with_repetition_stats",
    "with_gopher_rules",
    "chunk_documents",
    "gopher_filter",
    "GOPHER_REQUIRED_WORDS",
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


def with_normalized_text(
    df: DataFrame,
    text: str = "text",
    lowercase: bool = False,
) -> DataFrame:
    """Append ``{text}_norm``: the standard pre-dedup/pre-train text
    cleanup (the C4/Gopher-style normalization pass) as pure codegen'd
    expressions — strip C0/C1 control characters (tab/newline become
    spaces first, so words stay separated), collapse whitespace runs to
    one space, trim, and optionally casefold. Deterministic and
    UDF-free; exact digests over ``{text}_norm`` make byte-identical
    re-crawls that differ only in whitespace/controls collapse to one
    document. NULL text stays NULL."""
    src = F.col(text)
    # \p{Cc} covers C0+DEL+C1; translate tab/CR/LF to spaces FIRST so
    # control-stripping never glues adjacent words together
    norm = F.translate(src, "\t\n\r", "   ")
    norm = F.regexp_replace(norm, r"\p{Cc}", "")
    norm = F.regexp_replace(norm, r" {2,}", " ")
    norm = F.trim(norm)
    if lowercase:
        norm = F.lower(norm)
    return df.withColumn(f"{text}_norm", norm)


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


#: The MassiveText/Gopher "required words": a document plausibly written in
#: English contains at least two of these (Rae et al. 2021, §A.1.1).
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def with_gopher_rules(
    df: DataFrame,
    text: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_required_words: int = 2,
) -> DataFrame:
    """The Gopher/MassiveText quality gate (Rae et al. 2021, §A.1.1) as
    per-rule boolean columns plus the combined ``gopher_pass`` — the
    standard pre-training filter between "crawled" and "kept". Defaults are
    the published thresholds; every rule is a codegen'd expression over the
    whitespace tokens / raw lines, no Python in the row path.

    Columns: ``gr_word_count`` (words in [min, max]), ``gr_mean_word_len``
    (mean characters per word in [3, 10]), ``gr_symbol_ratio`` (``#`` or
    ``...``/``…`` per word ≤ 0.1), ``gr_bullet_lines`` (≤ 90% of lines
    start with a bullet), ``gr_ellipsis_lines`` (≤ 30% of lines end with an
    ellipsis), ``gr_alpha_words`` (≥ 80% of words contain a letter),
    ``gr_required_words`` (≥ 2 of the eight Gopher stop words), and
    ``gopher_pass`` (AND of all). Empty documents fail ``gr_word_count``
    and pass the ratio rules vacuously — exactly one deterministic path."""
    toks = tokens_col(text)
    n_words = F.size(toks)
    nw = n_words.cast("double")
    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ).cast("double")
    mean_len = F.when(n_words > 0, total_chars / nw).otherwise(F.lit(0.0))
    hashes = (
        F.length(F.col(text))
        - F.length(F.regexp_replace(F.col(text), r"#", ""))
    ).cast("double")
    # one '…' or one '...' counts once: count '…' plus non-overlapping '...'
    ell_u = F.size(F.split(F.col(text), "…")) - 1
    ell_a = F.size(F.split(F.col(text), r"\.\.\.")) - 1
    symbols = hashes + (ell_u + ell_a).cast("double")
    lines = F.filter(
        F.split(F.col(text), r"\n"), lambda x: F.length(F.trim(x)) > 0
    )
    n_lines = F.size(lines).cast("double")
    bullet_lines = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike(r"^[-*•▪▸]"))
    ).cast("double")
    ellipsis_lines = F.size(
        F.filter(lines, lambda x: F.rtrim(x).rlike(r"(\.\.\.|…)$"))
    ).cast("double")
    alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("double")
    req = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS])
    required_hits = F.size(
        F.array_intersect(F.transform(toks, F.lower), req)
    )
    rules = {
        "gr_word_count": (n_words >= min_words) & (n_words <= max_words),
        "gr_mean_word_len": (n_words > 0)
        & (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "gr_symbol_ratio": F.when(
            n_words == 0, F.lit(True)
        ).otherwise(symbols / nw <= max_symbol_word_ratio),
        "gr_bullet_lines": F.when(n_lines == 0, F.lit(True)).otherwise(
            bullet_lines / n_lines <= max_bullet_line_ratio
        ),
        "gr_ellipsis_lines": F.when(n_lines == 0, F.lit(True)).otherwise(
            ellipsis_lines / n_lines <= max_ellipsis_line_ratio
        ),
        "gr_alpha_words": F.when(n_words == 0, F.lit(True)).otherwise(
            alpha_words / nw >= min_alpha_word_ratio
        ),
        "gr_required_words": required_hits >= min_required_words,
    }
    out = df.withColumns(rules)
    passed = None
    for name in rules:
        c = F.col(name)
        passed = c if passed is None else (passed & c)
    return out.withColumn("gopher_pass", passed)


def gopher_filter(df: DataFrame, text: str = "text", **thresholds) -> DataFrame:
    """Keep only documents passing the Gopher gate — the enforcement form
    of :func:`with_gopher_rules`; original columns unchanged."""
    flagged = with_gopher_rules(df, text=text, **thresholds)
    return flagged.filter("gopher_pass").select(*df.columns)


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long documents into ≤ ``max_tokens``-token chunks with
    ``overlap`` shared tokens between consecutive chunks — the context-
    window prep step between "clean corpus" and "training sequences"
    (packing assembles whole docs; chunking cuts docs the window cannot
    hold).

    Output: ``(id_col, chunk_index, chunk_text, chunk_tokens)`` — one row
    per chunk, ``chunk_index`` 0-based, every token covered, the last
    chunk possibly shorter, consecutive chunks sharing exactly ``overlap``
    tokens (except never past the end). Tokens are the whitespace tokens
    the stats operators use; documents with no tokens produce NO chunks
    (chunking empty text is meaningless — filter beforehand if every doc
    must survive). Pure ``sequence``/``slice``/``explode`` expressions, no
    Python in the row path; the only cost is the explode's row growth
    (Σ ceil(tokens/stride)), embarrassingly parallel per document."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if overlap < 0 or overlap >= max_tokens:
        raise ValueError("overlap must be in [0, max_tokens)")
    stride = max_tokens - overlap
    toks = tokens_col(text)
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - (max_tokens - stride), F.lit(1)), F.lit(stride))
    chunks = F.transform(
        starts, lambda s: F.slice(toks, s, max_tokens)
    )
    return (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.when(n > 0, chunks).otherwise(
                    F.array().cast("array<array<string>>")
                )
            ).alias("chunk_index", "__toks"),
        )
        .select(
            id_col,
            "chunk_index",
            F.concat_ws(" ", "__toks").alias("chunk_text"),
            F.size("__toks").alias("chunk_tokens"),
        )
    )
