"""DuckDB oracle-SQL generators mirroring the Spark operators bit-for-bit.

Every non-trivial operator in this engine keeps its arithmetic inside
plain integer math or *sequential left folds*, so an ANSI-SQL spelling of the
same chain reproduces results exactly (verified: rolling hash, fold dot
products, and ratio arithmetic are bit-identical between Spark and DuckDB).
These generators produce that SQL from the same Python constants the Spark
side uses (:data:`..operators.dedup.minhash_params`,
:data:`..operators.text.STOPWORDS`, LSH hyperplanes), so the two sides cannot
drift.

DuckDB specifics relied on (DuckDB ≥ 1.0): ``list_reduce`` /
``list_transform`` / ``list_filter`` lambdas, list comprehensions with
``range()``, 1-based inclusive list slicing ``l[a:b]``, ``string_split``
with an empty separator for per-character splits, and ``'g'``-flag
``regexp_replace`` (Spark's is global by default).
"""

from __future__ import annotations

from .operators.dedup import MINHASH_BANDS, MINHASH_NUM_PERM, minhash_params
from .operators.similarity import hyperplanes, ivf_centroids
from .operators.text import ROLLING_HASH_MOD, STOPWORDS

__all__ = [
    "char_hash_sql",
    "tokens_sql",
    "shingles_sql",
    "minhash_lsh_sql",
    "simhash_sql",
    "lang_id_sql",
    "quality_sql",
    "token_stats_sql",
    "jaccard_pairs_sql",
    "fingerprint_sql",
    "media_features_sql",
    "media_frames_sql",
    "cosine_topk_sql",
    "ann_topk_sql",
    "embedding_dup_pairs_sql",
    "ivf_topk_sql",
    "knn_join_sql",
    "substring_spans_sql",
]

_MOD = ROLLING_HASH_MOD


def char_hash_sql(expr: str) -> str:
    """Rolling polynomial hash ``h = (h*31 + codepoint) mod p`` of a string
    expression — the oracle of :func:`..operators.text.fingerprint_col`."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {_MOD})"
    )


def tokens_sql(col: str = "text") -> str:
    """Whitespace tokens; blank text → empty list (oracle of
    :func:`..operators.text.tokens_col`)."""
    return (
        f"CASE WHEN length(trim({col})) = 0 THEN CAST([] AS VARCHAR[]) "
        f"ELSE string_split_regex(trim({col}), '\\s+') END"
    )


def shingles_sql(toks_expr: str, n: int = 3) -> str:
    """Distinct hashed word-``n``-gram shingles (oracle of
    :func:`..operators.dedup.shingle_hashes_col`)."""
    gram = f"array_to_string(({toks_expr})[i:i+{n - 1}], ' ')"
    return (
        f"list_distinct([{char_hash_sql(gram)} "
        f"for i in range(1, len({toks_expr}) - {n} + 2)])"
    )


def substring_spans_sql(
    table: str = "documents",
    window: int = 20,
    min_count: int = 2,
    cross_doc: bool = False,
) -> str:
    """Oracle of :func:`..operators.substring.duplicate_spans` (exact
    mode, ``keep_first=False``): same tokenizer (:func:`tokens_sql`), same
    single-space gram join, same ``<= window`` island merge — duplicated
    fixed-window spans per document."""
    toks = tokens_sql()
    having = f"count(*) >= {min_count}"
    if cross_doc:
        having += " AND min(doc_id) <> max(doc_id)"
    return f"""
WITH toks AS (
  SELECT doc_id, {toks} AS t FROM {table}
),
grams AS (
  -- parallel unnests zip positionally (same-length lists); empty range
  -- (a doc shorter than the window) emits nothing, like posexplode
  SELECT doc_id,
         unnest([i - 1 for i in range(1, len(t) - {window} + 2)]) AS pos,
         unnest([array_to_string(t[i:i+{window - 1}], ' ')
                 for i in range(1, len(t) - {window} + 2)]) AS g
  FROM toks
),
dup_keys AS (
  SELECT g FROM grams GROUP BY g HAVING {having}
),
dupw AS (
  SELECT gr.doc_id, gr.pos,
         CASE WHEN gr.pos - lag(gr.pos)
              OVER (PARTITION BY gr.doc_id ORDER BY gr.pos) > {window}
              THEN 1 ELSE 0 END AS brk
  FROM grams gr JOIN dup_keys USING (g)
),
isl AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM dupw
)
SELECT doc_id,
       CAST(min(pos) AS INT) AS span_start,
       CAST(max(pos) + {window} AS INT) AS span_end,
       count(*) AS n_windows
FROM isl
GROUP BY doc_id, island
ORDER BY doc_id, span_start"""


def fingerprint_sql(table: str = "documents") -> str:
    return (
        f"SELECT doc_id, {char_hash_sql('text')} AS fingerprint FROM {table}"
    )


def token_stats_sql(table: str = "documents") -> str:
    toks = tokens_sql()
    return f"""
SELECT doc_id,
       CAST(len({toks}) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_m,
       CAST(length(text) AS DOUBLE) / 4.0 AS est_bpe_tokens,
       CASE WHEN len({toks}) = 0 THEN NULL
            ELSE CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                 / CAST(len({toks}) AS DOUBLE) END AS avg_token_len
FROM {table}"""


def pii_scrub_sql(table: str = "documents") -> str:
    """Oracle of :func:`..operators.text.with_pii_scrub` — identical RE2 ∩
    Java-dialect patterns, replacements applied in the same email → phone →
    ipv4 order, counts taken from the original text."""
    from .operators.text import PII_PATTERNS

    e, p, i = (PII_PATTERNS[k] for k in ("email", "phone", "ipv4"))
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(text, '{e}', '<EMAIL>', 'g'),"
        f" '{p}', '<PHONE>', 'g'), '{i}', '<IP>', 'g')"
    )
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{e}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(text, '{i}')) AS BIGINT) AS n_ipv4,
       {scrub} AS text_scrubbed
FROM {table}"""


def repetition_sql(table: str = "documents") -> str:
    """Oracle of :func:`..operators.text.with_repetition_stats` — same
    tokenizer, same fold for the max token frequency."""
    toks = tokens_sql()
    lines = (
        "list_filter(string_split(text, chr(10)), x -> length(trim(x)) > 0)"
    )
    return f"""
WITH q AS (
  SELECT doc_id,
         CAST(len({toks}) AS DOUBLE) AS n,
         CAST(len(list_distinct({toks})) AS DOUBLE) AS nd,
         CAST(len({lines}) AS DOUBLE) AS nl,
         CAST(len(list_distinct({lines})) AS DOUBLE) AS nld,
         CAST(list_aggregate(
           list_transform(list_distinct({toks}),
                          t -> len(list_filter({toks}, x -> x = t))),
           'max') AS DOUBLE) AS max_freq
  FROM {table}
)
SELECT doc_id,
       CASE WHEN n = 0 THEN 0.0 ELSE 1.0 - nd / n END AS dup_token_ratio,
       CASE WHEN nl = 0 THEN 0.0 ELSE 1.0 - nld / nl END AS dup_line_ratio,
       CASE WHEN n = 0 THEN 0.0 ELSE max_freq / n END AS top_token_ratio
FROM q"""


def quality_sql(table: str = "documents") -> str:
    toks = tokens_sql()
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS length,
         CAST(len({toks}) AS DOUBLE) AS n_tokens,
         CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS alpha,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS digit,
         CAST(len(list_filter({toks}, t -> list_contains([{en}], t))) AS DOUBLE) AS stop_hits
  FROM {table}
), r AS (
  SELECT doc_id,
         CASE WHEN length = 0 THEN 0.0 ELSE alpha / length END AS alpha_ratio,
         CASE WHEN length = 0 THEN 0.0 ELSE digit / length END AS digit_ratio,
         CASE WHEN n_tokens = 0 THEN 0.0 ELSE stop_hits / n_tokens END AS stopword_ratio
  FROM q
)
SELECT doc_id, alpha_ratio, digit_ratio, stopword_ratio,
       0.5 * alpha_ratio + 0.3 * stopword_ratio + 0.2 * (1.0 - digit_ratio)
         AS quality_score
FROM r"""


def lang_id_sql(table: str = "documents") -> str:
    toks = tokens_sql()
    votes = {
        lang: f"CAST(len(list_filter({toks}, t -> list_contains("
        f"[{', '.join(repr(w) for w in words)}], t))) AS BIGINT)"
        for lang, words in STOPWORDS.items()
    }
    vote_cols = ",\n         ".join(f"{v} AS votes_{lang}" for lang, v in votes.items())
    best = "greatest(votes_en, votes_de, votes_fr, votes_es)"
    pred = f"CASE WHEN {best} <= 0 THEN 'und'"
    for lang in ("en", "de", "fr", "es"):  # same fixed precedence as Spark
        pred += f" WHEN votes_{lang} = {best} THEN '{lang}'"
    pred += " END"
    return f"""
WITH v AS (
  SELECT doc_id,
         {vote_cols}
  FROM {table}
)
SELECT doc_id, votes_en, votes_de, votes_fr, votes_es, {pred} AS lang_pred
FROM v"""


def jaccard_pairs_sql(
    threshold: float,
    table: str = "documents",
    n: int = 3,
    max_doc_frac: float | None = 0.05,
) -> str:
    """Mirrors :func:`..operators.dedup.jaccard_pairs` including its default
    hot-shingle skew valve: shingles in more than ``max_doc_frac`` of
    documents are dropped and per-doc sizes recomputed — identical integer
    arithmetic on both engines (cap = trunc(count(*) of the raw table · frac),
    same float64 product; raw-table count keeps the Spark side's cap off the
    shingle-kernel path)."""
    toks = tokens_sql()
    if max_doc_frac is None:
        posting_f = "posting"
        sizes = "SELECT id, hs, len(hs) AS nsh FROM sh WHERE len(hs) > 0"
        return f"""
WITH sh AS (
  SELECT doc_id AS id, {shingles_sql(toks, n)} AS hs FROM {table}
), nz AS (
  {sizes}
), posting AS (
  SELECT id, unnest(hs) AS h FROM nz
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ni
  FROM {posting_f} a JOIN {posting_f} b ON a.h = b.h AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       CAST(ni AS DOUBLE) / CAST(na.nsh + nb.nsh - ni AS DOUBLE) AS jaccard
FROM inter
JOIN nz na ON na.id = id_a
JOIN nz nb ON nb.id = id_b
WHERE CAST(ni AS DOUBLE) / CAST(na.nsh + nb.nsh - ni AS DOUBLE) >= {threshold!r}"""
    return f"""
WITH sh AS (
  SELECT doc_id AS id, {shingles_sql(toks, n)} AS hs FROM {table}
), nz AS (
  SELECT id, hs FROM sh WHERE len(hs) > 0
), posting AS (
  SELECT id, unnest(hs) AS h FROM nz
), hot AS (
  SELECT h FROM posting GROUP BY h
  HAVING count(*) > (SELECT GREATEST(5, CAST(trunc(count(*) * {max_doc_frac!r}) AS BIGINT)) FROM {table})
), pf AS (
  SELECT * FROM posting WHERE h NOT IN (SELECT h FROM hot)
), szf AS (
  SELECT id, count(*) AS nsh FROM pf GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ni
  FROM pf a JOIN pf b ON a.h = b.h AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       CAST(ni AS DOUBLE) / CAST(na.nsh + nb.nsh - ni AS DOUBLE) AS jaccard
FROM inter
JOIN szf na ON na.id = id_a
JOIN szf nb ON nb.id = id_b
WHERE CAST(ni AS DOUBLE) / CAST(na.nsh + nb.nsh - ni AS DOUBLE) >= {threshold!r}"""


def minhash_lsh_sql(
    min_est_jaccard: float,
    table: str = "documents",
    n: int = 3,
    k: int = MINHASH_NUM_PERM,
    bands: int = MINHASH_BANDS,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
) -> str:
    """Full MinHash+LSH candidate pairs in SQL, hash params baked from the
    same seeded generator the Spark side uses; mirrors the default
    ``max_bucket_size`` skew valve (over-cap buckets dropped before
    pairing)."""
    a_params, b_params = minhash_params(k, seed)
    r = k // bands
    sig_terms = ", ".join(
        f"list_min(list_transform(hs, x -> ({a} * x + {b}) % {_MOD}))"
        for a, b in zip(a_params, b_params)
    )
    toks = tokens_sql()
    if max_bucket_size is None:
        band_src = "bands"
        cap_cte = ""
    else:
        cap_cte = f""", bcnt AS (
  SELECT b, key, count(*) AS c FROM bands GROUP BY b, key
), bf AS (
  SELECT bands.* FROM bands JOIN bcnt USING (b, key) WHERE bcnt.c <= {max_bucket_size}
)"""
        band_src = "bf"
    return f"""
WITH sh AS (
  SELECT doc_id AS id, {shingles_sql(toks, n)} AS hs FROM {table}
), sig AS (
  SELECT id, [{sig_terms}] AS s FROM sh WHERE len(hs) > 0
), bands AS (
  SELECT id, s, b, array_to_string(s[b*{r}+1 : b*{r}+{r}], '-') AS key
  FROM sig, (SELECT unnest(range(0, {bands})) AS b)
){cap_cte}, pairs AS (
  SELECT DISTINCT a.id AS id_a, b2.id AS id_b, a.s AS sa, b2.s AS sb
  FROM {band_src} a JOIN {band_src} b2 ON a.b = b2.b AND a.key = b2.key AND a.id < b2.id
)
SELECT id_a, id_b,
       CAST(len(list_filter(range(1, {k + 1}), i -> sa[i] = sb[i])) AS DOUBLE)
         / CAST({k} AS DOUBLE) AS est_jaccard
FROM pairs
WHERE CAST(len(list_filter(range(1, {k + 1}), i -> sa[i] = sb[i])) AS DOUBLE)
        / CAST({k} AS DOUBLE) >= {min_est_jaccard!r}"""


def lsh_join_sql(
    min_est_jaccard: float,
    left_sql: str,
    right_sql: str,
    n: int = 3,
    k: int = MINHASH_NUM_PERM,
    bands: int = MINHASH_BANDS,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
) -> str:
    """Oracle of :func:`..operators.dedup.lsh_join`: cross-table MinHash
    banding with the same seeded hash family, per-side bucket caps, and
    DISTINCT pairs (the Spark side's first-band claim keeps each pair
    once; the estimator is band-independent, so DISTINCT matches).
    ``left_sql`` / ``right_sql`` are full SELECTs producing ``(id,
    text)``."""
    a_params, b_params = minhash_params(k, seed)
    r = k // bands
    sig_terms = ", ".join(
        f"list_min(list_transform(hs, x -> ({a} * x + {b}) % {_MOD}))"
        for a, b in zip(a_params, b_params)
    )
    toks = tokens_sql("text")

    def side(tag: str, src: str) -> str:
        cap = ""
        band_src = f"bands_{tag}"
        if max_bucket_size is not None:
            cap = f""", bcnt_{tag} AS (
  SELECT b, key, count(*) AS c FROM bands_{tag} GROUP BY b, key
), bf_{tag} AS (
  SELECT bands_{tag}.* FROM bands_{tag} JOIN bcnt_{tag} USING (b, key)
  WHERE bcnt_{tag}.c <= {max_bucket_size}
)"""
            band_src = f"bf_{tag}"
        return (
            f"""sh_{tag} AS (
  SELECT id, {shingles_sql(toks, n)} AS hs FROM ({src})
), sig_{tag} AS (
  SELECT id, [{sig_terms}] AS s FROM sh_{tag} WHERE len(hs) > 0
), bands_{tag} AS (
  SELECT id, s, b, array_to_string(s[b*{r}+1 : b*{r}+{r}], '-') AS key
  FROM sig_{tag}, (SELECT unnest(range(0, {bands})) AS b)
){cap}""",
            band_src,
        )

    lcte, lsrc = side("l", left_sql)
    rcte, rsrc = side("r", right_sql)
    return f"""
WITH {lcte}, {rcte}, pairs AS (
  SELECT DISTINCT a.id AS id_left, b2.id AS id_right, a.s AS sa, b2.s AS sb
  FROM {lsrc} a JOIN {rsrc} b2 ON a.b = b2.b AND a.key = b2.key
)
SELECT id_left, id_right,
       CAST(len(list_filter(range(1, {k + 1}), i -> sa[i] = sb[i])) AS DOUBLE)
         / CAST({k} AS DOUBLE) AS est_jaccard
FROM pairs
WHERE CAST(len(list_filter(range(1, {k + 1}), i -> sa[i] = sb[i])) AS DOUBLE)
        / CAST({k} AS DOUBLE) >= {min_est_jaccard!r}"""


def fuzzy_decon_sql(
    min_est_jaccard: float = 0.5,
    table: str = "documents",
    holdout_mod: int = 7,
    snippet_chars: int = 400,
    n: int = 3,
    k: int = MINHASH_NUM_PERM,
    bands: int = MINHASH_BANDS,
    seed: int = 42,
) -> str:
    """Oracle of the fuzzy-decontamination registry shape: held-out =
    ``substr(text, 1, snippet_chars)`` of every ``doc_id % holdout_mod ==
    0`` document (the decon_ngram derivation pattern — truncation makes
    the leak NON-verbatim, exactly what the fuzzy guard exists for);
    output = the flagged docs' ``(doc_id, max_est_jaccard)`` rounded."""
    left = f"SELECT doc_id AS id, text FROM {table}"
    right = (
        f"SELECT doc_id AS id, substr(text, 1, {snippet_chars}) AS text "
        f"FROM {table} WHERE doc_id % {holdout_mod} = 0"
    )
    inner = lsh_join_sql(
        min_est_jaccard, left, right, n=n, k=k, bands=bands, seed=seed
    )
    return f"""
SELECT id_left AS doc_id, round(max(est_jaccard), 6) AS max_est_jaccard
FROM ({inner})
GROUP BY id_left
ORDER BY doc_id"""


def near_corpus_sql(
    table: str = "documents",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    seed: int = 42,
    max_bucket_size: int = 1000,
) -> str:
    """DuckDB mirror of the streaming NEAR-dup corpus dedup's two-batch
    replay (``stream_dedup.NearCorpusDedup``, pure banding rule): batch 1
    (``doc_id % 3 == 0``) near-dedupes against itself and records its
    SURVIVORS' LSH bands as corpus state; batch 2 (the rest) drops any doc
    whose band slice collides with that state, then near-dedupes within
    itself under the same rule (transitive keep-lowest — recursive
    min-label connected components). Shingle-less docs pass through
    unrecorded on both batches, exactly like the operator. Defaults match
    ``NearCorpusDedup``'s (n=3, k=32, bands=8, seed=42) and
    ``lsh_candidate_pairs``'s within-batch bucket cap."""
    a_params, b_params = minhash_params(k, seed)
    r = k // bands
    sig_terms = ", ".join(
        f"list_min(list_transform(hs, x -> ({a} * x + {b}) % {_MOD}))"
        for a, b in zip(a_params, b_params)
    )
    toks = tokens_sql()
    return f"""
WITH RECURSIVE sh AS (
  SELECT doc_id AS id, doc_id % 3 = 0 AS in_corpus,
         {shingles_sql(toks, n)} AS hs
  FROM {table}
), sig AS (
  SELECT id, in_corpus, [{sig_terms}] AS s FROM sh WHERE len(hs) > 0
), bnd AS (
  SELECT id, in_corpus, b, array_to_string(s[b*{r}+1 : b*{r}+{r}], '-') AS key
  FROM sig, (SELECT unnest(range(0, {bands})) AS b)
), b1cnt AS (
  SELECT b, key, count(*) AS c FROM bnd WHERE in_corpus GROUP BY b, key
), p1 AS (
  SELECT DISTINCT a.id AS ia, c.id AS ib
  FROM bnd a
  JOIN bnd c ON a.b = c.b AND a.key = c.key AND a.id < c.id
  JOIN b1cnt ON b1cnt.b = a.b AND b1cnt.key = a.key
  WHERE a.in_corpus AND c.in_corpus AND b1cnt.c <= {max_bucket_size}
), e1 AS (
  SELECT ia AS x, ib AS y FROM p1 UNION ALL SELECT ib, ia FROM p1
), reach1(id, lab) AS (
  SELECT id, id FROM sig WHERE in_corpus
  UNION
  SELECT e1.x, reach1.lab FROM reach1 JOIN e1 ON e1.y = reach1.id
), k1 AS (
  SELECT id FROM reach1 GROUP BY id HAVING min(lab) = id
), corpus_bands AS (
  SELECT bnd.b, bnd.key FROM bnd JOIN k1 USING (id) WHERE in_corpus
), hit2 AS (
  SELECT DISTINCT a.id
  FROM bnd a JOIN corpus_bands cb ON a.b = cb.b AND a.key = cb.key
  WHERE NOT a.in_corpus
), s2 AS (
  SELECT id FROM sig
  WHERE NOT in_corpus AND id NOT IN (SELECT id FROM hit2)
), bnd2 AS (
  SELECT bnd.* FROM bnd JOIN s2 USING (id) WHERE NOT in_corpus
), b2cnt AS (
  SELECT b, key, count(*) AS c FROM bnd2 GROUP BY b, key
), p2 AS (
  SELECT DISTINCT a.id AS ia, c.id AS ib
  FROM bnd2 a
  JOIN bnd2 c ON a.b = c.b AND a.key = c.key AND a.id < c.id
  JOIN b2cnt ON b2cnt.b = a.b AND b2cnt.key = a.key
  WHERE b2cnt.c <= {max_bucket_size}
), e2 AS (
  SELECT ia AS x, ib AS y FROM p2 UNION ALL SELECT ib, ia FROM p2
), reach2(id, lab) AS (
  SELECT id, id FROM s2
  UNION
  SELECT e2.x, reach2.lab FROM reach2 JOIN e2 ON e2.y = reach2.id
), k2 AS (
  SELECT id FROM reach2 GROUP BY id HAVING min(lab) = id
)
SELECT id AS doc_id FROM k2
UNION ALL
SELECT doc_id FROM {table}
WHERE doc_id % 3 != 0
  AND doc_id NOT IN (SELECT id FROM sh WHERE len(hs) > 0)
ORDER BY doc_id"""


def simhash_sql(table: str = "documents", bits: int = 32) -> str:
    toks = tokens_sql()
    tok_hash = char_hash_sql("t")
    terms = " + ".join(
        f"CASE WHEN list_sum(list_transform(ths, h -> CASE WHEN "
        f"CAST(floor(h / {1 << b}) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << b} ELSE 0 END"
        for b in range(bits)
    )
    return f"""
WITH th AS (
  SELECT doc_id,
         list_distinct(list_transform({toks}, t -> {tok_hash})) AS ths
  FROM {table}
)
SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM th"""


# ------------------------------------------------------------- multimodal
def _sha_byte(hexpr: str, i: int) -> str:
    """Byte ``i`` of a hex-digest VARCHAR as an INT (nibble lookup — this
    DuckDB build has no hex→int cast)."""
    hi = f"(strpos('0123456789abcdef', substr({hexpr}, {2 * i + 1}, 1)) - 1)"
    lo = f"(strpos('0123456789abcdef', substr({hexpr}, {2 * i + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


def _fake_decode_fold(hexpr: str, n: int) -> str:
    """Left-fold sum of the first ``n`` fake-decoded floats
    (``byte/255.0`` narrowed to FLOAT4 then widened, matching Spark's
    ``array<float>`` storage) — mirrors ``_fake_decode`` +
    ``F.aggregate(cast array<double>)``. ``n ≤ 32`` (one SHA-256 digest)."""
    assert n <= 32
    terms = ", ".join(
        f"CAST(CAST(CAST({_sha_byte(hexpr, i)} AS DOUBLE) / 255.0 AS FLOAT4) AS DOUBLE)"
        for i in range(n)
    )
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [{terms}]), (a, x) -> a + x)"
    )


def media_features_sql(dim: int = 16, table: str = "documents") -> str:
    """Oracle of the deterministic fake feature extractor
    (:func:`..operators.multimodal.extract_features` with ``fake=True``)
    over the contract media fixture (payload = UTF-8 bytes of the text):
    SHA-256(payload ‖ counter₀) bytes → floats, checked as (count, first
    element, sequential fold sum). ``sha256`` here takes VARCHAR, so the
    payload+counter BLOB round-trips through ``decode`` (valid UTF-8: text
    is UTF-8 and the counter bytes are NULs)."""
    h = f"sha256(decode(encode(text) || unhex('00000000')))"
    f0 = f"CAST(CAST(CAST({_sha_byte('hx', 0)} AS DOUBLE) / 255.0 AS FLOAT4) AS DOUBLE)"
    return f"""
WITH h AS (
  SELECT doc_id, {h} AS hx FROM {table}
)
SELECT doc_id, CAST({dim} AS INT) AS dim,
       round({f0}, 6) AS f0,
       round({_fake_decode_fold('hx', dim)}, 6) AS f_sum
FROM h"""


def media_frames_sql(table: str = "documents") -> str:
    """Oracle of the frame sampler (:func:`..operators.multimodal.sample_frames`,
    ``every_ms=1``) over the contract video fixture: ``duration_ms =
    doc_id % 3 + 1`` → that many frames at ``ts_ms = 0, 1, …``; each frame's
    16 floats derive from SHA-256(payload ‖ ts_be64 ‖ counter₀). ``ts < 3``
    keeps every appended byte NUL/ASCII, so the BLOB survives ``decode``."""
    h = (
        "sha256(decode(encode(text) || unhex(lpad(to_hex(ts_ms), 16, '0')) "
        "|| unhex('00000000')))"
    )
    return f"""
WITH v AS (
  SELECT doc_id, text, (doc_id % 3 + 1) AS nf FROM {table}
), fr AS (
  SELECT doc_id, text, CAST(unnest(range(nf)) AS BIGINT) AS ts_ms FROM v
), d AS (
  SELECT doc_id, CAST(ts_ms AS INT) AS frame_idx, ts_ms, {h} AS hx FROM fr
)
SELECT doc_id, frame_idx, ts_ms, round({_fake_decode_fold('hx', 16)}, 6) AS f_sum
FROM d"""


# ------------------------------------------------------------- similarity
def _dot_chain(left: str, right_literals: list[float] | None, dim: int, right: str | None = None) -> str:
    """Explicit left-assoc sum of products — the same fold order as Spark's
    ``F.aggregate`` (which starts at 0.0, so term order is identical)."""
    terms = []
    for i in range(1, dim + 1):
        lhs = f"CAST({left}[{i}] AS DOUBLE)"
        if right_literals is not None:
            rhs = f"CAST('{right_literals[i - 1]!r}' AS DOUBLE)"
        else:
            rhs = f"CAST({right}[{i}] AS DOUBLE)"
        terms.append(f"{lhs} * {rhs}")
    return " + ".join(terms)


def _norm_sq_chain(col: str, dim: int) -> str:
    return " + ".join(
        f"CAST({col}[{i}] AS DOUBLE) * CAST({col}[{i}] AS DOUBLE)"
        for i in range(1, dim + 1)
    )


def cosine_topk_sql(
    query: list[float],
    k: int = 10,
    dim: int = 64,
    table: str = "embeddings",
    exclude_id: int | None = None,
    round_digits: int = 6,
    extra_where: str = "",
) -> str:
    qnorm = 0.0
    for x in query:
        qnorm = qnorm + float(x) * float(x)
    qn_sqrt = qnorm**0.5
    dot = _dot_chain("embedding", [float(x) for x in query], dim)
    nsq = _norm_sq_chain("embedding", dim)
    where = f"WHERE vec_id <> {exclude_id}" if exclude_id is not None else "WHERE 1=1"
    return f"""
SELECT vec_id,
       round(({dot}) / (sqrt({nsq}) * CAST('{qn_sqrt!r}' AS DOUBLE)), {round_digits}) AS sim
FROM {table}
{where} {extra_where}
ORDER BY sim DESC, vec_id ASC
LIMIT {k}"""


def ann_topk_sql(
    query: list[float],
    k: int = 10,
    dim: int = 64,
    bits: int = 4,
    tables: int = 2,
    seed: int = 42,
    table: str = "embeddings",
    exclude_id: int | None = None,
    round_digits: int = 6,
) -> str:
    """Oracle of :func:`..operators.similarity.ann_topk` — the sign-LSH
    candidate filter spelled with the same hyperplane constants and fold
    order, so bucket membership matches exactly."""
    hp = hyperplanes(dim, bits, tables, seed)

    def bucket_expr(planes: list[list[float]]) -> str:
        parts = []
        for b, plane in enumerate(planes):
            dot = _dot_chain("embedding", [float(w) for w in plane], dim)
            parts.append(f"(CASE WHEN ({dot}) > 0.0 THEN {1 << b} ELSE 0 END)")
        return " + ".join(parts)

    def bucket_of(vec: list[float], planes: list[list[float]]) -> int:
        acc = 0
        for b, plane in enumerate(planes):
            d = 0.0
            for x, w in zip(vec, plane):
                d = d + float(x) * float(w)
            if d > 0.0:
                acc |= 1 << b
        return acc

    conds = " OR ".join(
        f"({bucket_expr(planes)}) = {bucket_of([float(x) for x in query], planes)}"
        for planes in hp
    )
    return cosine_topk_sql(
        query,
        k,
        dim,
        table,
        exclude_id,
        round_digits,
        extra_where=f"AND ({conds})",
    )


def ivf_topk_sql(
    query: list[float],
    k: int = 10,
    nprobe: int = 2,
    n_centroids: int = 8,
    seed: int = 42,
    dim: int = 64,
    table: str = "embeddings",
    round_digits: int = 6,
) -> str:
    """Oracle of :func:`..operators.similarity.ivf_topk`: same seeded
    centroids, same fold dots, same first-max cell assignment (DuckDB
    ``list_indexof`` ≡ Spark ``array_position``, both first-occurrence
    1-based)."""
    cents = ivf_centroids(dim, n_centroids, seed)
    ds = ", ".join(_dot_chain("embedding", [float(w) for w in c], dim) for c in cents)

    def qdot(c):
        d = 0.0
        for x, w in zip(query, c):
            d = d + float(x) * float(w)
        return d

    order = sorted(range(n_centroids), key=lambda i: -qdot(cents[i]))
    probes = ", ".join(str(i + 1) for i in order[:nprobe])

    qnorm = 0.0
    for x in query:
        qnorm = qnorm + float(x) * float(x)
    dot = _dot_chain("embedding", [float(x) for x in query], dim)
    nsq = _norm_sq_chain("embedding", dim)
    return f"""
WITH cells AS (
  SELECT vec_id, embedding,
         list_indexof([{ds}], list_max([{ds}])) AS cell
  FROM {table}
)
SELECT vec_id,
       round(({dot}) / (sqrt({nsq}) * CAST('{qnorm**0.5!r}' AS DOUBLE)), {round_digits}) AS sim
FROM cells
WHERE cell IN ({probes})
ORDER BY sim DESC, vec_id ASC
LIMIT {k}"""


def knn_join_sql(
    query_where: str,
    k: int = 5,
    dim: int = 64,
    bits: int = 4,
    tables: int = 2,
    seed: int = 42,
    table: str = "embeddings",
    round_digits: int = 6,
) -> str:
    """Oracle of :meth:`..operators.ann_index.AnnIndex.knn_join` over a query
    frame drawn from the indexed table itself (``query_where`` selects the
    query rows): candidates are rows sharing a sign-LSH bucket with the
    query in ANY table (same hyperplane constants and fold order as the
    index build; the UNION dedup mirrors the exactly-once claim), reranked
    by exact fold cosine with the same round-then-rank tiebreak."""
    hp = hyperplanes(dim, bits, tables, seed)
    bucket_cols = []
    for t, planes in enumerate(hp):
        parts = []
        for b, plane in enumerate(planes):
            dot = _dot_chain("embedding", [float(w) for w in plane], dim)
            parts.append(f"(CASE WHEN ({dot}) > 0.0 THEN {1 << b} ELSE 0 END)")
        bucket_cols.append(" + ".join(parts) + f" AS b{t}")
    bucket_select = ",\n         ".join(bucket_cols)
    branch = (
        "SELECT q.id AS query_id, c.id AS vec_id, q.v AS qv, c.v AS cv "
        "FROM qs q JOIN b c ON q.b{t} = c.b{t}"
    )
    union = "\n  UNION\n  ".join(branch.format(t=t) for t in range(tables))
    pair_dot = _dot_chain("qv", None, dim, right="cv")
    nq = _norm_sq_chain("qv", dim)
    nc = _norm_sq_chain("cv", dim)
    sim = f"round(({pair_dot}) / (sqrt({nq}) * sqrt({nc})), {round_digits})"
    return f"""
WITH b AS (
  SELECT vec_id AS id, embedding AS v,
         {bucket_select}
  FROM {table}
), qs AS (
  SELECT * FROM b WHERE {query_where}
), pairs AS (
  {union}
), scored AS (
  SELECT query_id, vec_id, {sim} AS sim,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY {sim} DESC, vec_id ASC) AS INT) AS rank
  FROM pairs
)
SELECT query_id, vec_id, sim, rank FROM scored WHERE rank <= {k}"""


def embedding_dup_pairs_sql(
    threshold: float,
    dim: int = 64,
    bits: int = 8,
    tables: int = 2,
    seed: int = 42,
    table: str = "embeddings",
    round_digits: int = 6,
) -> str:
    """Oracle of :func:`..operators.similarity.embedding_dup_pairs`: same
    hyperplane constants, same sign-bucket membership, same fold cosine."""
    hp = hyperplanes(dim, bits, tables, seed)
    bucket_cols = []
    for t, planes in enumerate(hp):
        parts = []
        for b, plane in enumerate(planes):
            dot = _dot_chain("embedding", [float(w) for w in plane], dim)
            parts.append(f"(CASE WHEN ({dot}) > 0.0 THEN {1 << b} ELSE 0 END)")
        bucket_cols.append(" + ".join(parts) + f" AS b{t}")
    bucket_select = ",\n         ".join(bucket_cols)
    branch = (
        "SELECT a.id AS id_a, c.id AS id_b, a.v AS va, c.v AS vb "
        "FROM b a JOIN b c ON a.b{t} = c.b{t} AND a.id < c.id"
    )
    union = "\n  UNION\n  ".join(branch.format(t=t) for t in range(tables))
    pair_dot = _dot_chain("va", None, dim, right="vb")
    na = _norm_sq_chain("va", dim)
    nb = _norm_sq_chain("vb", dim)
    sim = f"round(({pair_dot}) / (sqrt({na}) * sqrt({nb})), {round_digits})"
    return f"""
WITH b AS (
  SELECT vec_id AS id, embedding AS v,
         {bucket_select}
  FROM {table}
), pairs AS (
  {union}
)
SELECT id_a, id_b, {sim} AS sim
FROM pairs
WHERE {sim} >= {threshold!r}"""


def _semdedup_keyed_cte(
    centroids: list[list[float]],
    dim: int,
    table: str,
    id_sql: str,
    round_digits: int,
    keep: str,
) -> str:
    """Shared CTE prefix of the SemDeDup oracles: cell assignment (same
    first-argmax-dot spec as the IVF oracle), cosine to the assigned
    centroid, and the per-cluster keep-order key."""
    ds = ", ".join(_dot_chain("embedding", [float(w) for w in c], dim) for c in centroids)
    nsq = _norm_sq_chain("embedding", dim)
    # left-fold centroid norms -> bit-identical literals vs the Spark side
    cns = []
    for c in centroids:
        s = 0.0
        for x in c:
            s = s + float(x) * float(x)
        cns.append(f"CAST('{s ** 0.5!r}' AS DOUBLE)")
    cnorms = f"[{', '.join(cns)}]"
    if keep == "low_centroid_sim":
        key = f"(COALESCE(round(csim, {round_digits}), -2.0), id)"
    else:
        key = "(id)"
    return f"""
WITH d AS (
  SELECT {id_sql} AS id, embedding, [{ds}] AS darr, {nsq} AS nsq FROM {table}
), asg AS (
  SELECT id, embedding, nsq,
         list_indexof(darr, list_max(darr)) AS cell,
         darr[list_indexof(darr, list_max(darr))] AS cdot
  FROM d
), keyed AS (
  SELECT id, embedding, cell,
         CASE WHEN sqrt(nsq) * {cnorms}[cell] = 0 THEN NULL
              ELSE cdot / (sqrt(nsq) * {cnorms}[cell]) END AS csim
  FROM asg
), ordered AS (
  SELECT id, embedding, cell, csim, {key} AS k FROM keyed
), pairs AS (
  SELECT a.id AS id_keep, b.id AS id_drop, a.cell AS cell,
         CASE WHEN sqrt({_norm_sq_chain('a.embedding', dim)})
                   * sqrt({_norm_sq_chain('b.embedding', dim)}) = 0 THEN NULL
              ELSE round(({_dot_chain('a.embedding', None, dim, right='b.embedding')})
                         / (sqrt({_norm_sq_chain('a.embedding', dim)})
                            * sqrt({_norm_sq_chain('b.embedding', dim)})),
                         {round_digits}) END AS sim
  FROM ordered a JOIN ordered b ON a.cell = b.cell AND a.k < b.k
)"""


def semdedup_pairs_sql(
    centroids: list[list[float]],
    threshold: float,
    dim: int = 64,
    table: str = "embeddings",
    id_sql: str = "vec_id",
    keep: str = "low_centroid_sim",
    round_digits: int = 6,
) -> str:
    """Oracle of :func:`..operators.semantic_dedup.semantic_dup_pairs`:
    same centroid constants, same first-max cell assignment, same rounded
    keep-order key and rounded pair cosine."""
    cte = _semdedup_keyed_cte(centroids, dim, table, id_sql, round_digits, keep)
    return f"""{cte}
SELECT id_keep, id_drop, cell, sim FROM pairs WHERE sim >= {threshold!r}"""


def semdedup_sql(
    centroids: list[list[float]],
    threshold: float,
    dim: int = 64,
    table: str = "embeddings",
    id_sql: str = "vec_id",
    keep: str = "low_centroid_sim",
    round_digits: int = 6,
    select: str = "*",
) -> str:
    """Oracle of :func:`..operators.semantic_dedup.semdedup`: the rows
    surviving the drop set (``DISTINCT id_drop`` of the pairs frame)."""
    cte = _semdedup_keyed_cte(centroids, dim, table, id_sql, round_digits, keep)
    return f"""{cte}
SELECT {select} FROM {table}
WHERE {id_sql} NOT IN (
  SELECT DISTINCT id_drop FROM pairs WHERE sim >= {threshold!r})"""


def contamination_sql(
    n: int = 3, holdout_mod: int = 7, table: str = "documents"
) -> str:
    """DuckDB mirror of :func:`operators.contamination.with_contamination`
    over a ``doc_id % holdout_mod`` train/held-out split. Joins the n-gram
    STRINGS where the Spark side joins their xxhash64 hashes — identical
    counts barring ~2^-64 collisions (the hash exists only to keep the
    Spark shuffle narrow; the SEMANTICS are shared distinct grams)."""
    return f"""\
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> len(t) > 0) AS toks
  FROM {table}
), grams AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {n}
              THEN list_distinct(list_transform(
                     generate_series(1, len(toks) - {n - 1}),
                     i -> array_to_string(toks[i:i+{n - 1}], ' ')))
              ELSE [] END AS gs
  FROM tok
), ho AS (
  SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % {holdout_mod} = 0
), tr AS (
  SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % {holdout_mod} <> 0
), shared AS (
  SELECT tr.doc_id, count(*) AS n_shared_ngrams
  FROM tr JOIN ho USING (g) GROUP BY tr.doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_shared_ngrams, 0) AS n_shared_ngrams,
       COALESCE(s.n_shared_ngrams, 0) > 0 AS contaminated
FROM {table} d LEFT JOIN shared s USING (doc_id)
WHERE d.doc_id % {holdout_mod} <> 0
ORDER BY d.doc_id"""
