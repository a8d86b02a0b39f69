"""SemDeDup-style semantic deduplication: cluster-pruned embedding dedup.

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): assign every
embedding to a k-means cluster, compute pairwise cosine similarity ONLY
within each cluster, and drop every item that has a sufficiently-similar
item "before" it in a fixed per-cluster order — keeping, per duplicate
set, the example with the LOWEST cosine similarity to its centroid (the
most cluster-atypical representative, which the paper found best for
downstream quality). The all-pairs matrix the paper builds per cluster
becomes a within-cluster self-join here; nothing is ever all-pairs across
the corpus.

Beyond the reference (a query-acceleration engine with no embedding
operators). Spark-first design:

* cluster assignment is the SAME spherical-k-means expression the IVF
  index uses (:func:`..operators.similarity.with_ivf_cells` semantics:
  first-argmax of exact-fold dots) — SemDeDup on a corpus that already
  has an IVF index reuses its cells for free;
* the only shuffle is the self-join keyed on ``cell`` (AQE skew-split
  applies); per-cluster cost is quadratic in CLUSTER size, so scale is
  governed by k — the paper uses k ≈ N/1000; ``max_cell_rows`` makes the
  bound explicit (refuse at plan time, don't OOM at runtime);
* the greedy "drop if any earlier neighbor ≥ τ" rule compares against ALL
  earlier items (the paper's upper-triangle matrix rule, embarrassingly
  parallel), not just surviving ones — no sequential driver loop;
* thresholds compare the ROUNDED cosine (`round_digits`) so the DuckDB
  oracle (:func:`...oracles.semdedup_sql`) reproduces pair membership
  bit-for-bit.

Ordering contract: items in a cluster are ordered by
``(round(csim), id)`` ascending for ``keep="low_centroid_sim"`` (the
paper's policy — the lowest-centroid-similarity member of every duplicate
set survives), or plain ``id`` for ``keep="min_id"``; ``csim`` is the
cosine to the ASSIGNED centroid. Zero/NULL vectors have NULL cosine to
everything, are never part of a pair, and are always kept.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _vec_matrix, cosine_pair_col, dot_col, norm_sq_col

__all__ = [
    "with_semantic_cells",
    "semantic_dup_pairs",
    "semdedup",
]


def _round_halfup(x: float, nd: int) -> float:
    """Spark's ``F.round`` on DOUBLE: Scala ``BigDecimal(double)`` goes
    through the shortest decimal repr (``Double.toString``), exactly what
    Python ``repr(float)`` produces — so Decimal-on-repr HALF_UP matches
    the expression path bit-for-bit."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal(1).scaleb(-nd), ROUND_HALF_UP))

_KEEPS = ("low_centroid_sim", "min_id")


def _centroid_norms(centroids: Sequence[Sequence[float]]) -> list[float]:
    """Left-fold L2 norms of the centroid constants — the same sequential
    order the oracle's explicit ``+`` chain uses, so the scalar literal is
    bit-identical across engines."""
    out = []
    for c in centroids:
        nsq = 0.0
        for x in c:
            nsq = nsq + float(x) * float(x)
        out.append(nsq**0.5)
    return out


#: Above this many centroids the RECOMPUTED assignment switches from
#: Catalyst expressions to the Arrow-batched numpy kernel: both
#: expression forms are O(k) in PLAN size (k dot-folds, or a k-deep CASE
#: chain on the assigned-cell path), so at the paper's k ~ N/1000 for a
#: large corpus (tens of thousands of cells) analysis/codegen time blows
#: up long before execution. The kernel replays the identical sequential
#: component folds in numpy (same IEEE order — see :func:`_cells_kernel`),
#: so the switch is a physical choice, not a semantics change.
MAX_EXPR_CENTROIDS = 64


def _q8_rows(X, ok, mx=None):
    """Per-row symmetric max-abs int8 codes, BIT-EQUAL to the
    :func:`..ann_index._q8_col` expression: ``round(x / max|x| * 127)``
    with Spark's ``F.round`` HALF_UP (half away from zero on the double's
    shortest decimal repr ≡ its binary value — 0.5 boundaries are exactly
    representable, so the two agree), zero vectors → zero codes. The naive
    ``floor(x + 0.5)`` is NOT that function (x + 0.5 can round up across
    the integer boundary in IEEE, e.g. x = 0.49999999999999994), hence
    the overshoot correction. Returns ``list[np.ndarray | None]`` —
    ``None`` for masked rows (the expression yields NULL there too on
    every input the stream feeds it: masked rows never reach the stored
    projection)."""
    import numpy as np

    if mx is None:
        mx = np.max(np.abs(X), axis=1) if X.shape[1] else np.zeros(len(X))
    with np.errstate(invalid="ignore", divide="ignore"):
        scaled = X / mx[:, None] * 127.0
    pos = scaled >= 0
    cand = np.where(pos, np.floor(scaled + 0.5), np.ceil(scaled - 0.5))
    cand = np.where(pos & (cand - 0.5 > scaled), cand - 1.0, cand)
    cand = np.where(~pos & (cand + 0.5 < scaled), cand + 1.0, cand)
    codes = np.where((mx > 0)[:, None], cand, 0.0)
    codes = np.nan_to_num(codes, nan=0.0).astype(np.int8)
    return [codes[i] if ok[i] else None for i in range(len(codes))]


def _cells_kernel(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str,
    emit_q8: bool = False,
) -> DataFrame:
    """Arrow-batched (cell, csim) assignment for large k: per centroid the
    dot accumulates as ``dim`` sequential column adds (``acc = acc +
    X[:, j] * c[j]`` — the identical left-fold IEEE sequence
    :func:`..similarity.dot_col` codegens), first-argmax picks the cell
    (numpy ``argmax`` = Spark ``array_position(darr, array_max(darr))``
    on ties), and csim divides by the same left-fold norms — pinned equal
    to the expression path by pytest.

    ``emit_q8`` (r15, guide §4 — one crossing, not two): also emit the
    int8 max-abs codes as ``__q8`` from the SAME Arrow pass, so the
    quantized streaming state never pays a second per-row evaluation (the
    ``_q8_col`` interpreted HOF transforms in the decided checkpoint were
    the q8 mode's +0.35 s/batch fixed latency). Bit-equal to the
    expression (:func:`_q8_rows`): zero vectors get zero codes like the
    expression; MASKED rows (NULL/NaN vectors) carry NULL codes — those
    never reach the stored projection (the eligible filter drops them
    with their NULL ``csim``)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    dim = len(centroids[0])
    C = [[float(x) for x in c] for c in centroids]
    cn = _centroid_norms(centroids)

    def fn(vs):
        import pandas as pd

        # _vec_matrix masks NULL/NaN-element rows (Arrow conflates the
        # two in float64 ndarrays) and zero-fills them; the expression
        # path NULLs the same rows (the isnan guard in
        # with_semantic_cells), so the k > MAX_EXPR_CENTROIDS switch
        # can't change cell assignments (r12 review + r12 ADVICE)
        X, ok = _vec_matrix(vs, dim)
        n = len(vs)
        D = np.empty((n, len(C)), dtype=np.float64)
        for ci, c in enumerate(C):
            acc = np.zeros(n, dtype=np.float64)
            for j in range(dim):
                acc = acc + X[:, j] * np.float64(c[j])
            D[:, ci] = acc
        cell0 = np.argmax(D, axis=1)
        cdot = D[np.arange(n), cell0]
        nsq = np.zeros(n, dtype=np.float64)
        for j in range(dim):
            nsq = nsq + X[:, j] * X[:, j]
        denom = np.sqrt(nsq) * np.asarray([cn[i] for i in cell0])
        with np.errstate(invalid="ignore", divide="ignore"):
            csim = np.where(denom == 0.0, np.nan, cdot / denom)
        cells = pd.array(
            np.where(ok, cell0 + 1, 0), dtype="Int64"
        )
        cells[~ok] = pd.NA
        sims = pd.Series(csim, dtype="float64").where(ok & (denom != 0.0))
        out = {"cell": cells, "csim": sims}
        if emit_q8:
            out["q8"] = pd.Series(_q8_rows(X, ok), dtype="object")
        return pd.DataFrame(out)

    schema = "struct<cell: bigint, csim: double>"
    if emit_q8:
        schema = "struct<cell: bigint, csim: double, q8: array<tinyint>>"
    udf = pandas_udf(fn, schema)
    tmp = "__uw_cc"
    out = df.withColumn(tmp, udf(F.col(vec_col).cast("array<double>")))
    out = (
        out.withColumn("cell", F.col(f"{tmp}.cell"))
        .withColumn("csim", F.col(f"{tmp}.csim"))
    )
    if emit_q8:
        out = out.withColumn("__q8", F.col(f"{tmp}.q8"))
    return out.drop(tmp)


def with_semantic_cells(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    assigned_cell_col: str | None = None,
    max_expr_centroids: int = MAX_EXPR_CENTROIDS,
    prefer_kernel: bool = False,
    emit_q8: bool = False,
) -> DataFrame:
    """Append ``cell`` (1-based first-argmax-dot centroid, the IVF
    assignment spec) and ``csim`` (cosine to the assigned centroid; NULL
    for zero/NULL vectors).

    ``assigned_cell_col`` trusts an existing assignment (e.g. the stored
    ``cell`` partition column of a materialized IVF index built from the
    SAME centroids) instead of recomputing the argmax — ``csim`` still
    derives from the centroid constants, so the result is identical to
    the recomputed path whenever the stored assignment is.

    ``max_expr_centroids``: plan-size guard. Recomputed assignment with
    ``k <= max_expr_centroids`` builds k codegen'd dot-folds (the
    oracle-mirrored spec); above it the Arrow kernel
    (:func:`_cells_kernel`, bit-equal folds) takes over so plan
    analysis stays O(1) in k. The assigned-cell path's CASE chain is
    likewise O(k) in plan size — for huge k prefer joining csim from a
    precomputed frame or passing the recompute path.

    ``prefer_kernel=True`` routes the RECOMPUTED assignment through the
    Arrow kernel at ANY k (r14 — measured on the real embeddings table
    at k=16 × dim-64: expression 1.57 s vs kernel 0.34 s per pass, and
    Catalyst ANALYSIS of the k × dim fold tree alone costs ~1 s per
    fresh plan, paid again by every downstream action on the lineage —
    HOF folds are interpreted AND their literal trees are O(k·dim) plan
    nodes). Bit-equal by construction (:func:`_cells_kernel` replays the
    identical sequential IEEE folds; pinned by pytest at the
    MAX_EXPR_CENTROIDS boundary and at small k), so callers that batch
    through Arrow anyway (the kernel pairs path, the streaming corpus
    dedup) default to it; the expression form stays the spec path."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    if emit_q8:
        if assigned_cell_col is not None:
            raise ValueError(
                "emit_q8 requires the recomputed kernel assignment"
            )
        # int8 codes only come from the kernel pass (the whole point is
        # one Arrow crossing); the expression spec has no q8 output
        return _cells_kernel(df, centroids, vec_col, emit_q8=True)
    if assigned_cell_col is None and (
        prefer_kernel or len(centroids) > max_expr_centroids
    ):
        return _cells_kernel(df, centroids, vec_col)
    cnorms = F.array(*[F.lit(n) for n in _centroid_norms(centroids)])
    if assigned_cell_col is None:
        # The k dot-folds are STAGED as a real column and cell/csim read
        # it by reference (r14, the r13 drift's code-correlated share):
        # HOF folds (aggregate/zip_with) fall outside whole-stage
        # codegen, so common-subexpression elimination never applies to
        # them — the single-projection form re-evaluated the whole k x
        # dim fold array once for cell, again for cdot, and again for
        # csim's denominator (measured 2.0 s vs 0.65 s on the real
        # embeddings table at k=16). Catalyst's CollapseProject keeps
        # the stages apart precisely because merging would duplicate
        # non-cheap expressions.
        tmp = "__uw_sd_darr"
        while tmp in df.columns:
            tmp += "_"
        darr = F.array(*[dot_col(vec_col, c) for c in centroids])
        staged = df.withColumn(tmp, darr)
        dc = F.col(tmp)
        cell = F.array_position(dc, F.array_max(dc))
        # NaN-carrying vectors are invalid inputs: NULL their cell so the
        # two physical paths agree across the k > max_expr_centroids
        # boundary (r12 ADVICE). Unguarded, NaN dots ride Spark's
        # NaN-is-largest ordering through array_max/array_position to a
        # REAL cell, while the Arrow kernel cannot even see the
        # difference (NULL elements land as NaN in float64 batches) and
        # masks the row. The detector is isnan(array_max(vec)), not
        # exists(vec, isnan): NaN-is-largest surfaces any NaN ELEMENT in
        # array_max (a codegen'd builtin) where `exists` runs an
        # interpreted per-element lambda — measured 13% vs 9% over the
        # unguarded assignment at 200k x dim-64 (r14; the r13 drift's
        # code-correlated share). Truth tables agree row-for-row: NULL
        # elements are skipped by array_max exactly as isnan(NULL) never
        # fired under exists (both land false/NULL -> the `otherwise`
        # branch, where NULL dots already propagate cell NULL), and an
        # all-NULL or NULL vector gives array_max NULL -> isnan false ->
        # same otherwise branch. Inf-element vectors stay UNmasked on
        # both forms (inf is not NaN), keeping the kernel's
        # first-NaN-dot argmax parity on that edge.
        bad = F.isnan(F.array_max(F.col(vec_col).cast("array<double>")))
        staged = staged.withColumn(
            "cell", F.when(bad, F.lit(None).cast("long")).otherwise(cell)
        )
        cellc = F.col("cell")
        cdot = F.element_at(dc, cellc.cast("int"))
        vnorm = F.sqrt(norm_sq_col(vec_col))
        denom = vnorm * F.element_at(cnorms, cellc.cast("int"))
        csim = F.when(
            denom.isNull() | (denom == 0.0), F.lit(None).cast("double")
        ).otherwise(cdot / denom)
        return staged.withColumn("csim", csim).drop(tmp)
    else:
        # assignment-free for real: evaluate ONE centroid's dot per row —
        # a CASE chain on the stored cell (CreateArray elements behind a
        # non-literal element_at can't be pruned, so the array form would
        # silently pay the full k x dim assignment cost this path claims
        # to skip; r11 review)
        cell = F.col(assigned_cell_col).cast("long")
        cdot = F.lit(None).cast("double")
        for i, c in enumerate(centroids):
            cdot = F.when(cell == i + 1, dot_col(vec_col, c)).otherwise(cdot)
    vnorm = F.sqrt(norm_sq_col(vec_col))
    denom = vnorm * F.element_at(cnorms, cell.cast("int"))
    csim = F.when(
        denom.isNull() | (denom == 0.0), F.lit(None).cast("double")
    ).otherwise(cdot / denom)
    return df.withColumn("cell", cell).withColumn("csim", csim)


def _order_key(keep: str, prefix: str, round_digits: int) -> Column:
    """Total per-cluster order. csim rounds so the oracle's DOUBLE chain
    can't disagree at the last ulp; NULL csim (zero vector) sorts as -2 —
    it can never pair anyway, the key just has to be total."""
    if keep == "low_centroid_sim":
        return F.struct(
            F.coalesce(F.round(F.col(f"{prefix}.csim"), round_digits), F.lit(-2.0)).alias("k1"),
            F.col(f"{prefix}.__sid").alias("k2"),
        )
    return F.struct(F.col(f"{prefix}.__sid").alias("k1"))


def _pairs_kernel(
    assigned: DataFrame,
    dim: int,
    threshold: float,
    keep: str,
    round_digits: int,
    id_type: str,
) -> DataFrame:
    """The paper's per-cluster similarity matrix as ONE Arrow-batched
    ``applyInPandas`` over ``groupBy(cell)``: pair dots accumulate as
    ``dim`` sequential outer-product adds — per pair the IEEE op sequence
    is the identical left fold the expression path / SQL oracle use, so
    signs, thresholds and orderings can never diverge. Rounding goes
    through :func:`_round_halfup` only for the candidates inside half an
    ulp-of-round of the threshold's reach (margin pre-filter), keeping the
    Decimal work off the quadratic path.

    Memory: one cluster materializes in one task — ``c²`` float64s for
    the matrix; ``max_cell_rows`` ≲ 20k keeps that under ~3 GB."""
    import numpy as np
    import pandas as pd

    margin = threshold - (0.5 * 10.0 ** (-round_digits)) - 1e-12

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {"id_keep": [], "id_drop": [], "cell": [], "sim": []}
        )
        if len(pdf) < 2 or pd.isna(pdf["cell"].iloc[0]):
            return empty
        if keep == "low_centroid_sim":
            k1 = np.asarray(
                [
                    -2.0 if pd.isna(c) else _round_halfup(c, round_digits)
                    for c in pdf["csim"]
                ],
                dtype=np.float64,
            )
            order = np.lexsort((pdf["__sid"].to_numpy(), k1))
        else:
            order = np.argsort(pdf["__sid"].to_numpy(), kind="stable")
        p = pdf.iloc[order]
        X, ok = _vec_matrix(p["__v"], dim)
        ids = p["__sid"].to_numpy()
        c = len(p)
        acc = np.zeros((c, c), dtype=np.float64)
        nsq = np.zeros(c, dtype=np.float64)
        for d in range(dim):
            col = X[:, d]
            acc = acc + np.outer(col, col)
            nsq = nsq + col * col
        norms = np.sqrt(nsq)
        denom = np.outer(norms, norms)
        valid = np.outer(ok, ok) & (denom > 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.where(valid, acc / np.where(denom == 0.0, 1.0, denom), -2.0)
        cand = np.triu(sims >= margin, k=1) & valid
        ii, jj = np.nonzero(cand)
        rows = []
        for i, j in zip(ii, jj):
            s = _round_halfup(sims[i, j], round_digits)
            if s >= threshold:
                rows.append((ids[i], ids[j], p["cell"].iloc[0], s))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["id_keep", "id_drop", "cell", "sim"])

    schema = (
        f"id_keep {id_type}, id_drop {id_type}, cell bigint, sim double"
    )
    return assigned.groupBy("cell").applyInPandas(fn, schema)


def corpus_drop_ids(
    batch: DataFrame,
    corpus: DataFrame,
    dim: int,
    threshold: float,
    round_digits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_vec_col: str = "embedding",
) -> DataFrame:
    """ids of ``batch`` rows whose rounded cosine against ANY ``corpus``
    vector in the SAME ``cell`` reaches ``threshold`` — the streaming
    corpus-join drop rule as ONE cogrouped Arrow kernel (r14).

    Bit-equal to the expression form it replaces (``join on cell`` +
    ``F.round(cosine_pair_col(v, corpus_v), nd) >= t``): pair dots and
    norms accumulate as ``dim`` sequential column ops — the identical
    left-fold IEEE sequence :func:`..similarity.cosine_pair_col`
    evaluates per pair — and rounding goes through :func:`_round_halfup`
    (pinned ≡ ``F.round`` on DOUBLE) only for candidates inside the
    margin pre-filter, the :func:`_pairs_kernel` discipline. The
    expression form paid an interpreted per-element lambda for every
    (pair × dim) — measured ~5 s per 2k-row batch against a ~2k-vector
    corpus at dim 64 — plus ~1 s of Catalyst analysis for the HOF plan
    per action. NULL/zero/NaN vectors on either side never pair
    (``_vec_matrix`` mask ≡ NULL-cosine propagation). Both sides shuffle
    once, keyed on cell — the same exchange shape as the join, so the
    100 TB partition-pruned story is unchanged. Corpus vectors may be
    int8 codes (quantized state): they land in float64 exactly like the
    expression path's ``array<tinyint> → array<double>`` cast."""
    import numpy as np
    import pandas as pd

    id_type = batch.schema[id_col].dataType.simpleString()
    margin = threshold - (0.5 * 10.0 ** (-round_digits)) - 1e-12
    b = batch.select(
        F.col(id_col).alias("__bid"), F.col(vec_col).alias("__bv"), "cell"
    )
    c = corpus.select(F.col(corpus_vec_col).alias("__cv"), "cell")

    def fn(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame({"__id": pd.Series([], dtype="object")})
        if len(left) == 0 or len(right) == 0:
            return empty
        B, okb = _vec_matrix(left["__bv"], dim)
        C, okc = _vec_matrix(right["__cv"], dim)
        nb_, nc_ = len(left), len(right)
        acc = np.zeros((nb_, nc_), dtype=np.float64)
        bsq = np.zeros(nb_, dtype=np.float64)
        csq = np.zeros(nc_, dtype=np.float64)
        for d in range(dim):
            bcol, ccol = B[:, d], C[:, d]
            acc = acc + np.outer(bcol, ccol)
            bsq = bsq + bcol * bcol
            csq = csq + ccol * ccol
        denom = np.outer(np.sqrt(bsq), np.sqrt(csq))
        valid = np.outer(okb, okc) & (denom > 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.where(valid, acc / np.where(denom == 0.0, 1.0, denom), -2.0)
        cand = (sims >= margin) & valid
        hit_rows = np.nonzero(cand.any(axis=1))[0]
        ids = []
        for i in hit_rows:
            for j in np.nonzero(cand[i])[0]:
                if _round_halfup(sims[i, j], round_digits) >= threshold:
                    ids.append(left["__bid"].iloc[i])
                    break
        if not ids:
            return empty
        return pd.DataFrame({"__id": ids})

    return (
        b.groupBy("cell")
        .cogroup(c.groupBy("cell"))
        .applyInPandas(fn, f"__id {id_type}")
        .select(F.col("__id").alias(id_col))
    )


def semantic_dup_pairs(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep: str = "low_centroid_sim",
    round_digits: int = 6,
    max_cell_rows: int | None = None,
    use_pandas_udf: bool = True,
    assigned_cell_col: str | None = None,
    csim_col: str | None = None,
) -> DataFrame:
    """Within-cluster near-duplicate pairs ``(id_keep, id_drop, cell,
    sim)``: ``id_keep`` precedes ``id_drop`` in the cluster's keep order
    and ``round(cos, round_digits) >= threshold``. The drop side of the
    SemDeDup rule is exactly ``DISTINCT id_drop`` of this frame.
    ``assigned_cell_col`` trusts a precomputed assignment (see
    :func:`with_semantic_cells`); ``csim_col`` (requires
    ``assigned_cell_col``) additionally trusts a precomputed
    centroid-cosine column, skipping the O(k)-plan CASE chain entirely —
    for callers that already ran :func:`with_semantic_cells` on the same
    centroids (the streaming corpus dedup), the recomputation is pure
    duplicated analysis + execution cost (r14).

    ``use_pandas_udf=True`` (default) computes each cluster's similarity
    matrix in one Arrow-batched numpy kernel (the paper's actual per-
    cluster computation; exact-fold order, pinned equal to the expression
    path by pytest); ``False`` is the expression self-join — the
    oracle-mirrored spec (:func:`...oracles.semdedup_pairs_sql`). Both
    shuffle once, keyed on ``cell``.

    ``max_cell_rows`` (optional, one extra tiny aggregate job) refuses
    oversized clusters at plan time: per-cluster cost is quadratic — and
    on the kernel path one cluster is one task's memory — so the fix,
    retraining with larger k (the paper uses k ~ N/1000), beats an
    executor OOM at 100 TB.
    """
    if keep not in _KEEPS:
        raise ValueError(f"keep must be one of {_KEEPS}, got {keep!r}")
    if not (-1.0 <= threshold <= 1.0):
        raise ValueError(f"threshold must be within [-1, 1], got {threshold}")
    if csim_col is not None:
        if assigned_cell_col is None:
            raise ValueError("csim_col requires assigned_cell_col")
        assigned = df.select(
            F.col(id_col).alias("__sid"),
            F.col(vec_col).alias("__v"),
            F.col(assigned_cell_col).cast("long").alias("cell"),
            F.col(csim_col).alias("csim"),
        )
    else:
        # the kernel pairs path batches through Arrow anyway — take the
        # kernel assignment with it (bit-equal; see with_semantic_cells)
        assigned = with_semantic_cells(
            df, centroids, vec_col, assigned_cell_col=assigned_cell_col,
            prefer_kernel=use_pandas_udf,
        ).select(
            F.col(id_col).alias("__sid"), F.col(vec_col).alias("__v"), "cell", "csim"
        )
    if max_cell_rows is not None:
        top = (
            assigned.groupBy("cell").count().agg(F.max("count").alias("m")).head()
        )
        if top and top["m"] is not None and top["m"] > max_cell_rows:
            raise ValueError(
                f"largest cluster has {top['m']} rows > max_cell_rows="
                f"{max_cell_rows}; retrain with more centroids (the paper "
                "uses k ~ N/1000) or raise the cap"
            )
    if use_pandas_udf:
        dim = len(centroids[0])
        id_type = df.schema[id_col].dataType.simpleString()
        return _pairs_kernel(
            assigned, dim, threshold, keep, round_digits, id_type
        )
    a, b = assigned.alias("a"), assigned.alias("b")
    ka = _order_key(keep, "a", round_digits)
    kb = _order_key(keep, "b", round_digits)
    sim = F.round(cosine_pair_col(F.col("a.__v"), F.col("b.__v")), round_digits)
    return (
        a.join(b, on=[F.col("a.cell") == F.col("b.cell"), ka < kb], how="inner")
        .select(
            F.col("a.__sid").alias("id_keep"),
            F.col("b.__sid").alias("id_drop"),
            F.col("a.cell").alias("cell"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def semdedup(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep: str = "low_centroid_sim",
    round_digits: int = 6,
    max_cell_rows: int | None = None,
    use_pandas_udf: bool = True,
) -> DataFrame:
    """Drop every row with an earlier-ordered within-cluster neighbor at
    ``sim >= threshold`` — the SemDeDup pass. Original columns unchanged;
    an anti-join against the drop set, so survivors keep their data
    row-for-row."""
    drops = semantic_dup_pairs(
        df, centroids, threshold, vec_col, id_col, keep, round_digits,
        max_cell_rows, use_pandas_udf,
    ).select(F.col("id_drop").alias(id_col)).distinct()
    return df.join(drops, on=id_col, how="left_anti")
