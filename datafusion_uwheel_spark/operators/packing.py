"""Training-batch assembly: sequence packing and mixture sampling.

Two operators an LLM training-data pipeline needs between "clean corpus"
and "training batches", both absent from Spark and from the reference
(which stops at query acceleration):

* :func:`pack_sequences` — greedy best-fit-decreasing bin packing of
  documents into fixed-token-budget training sequences. Packing is
  inherently sequential, so it distributes by SHARDING: documents are
  hash-sharded, each shard packs locally inside one Arrow-batched
  ``applyInPandas`` call (sorted-capacity bisect probe, no linear scan
  per doc), and shard-local bin ids are made globally unique by
  offsetting with the shard id. BFD inside a shard wastes at most
  ~(11/9 OPT + 1) bins of that shard — at corpus scale with thousands of
  docs per shard, per-shard waste is noise while the packing itself
  stays embarrassingly parallel.
* :func:`mixture_sample` — weighted blending of several sources toward a
  token budget: per-source Bernoulli sampling at the exact fraction that
  hits the source's share of the budget in expectation. One pass per
  source, no shuffle; sampling fractions are computed from per-source
  token totals (one tiny aggregate each).
* :func:`cap_per_key` / :func:`sample_per_key` — per-domain frequency
  caps and exact-size stratified samples via a skew-safe two-stage
  top-k (shard-local rank, then rank the bounded survivors) — no hot
  key ever funnels through one task.

Neither is SQL-expressible (greedy packing; cross-frame budget math), so
these carry invariant-based pytest coverage instead of a DuckDB oracle —
the documented weaker-check tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cap_per_key", "mixture_sample", "pack_sequences", "sample_per_key"]

#: Bins per shard namespace — shard-local bin ids are offset by
#: ``shard * _SHARD_STRIDE`` for global uniqueness. 10^12 bins per shard
#: is unreachable (a bin holds ≥1 doc and shards hold far fewer docs).
_SHARD_STRIDE = 10**12


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shards: int | None = None,
) -> DataFrame:
    """Assign every document to a training sequence of at most
    ``max_tokens`` total tokens. Returns ``(id_col, tokens_col, seq_id,
    oversize)`` — one row per input document. Documents exceeding
    ``max_tokens`` on their own get singleton sequences with
    ``oversize = true`` (callers decide to truncate or drop; silently
    losing them would corrupt the corpus accounting).

    Deterministic for a fixed ``shards``: sharding is ``xxhash64(id) %
    shards`` and packing sorts by (tokens desc, id) — reruns produce the
    same assignment, so resumed pipelines agree.

    Scale: one shuffle (hash repartition on the shard), then per-shard
    best-fit packing (O(docs·log bins) via a sorted open-capacity list)
    inside ONE ``mapInArrow`` pass per task — a task packs every shard it
    received from a single Arrow table, so per-shard Python/pandas
    group-dispatch overhead (the old ``applyInPandas``: one pandas frame
    per shard, dominant when shards outnumber cores) is gone while the
    assignment stays identical. Memory per task is its shards' (id,
    tokens) pairs only — size ``shards`` so docs/shard stays in the low
    millions."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    spark = df.sparkSession
    if shards is None:
        shards = spark.sparkContext.defaultParallelism * 4

    id_type = dict(df.dtypes)[id_col]

    def _bfd(toks, shard_base, assign):
        """Best-fit-decreasing over ONE shard's token counts (descending,
        id-tiebroken order). Open bins are (remaining_capacity, bin_id)
        pairs kept sorted by capacity: best-fit probes with bisect
        (O(log B)), and a bin is CLOSED (dropped) once its capacity falls
        below the smallest doc still to place — descending order makes
        that the shard's global min, so closed bins never linger and the
        worst case (every doc > max_tokens/2 opening its own bin) stays
        O(D log B), not O(D·B). Oversize singletons and full bins are
        never inserted, so a zero-token doc can't ride along in an
        oversize sequence."""
        from bisect import bisect_left, insort

        open_bins: list[tuple[int, int]] = []
        n_bins = 0
        min_tok = max(int(toks[-1]), 1) if len(toks) else 1
        for i, t in enumerate(toks):
            t = int(t)
            if t > max_tokens:
                assign[i] = shard_base + n_bins
                n_bins += 1  # closed oversize singleton
                continue
            j = bisect_left(open_bins, (t, -1))
            if j < len(open_bins):  # tightest bin that still fits (best-fit)
                cap, b = open_bins.pop(j)
                cap -= t
                assign[i] = shard_base + b
            else:
                cap, b = max_tokens - t, n_bins
                assign[i] = shard_base + b
                n_bins += 1
            if cap >= min_tok:
                insort(open_bins, (cap, b))

    def pack_partition(batches):
        import numpy as np
        import pyarrow as pa

        blist = list(batches)
        if not blist:
            return
        tbl = pa.Table.from_batches(blist)
        if tbl.num_rows == 0:
            return
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        toks = tbl.column(tokens_col).to_numpy(zero_copy_only=False)
        shard = tbl.column("__shard").to_numpy(zero_copy_only=False)
        # one global (shard asc, tokens desc, id asc) sort, then each
        # shard is a contiguous slice already in BFD order
        order = np.lexsort((ids, -toks, shard))
        ids, toks, shard = ids[order], toks[order], shard[order]
        assign = np.empty(len(toks), dtype="int64")
        starts = np.flatnonzero(np.r_[True, shard[1:] != shard[:-1]])
        bounds = np.r_[starts, len(shard)]
        for k in range(len(starts)):
            a, b = int(bounds[k]), int(bounds[k + 1])
            _bfd(toks[a:b], int(shard[a]) * _SHARD_STRIDE, assign[a:b])
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, type=tbl.schema.field(id_col).type),
                pa.array(toks, type=pa.int64()),
                pa.array(assign, type=pa.int64()),
                pa.array(toks > max_tokens, type=pa.bool_()),
            ],
            names=[id_col, tokens_col, "seq_id", "oversize"],
        )

    schema = (
        f"{id_col} {id_type}, {tokens_col} long, seq_id long, oversize boolean"
    )
    return (
        df.select(
            F.col(id_col),
            F.col(tokens_col).cast("long").alias(tokens_col),
            (F.abs(F.xxhash64(F.col(id_col))) % F.lit(shards)).alias("__shard"),
        )
        .repartition(F.col("__shard"))
        .mapInArrow(pack_partition, schema=schema)
    )


def mixture_sample(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    target_tokens: int,
    tokens_col: str = "n_tokens",
    seed: int = 42,
) -> DataFrame:
    """Blend ``sources`` toward ``target_tokens`` total tokens with the
    given mixture ``weights`` (normalized internally). Each source is
    Bernoulli-sampled at ``fraction = weight_share · target / source_total``
    — the expected sampled token mass hits the share exactly; the realized
    mass concentrates around it (relative error ~1/√docs). A fraction > 1
    raises: silently under-delivering a source would skew the mixture
    (upsample by unioning the source with a sampled remainder instead).

    Returns the union with a ``source`` column; no shuffle — each input is
    one filtered pass."""
    if set(sources) != set(weights):
        raise ValueError("sources and weights must have identical keys")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    out = None
    for name in sorted(sources):
        src = sources[name]
        share = weights[name] / total_w * target_tokens
        src_total = src.agg(F.sum(tokens_col)).collect()[0][0] or 0
        if src_total < share:
            raise ValueError(
                f"source {name!r} holds {src_total} tokens but its mixture "
                f"share is {share:.0f} — upsample it explicitly instead of "
                "silently skewing the blend"
            )
        frac = share / src_total
        sampled = src.sample(fraction=float(frac), seed=seed).withColumn(
            "source", F.lit(name)
        )
        out = sampled if out is None else out.unionByName(sampled)
    return out


def cap_per_key(
    df: DataFrame,
    key: str,
    max_rows: int,
    order_by=None,
    id_col: str = "doc_id",
    shards: int = 16,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per ``key`` value — the
    domain-frequency cap every crawl-curation pipeline applies before
    training (a handful of hot domains otherwise dominate the token mix;
    e.g. Gopher/MassiveWeb cap documents per domain). ``order_by`` (a
    Column or list) chooses WHICH rows survive — quality descending,
    recency, ... — with ``id_col`` appended as the deterministic
    tiebreak; default keeps the lowest ids.

    Skew-safe top-k: a single ``row_number() OVER (PARTITION BY key)``
    funnels a hot key's EVERY row through one task — the classic 100 TB
    failure (one domain with 10^9 pages = one straggler task). Instead
    rank within ``(key, shard)`` slices first (shard =
    ``pmod(xxhash64(id), shards)``) and keep ``max_rows`` per slice, then
    rank the ≤ ``max_rows·shards`` survivors per key. Two narrow window
    stages; no task ever holds more than ``max_rows·shards`` rows of any
    one key, regardless of skew. Selection is identical to the one-stage
    form: the global top-k under a total order is contained in the union
    of per-slice top-ks."""
    from pyspark.sql import Window

    if max_rows <= 0:
        raise ValueError(f"max_rows must be positive, got {max_rows}")
    order = list(order_by) if isinstance(order_by, (list, tuple)) else (
        [order_by] if order_by is not None else []
    )
    order = order + [F.col(id_col)]
    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)).cast("int")
    w1 = Window.partitionBy(F.col(key), shard).orderBy(*order)
    pre = (
        df.withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= max_rows)
        .drop("__rk")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        pre.withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= max_rows)
        .drop("__rk")
    )


def sample_per_key(
    df: DataFrame,
    key: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 42,
    shards: int = 16,
) -> DataFrame:
    """Exactly ``min(k, group size)`` UNIFORMLY pseudo-random rows per
    ``key`` value — exact-size stratified sampling (``df.sampleBy`` is
    Bernoulli: group sizes only hit k in expectation). The order is a
    seeded 64-bit hash of the id, so the draw is deterministic across
    runs and executors; the same skew-safe two-stage top-k as
    :func:`cap_per_key` carries it to hot keys."""
    rnd = F.xxhash64(F.col(id_col), F.lit(seed))
    return cap_per_key(
        df, key, k, order_by=[rnd], id_col=id_col, shards=shards
    )
