"""Materialized ANN index: build once, probe many — the wheel lifecycle
(reference ``build_index``/query split, ``datafusion-uwheel/src/lib.rs:153-239``)
applied to similarity search.

The probe operators in :mod:`.similarity` (``ann_topk`` / ``ivf_topk``)
compute sign-LSH buckets / IVF cell assignments *at query time* over a full
scan — measured **slower than exact brute force** at sf0.1 (BENCH_r01), and
no better at 100 TB. This module fixes the lifecycle: hashing/assignment runs
once at build and the table is written **partitioned by the bucket/cell
key**, so a probe is a partition-pruned parquet read of the matching
directories (Spark skips every other partition at planning time) followed by
the exact cosine rerank over candidates only.

Layouts
-------
* ``kind="lsh"`` — the classic replicated posting-list layout: each row is
  written once per hash table under ``t=<table>/bg=<bucket-group>`` where
  ``bg = bucket DIV group`` caps directories at ``_MAX_DIRS_PER_TABLE`` per
  table (the exact ``bucket`` stays a data column — a probe is a
  directory-pruned read plus a parquet row-group filter on it). A probe
  reads exactly ``tables`` directories. Space cost ×``tables`` (the
  standard LSH trade); more tables/fewer bits raises recall.
* ``kind="ivf"`` — rows partitioned by their single coarse-quantizer
  ``cell`` (``n_centroids`` directories); a probe reads the ``nprobe``
  nearest cells.

Both layouts keep the candidate→exact-rerank semantics of the query-time
operators bit-identical (same seeded hyperplanes/centroids, same fold
cosine), so the same DuckDB oracle SQL validates either path.

A JSON manifest (``_ann_manifest.json``) pins kind/dim/bits/tables/seed at
build; :func:`load_ann_index` refuses probes with mismatched parameters —
the analogue of the wheel registry keying indices by their build config.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (
    cosine_topk,
    hyperplanes,
    ivf_centroids,
    with_ivf_cells,
    with_lsh_buckets,
)

__all__ = ["build_ann_index", "load_ann_index", "AnnIndex"]

_MANIFEST = "_ann_manifest.json"
#: Directory-count valve for the LSH layout: buckets are grouped into at
#: most this many partition directories per hash table (``bg = bucket DIV
#: group``); the exact bucket id stays a data column for row-group filtering.
_MAX_DIRS_PER_TABLE = 64


def _q8_col(vec) -> F.Column:
    """Direction-preserving int8 codes: per-vector symmetric max-abs
    quantization, ``round(x / max|x| * 127)``. Cosine is invariant to a
    positive per-vector scale, so probes rank on the codes with NO scale
    column to carry; zero vectors stay zero. Pure codegen'd expressions."""
    v = F.col(vec) if isinstance(vec, str) else vec
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    return F.when(
        mx > 0,
        F.transform(v, lambda x: F.round(x / mx * 127).cast("byte")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("byte")))


def build_ann_index(
    df: DataFrame,
    path: str,
    kind: str = "lsh",
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    tables: int = 4,
    n_centroids: int = 8,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    quantize: str | None = None,
) -> str:
    """Hash/assign once and write the partitioned index table. Returns
    ``path``. One distributed write job; probes afterwards never recompute
    the ``tables × bits × dim`` (or ``n_centroids × dim``) dot products.

    ``centroids`` (IVF only) overrides the seeded random quantizer with e.g.
    :func:`..similarity.train_ivf_centroids` output; they are pinned in the
    manifest so probes assign the query with the identical quantizer.

    ``quantize="int8"`` stores the vectors as int8 codes instead of
    float64 arrays — ~8× smaller index files/cache/shuffle (the 100 TB
    lever: an embedding index that fits in executor cache probes at memory
    speed). Bucket/cell assignment still happens on the EXACT vectors, so
    the partition layout and candidate sets are identical to an unquantized
    build; only the rerank ranks on the rounded directions (cosine is
    scale-invariant). ``AnnIndex.topk(..., rescore_with=source_df)``
    recovers exact ranking with one bounded join."""
    if dim is None:
        raise ValueError("dim is required (callers know their embedding width)")
    if quantize not in (None, "int8"):
        raise ValueError(f"unknown quantize mode {quantize!r}")
    # One count-star job (footer-only on parquet sources) so the manifest
    # can price staleness later: ``base_rows`` is the population the pinned
    # parameters (hyperplanes / centroids) were fixed against; appends
    # accumulate ``delta_rows`` and :meth:`AnnIndex.staleness` reports the
    # drifted fraction. The wheel registry's "stale never answers"
    # discipline, applied to the one index that could otherwise rot
    # silently on a long stream.
    base_rows = df.count()
    cols = [F.col(id_col), F.col(vec_col)]
    if kind == "lsh":
        bucketed = with_lsh_buckets(df, dim, vec_col, bits, tables, seed)
        if quantize == "int8":
            # AFTER bucketing: hashes see exact vectors, storage sees codes
            bucketed = bucketed.withColumn(vec_col, _q8_col(vec_col))
        # Replicated posting lists: one copy of the row per hash table,
        # partitioned by (t, bucket) → a probe is `tables` directory reads.
        # Every replica also carries ALL bucket ids as data columns, so a
        # probe can claim each row in exactly one table (t's condition
        # excludes rows already matched by tables < t) — candidates are
        # duplicate-free by construction and the probe needs no dedup
        # shuffle: one scan stage, like IVF.
        group = max(1, (1 << bits) // _MAX_DIRS_PER_TABLE)
        all_buckets = [F.col(f"bucket_{j}").alias(f"b{j}") for j in range(tables)]
        # One scan, not ``tables`` (r14, guide §1.2/§2.4): the former
        # per-table union re-evaluated the whole source scan + hyperplane
        # projections once per branch (Catalyst does not share common
        # subplans across union arms) — at scale that is ``tables`` full
        # passes over the table for identical rows. ``posexplode`` over the
        # bucket array emits the same (t, bucket) replica rows from a
        # single pass; ``pos`` IS the table id.
        stacked = bucketed.select(
            *cols,
            *all_buckets,
            F.posexplode(
                F.array(*[F.col(f"bucket_{t}") for t in range(tables)])
            ).alias("t", "bucket"),
        ).withColumn("bg", (F.col("bucket") / group).cast("long"))
        # Directory-count valve: partitioning on the raw bucket id makes
        # tables × 2^bits directories — at bits=8 that is hundreds of dirs
        # whose per-file open/commit overhead dominates small builds and
        # strains file listings at scale. The partition key is the bucket
        # GROUP ``bg = bucket DIV group`` (≤ _MAX_DIRS_PER_TABLE dirs per
        # table); the exact ``bucket`` stays a data column, so a probe is a
        # partition-pruned read of (t, bg) plus a parquet row-group filter
        # on bucket — same candidates, bounded file count. The repartition
        # onto the partition key keeps it one file per directory regardless
        # of input task count (the 100 TB small-files guard).
        stacked.repartition("t", "bg").write.mode("overwrite").partitionBy(
            "t", "bg"
        ).parquet(path)
    elif kind == "ivf":
        cents = centroids if centroids is not None else ivf_centroids(dim, n_centroids, seed)
        celled = with_ivf_cells(df, cents, vec_col).select(*cols, F.col("cell"))
        if quantize == "int8":
            celled = celled.withColumn(vec_col, _q8_col(vec_col))
        celled.repartition("cell").write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(path)
    else:
        raise ValueError(f"unknown ANN index kind {kind!r}")
    manifest = {
        "kind": kind,
        "dim": dim,
        "vec_col": vec_col,
        "id_col": id_col,
        "bits": bits,
        "tables": tables,
        "n_centroids": n_centroids if centroids is None else len(centroids),
        "seed": seed,
        "centroids": centroids,
        "group": max(1, (1 << bits) // _MAX_DIRS_PER_TABLE) if kind == "lsh" else 1,
        "quantize": quantize,
        "base_rows": base_rows,
        "delta_rows": 0,
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f)
    return path


class AnnIndex:
    """Probe handle over a built index directory.

    The reader DataFrame is created once per handle: directory listing and
    schema resolution are paid at load, not per probe (the file-index is
    cached on the plan, so each probe only plans partition pruning)."""

    def __init__(self, spark: SparkSession, path: str, manifest: dict):
        self.spark = spark
        self.path = path
        self.m = manifest
        self._df = self._read()

    def _read(self) -> DataFrame:
        """The probe frame. A quantized index stores int8 codes; they are
        cast back to double AT SCAN TIME (a codegen'd transform in the
        plan), so every probe path ranks on the code DIRECTION unchanged —
        cosine is invariant to the per-vector scale the codes dropped. The
        4× storage/IO/cache saving is the point; the cast costs nothing
        material next to the scan."""
        df = self.spark.read.parquet(self.path)
        if self.m.get("quantize") == "int8":
            vc = self.m["vec_col"]
            df = df.withColumn(
                vc, F.transform(vc, lambda x: x.cast("double"))
            )
        return df

    @property
    def kind(self) -> str:
        return self.m["kind"]

    def append(self, df: DataFrame) -> "AnnIndex":
        """Append new rows into the existing partition layout — incremental
        maintenance, the ANN analogue of the wheels' streaming merge
        (:mod:`...streaming.maintenance`). New vectors are hashed/assigned
        with the **manifest's pinned parameters** (same hyperplanes or
        centroids — a probe cannot tell generations apart), stacked into the
        same ``t=/bucket=`` (or ``cell=``) directories as extra parquet
        files, and the handle's cached reader is refreshed so subsequent
        probes see both generations. One distributed write; existing files
        are never rewritten.

        Raises ``ValueError`` when ``df`` lacks the manifest's id/vec
        columns — the manifest is the contract, callers don't pass
        parameters here (so they cannot mismatch the stored layout)."""
        m = self.m
        id_col, vec_col = m["id_col"], m["vec_col"]
        missing = [c for c in (id_col, vec_col) if c not in df.columns]
        if missing:
            raise ValueError(
                f"append frame lacks manifest column(s) {missing} "
                f"(index at {self.path} stores ({id_col}, {vec_col}))"
            )
        delta_n = df.count()  # priced like the build's count — see there
        cols = [F.col(id_col), F.col(vec_col)]
        if m["kind"] == "lsh":
            group = int(m.get("group", 1))
            bucketed = with_lsh_buckets(
                df, m["dim"], vec_col, m["bits"], m["tables"], m["seed"]
            )
            if m.get("quantize") == "int8":
                bucketed = bucketed.withColumn(vec_col, _q8_col(vec_col))
            all_buckets = [
                F.col(f"bucket_{j}").alias(f"b{j}") for j in range(m["tables"])
            ]
            # one scan, not tables (r14) — same posexplode shape as the
            # build; the former per-table union re-ran the delta scan and
            # hyperplane projections once per table
            stacked = bucketed.select(
                *cols,
                *all_buckets,
                F.posexplode(
                    F.array(
                        *[F.col(f"bucket_{t}") for t in range(m["tables"])]
                    )
                ).alias("t", "bucket"),
            ).withColumn("bg", (F.col("bucket") / group).cast("long"))
            stacked.repartition("t", "bg").write.mode("append").partitionBy(
                "t", "bg"
            ).parquet(self.path)
        else:
            cents = m.get("centroids") or ivf_centroids(
                m["dim"], m["n_centroids"], m["seed"]
            )
            celled = with_ivf_cells(df, cents, vec_col).select(*cols, F.col("cell"))
            if m.get("quantize") == "int8":
                celled = celled.withColumn(vec_col, _q8_col(vec_col))
            celled.repartition("cell").write.mode("append").partitionBy(
                "cell"
            ).parquet(self.path)
        self.m = {
            **m,
            "generations": int(m.get("generations", 1)) + 1,
            "delta_rows": int(m.get("delta_rows", 0)) + delta_n,
        }
        with open(os.path.join(self.path, _MANIFEST), "w") as f:
            json.dump(self.m, f)
        # Refresh the cached reader: its file index was resolved at load and
        # does not see the appended files.
        self._df = self._read()
        return self

    def compact(self) -> "AnnIndex":
        """Rewrite every partition directory into one file and reset the
        generation count — the small-files remedy for streaming appends.

        Each :meth:`append` adds a file generation per touched partition
        (existing files are never rewritten), so at streaming cadence a
        partition decays into many small parquet files whose per-file
        open/footer cost eventually dominates probes — the classic
        small-files failure. Compaction is one distributed job: read all
        generations, repartition onto the partition key (one file per
        directory — the same guard the initial build uses), write to a
        temp location, then atomically swap directories and rewrite the
        manifest. Probe results are identical before and after (same rows,
        same layout, same pinned parameters).

        The swap is two local renames (write temp → move old away → move
        temp in); on an object store, pair appends with a
        rename-by-manifest table format instead."""
        import shutil

        m = self.m
        part_cols = ["t", "bg"] if m["kind"] == "lsh" else ["cell"]
        base = self.path.rstrip("/")
        tmp, old = base + "._compact_tmp", base + "._compact_old"
        for p in (tmp, old):
            if os.path.exists(p):
                shutil.rmtree(p)
        (
            self._df.repartition(*[F.col(c) for c in part_cols])
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(tmp)
        )
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old)
        # Compaction bounds FILES, not parameter drift: base_rows/delta_rows
        # carry through unchanged so staleness() still reports the fraction
        # hashed/assigned after the parameters were pinned. Only retrain()
        # resets them.
        self.m = {**m, "generations": 1}
        with open(os.path.join(self.path, _MANIFEST), "w") as f:
            json.dump(self.m, f)
        self._df = self._read()
        return self

    def staleness(self) -> float:
        """Fraction of the index hashed/assigned AFTER the build pinned its
        parameters: ``delta_rows / (base_rows + delta_rows)``. 0.0 for a
        fresh build or after :meth:`retrain`; compaction does NOT reset it
        (it bounds files, not drift).

        Why it matters: :meth:`append` hashes new vectors with the pinned
        hyperplanes/centroids so probes stay layout-consistent, but a
        trained IVF quantizer fitted on the base population can mis-cell a
        drifted delta and recall decays *silently* — no error, just worse
        neighbours. Every other index in this engine refuses to answer
        stale (wheel freshness gates, shim view revocation); this is the
        ANN side of that contract. Gate on it via
        ``SimilarityEngine(max_delta_fraction=...)`` or check it directly.

        Manifests from builds older than this field fall back to the
        generation count ((generations-1)/generations) — coarser, and reset
        by compact(), but never *understates* a never-compacted stream."""
        base, delta = self.m.get("base_rows"), self.m.get("delta_rows")
        if base is None or delta is None:
            gens = int(self.m.get("generations", 1))
            return (gens - 1) / gens if gens > 1 else 0.0
        total = int(base) + int(delta)
        return int(delta) / total if total else 0.0

    def retrain(
        self,
        source: DataFrame | None = None,
        train_sample: int = 4096,
        train_iters: int = 10,
    ) -> "AnnIndex":
        """Re-pin the index parameters against the CURRENT population and
        rebuild the layout — the remedy :meth:`staleness` prices.

        * Trained-centroid IVF (the drift-prone case): re-runs
          :func:`..similarity.train_ivf_centroids` over ``source`` (or the
          index's own rows) and rebuilds every cell under the new
          quantizer.
        * Seeded LSH / seeded IVF: parameters are data-independent, so this
          is a rebuild + counter reset (recall never drifted; the reset
          records that the layout was re-derived from the full population).

        ``source`` defaults to the index's own stored rows (the ``t=0``
        replica set for LSH — every row appears exactly once per table).
        Quantized indexes REQUIRE an explicit full-precision ``source``:
        their stored int8 codes dropped the per-vector scale, and
        re-hashing rounded directions would move bucket boundaries relative
        to a from-scratch build — silently different candidates. Refusing
        is the same honesty as the wheel router's delegate gates.

        One distributed rebuild (same cost as the original build over
        today's population), then the identical atomic directory swap
        :meth:`compact` uses; the handle serves the old layout until the
        swap completes. Resets ``base_rows``/``delta_rows``/generations."""
        import shutil

        from .similarity import train_ivf_centroids

        m = self.m
        if source is None:
            if m.get("quantize"):
                raise ValueError(
                    "retrain() of a quantized index needs source= with "
                    "full-precision vectors (stored int8 codes dropped the "
                    "per-vector scale; re-hashing them would shift bucket "
                    "assignments relative to a fresh build)"
                )
            rows = self._df
            if m["kind"] == "lsh":
                rows = rows.filter(F.col("t") == 0)
            source = rows.select(m["id_col"], m["vec_col"])
        centroids = None
        if m["kind"] == "ivf" and m.get("centroids"):
            centroids = train_ivf_centroids(
                source,
                m["dim"],
                len(m["centroids"]),
                sample=train_sample,
                iters=train_iters,
                seed=m["seed"],
                vec_col=m["vec_col"],
            )
        base = self.path.rstrip("/")
        tmp, old = base + "._retrain_tmp", base + "._retrain_old"
        for p in (tmp, old):
            if os.path.exists(p):
                shutil.rmtree(p)
        build_ann_index(
            source,
            tmp,
            kind=m["kind"],
            dim=m["dim"],
            vec_col=m["vec_col"],
            id_col=m["id_col"],
            bits=m["bits"],
            tables=m["tables"],
            n_centroids=m["n_centroids"],
            seed=m["seed"],
            centroids=centroids,
            quantize=m.get("quantize"),
        )
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old)
        with open(os.path.join(self.path, _MANIFEST)) as f:
            self.m = json.load(f)
        self._df = self._read()
        return self

    def _query_buckets(self, query) -> list[int]:
        hp = hyperplanes(self.m["dim"], self.m["bits"], self.m["tables"], self.m["seed"])
        out = []
        for planes in hp:
            acc = 0
            for b, plane in enumerate(planes):
                dot = 0.0
                for x, w in zip(query, plane):
                    dot = dot + float(x) * w
                if dot > 0.0:
                    acc |= 1 << b
            out.append(acc)
        return out

    def candidates(self, query, nprobe: int = 2) -> DataFrame:
        """Partition-pruned, duplicate-free candidate read (no rerank) —
        check ``.explain("formatted")`` for ``PartitionFilters``."""
        if len(query) != self.m["dim"]:
            raise ValueError(f"query dim {len(query)} != index dim {self.m['dim']}")
        df = self._df
        if self.kind == "lsh":
            qb = self._query_buckets(query)
            group = int(self.m.get("group", 1))
            cond = None
            for t, b in enumerate(qb):
                # (t, bg) are partition columns → directory pruning; the
                # exact bucket is a data column → parquet row-group filter.
                c = (F.col("t") == t) & (F.col("bucket") == b)
                if group > 1 or "bg" in df.columns:
                    c = c & (F.col("bg") == b // group)
                for j in range(t):  # claimed by an earlier table already
                    c = c & (F.col(f"b{j}") != qb[j])
                cond = c if cond is None else (cond | c)
            out = df.filter(cond)
            return out.drop("bg") if "bg" in df.columns else out
        cents = self.m.get("centroids") or ivf_centroids(
            self.m["dim"], self.m["n_centroids"], self.m["seed"]
        )

        def qdot(c):
            d = 0.0
            for x, w in zip(query, c):
                d = d + float(x) * float(w)
            return d

        order = sorted(range(len(cents)), key=lambda i: -qdot(cents[i]))
        probes = [i + 1 for i in order[:nprobe]]
        return df.filter(F.col("cell").isin(probes))

    def topk(
        self,
        query,
        k: int = 10,
        nprobe: int = 2,
        round_digits: int | None = 6,
        rescore_with: DataFrame | None = None,
        oversample: int = 4,
    ) -> DataFrame:
        """ANN top-k from the materialized index: pruned read + cosine
        rerank. Candidate set (and therefore the result) is identical to the
        query-time operators with the same parameters.

        Candidates arrive duplicate-free (exactly-once claim across tables at
        the storage layout), so both kinds are a single scan-and-TakeOrdered
        stage over the probed partitions.

        ``rescore_with`` (a frame carrying the manifest's id/vec columns at
        FULL precision, e.g. the source embeddings table) recovers exact
        ranking over a quantized index: the quantized rerank keeps the top
        ``k × oversample``, one semi-join pulls their exact vectors, and the
        exact cosine reranks those — the standard two-stage ANN shape, priced
        at one bounded join instead of 8× more index bytes."""
        first = cosine_topk(
            self.candidates(query, nprobe=nprobe),
            query,
            k if rescore_with is None else k * oversample,
            self.m["vec_col"],
            self.m["id_col"],
            round_digits=round_digits,
        )
        if rescore_with is None:
            return first
        id_col, vec_col = self.m["id_col"], self.m["vec_col"]
        for c in (id_col, vec_col):
            if c not in rescore_with.columns:
                raise ValueError(f"rescore frame lacks column {c!r}")
        exact = rescore_with.join(
            F.broadcast(first.select(id_col)), on=id_col, how="semi"
        )
        return cosine_topk(
            exact, query, k, vec_col, id_col, round_digits=round_digits
        )

    def knn_join(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 2,
        q_id: str | None = None,
        q_vec: str | None = None,
        round_digits: int | None = 6,
    ) -> DataFrame:
        """Batch kNN join: for EVERY row of ``queries``, the top-``k``
        index rows by exact cosine — ``(q_id, vec_id, sim, rank)``. The
        all-pairs shape a training pipeline needs (attach nearest
        neighbours to each document) that a single-vector probe cannot
        express without a driver-side loop.

        Plan shape (LSH): queries hashed ONCE with the manifest's pinned
        parameters (Arrow kernel), exploded to ``(t, bucket)`` rows with an
        exactly-once claim across tables, joined to the stored postings on
        the bucket key — a co-located equi-join, never a cartesian — then
        exact fold-cosine rerank and a per-query ``row_number() ≤ k``
        window. IVF: per-query ``nprobe`` nearest cells from the pinned
        quantizer, join on ``cell``. Recall matches the single-vector
        probes with the same parameters (same candidates per query).

        At 100 TB: cost is Σ bucket-join fan-out (linear-ish, tuned by
        bits/tables/nprobe), the rerank is codegen'd, and the window
        partitions by query id — no global sort, no driver loop."""
        from pyspark.sql import Window

        from .similarity import cosine_pair_col, hyperplanes, lsh_buckets_udf

        m = self.m
        q_id = q_id or m["id_col"]
        q_vec = q_vec or m["vec_col"]
        for c in (q_id, q_vec):
            if c not in queries.columns:
                raise ValueError(f"queries frame lacks column {c!r}")
        df = self._df
        # NULL / wrong-dimension query vectors cannot have neighbours: the
        # LSH kernel would fold them to bucket 0 in every table and return
        # plausible-looking bucket-0 rows with NULL sim. Drop them up front
        # (the IVF kernel maps them to NULL cells, which explode() drops —
        # this filter makes the LSH branch match that behavior).
        queries = queries.filter(
            F.col(q_vec).isNotNull() & (F.size(q_vec) == int(m["dim"]))
        )
        if self.kind == "lsh":
            tables, group = m["tables"], int(m.get("group", 1))
            qb = queries.select(
                F.col(q_id).alias("__qid"),
                F.col(q_vec).alias("__qv"),
                lsh_buckets_udf(m["dim"], q_vec, m["bits"], tables, m["seed"]).alias("__qb"),
            )
            # one evaluation of the query-bucket kernel, not tables (r14):
            # the former per-table union re-ran the qb plan (scan + Arrow
            # kernel) once per arm — posexplode emits the same (t, bucket)
            # probe rows from a single pass, and the full __qb array rides
            # along for the claim below
            probes = qb.select(
                "__qid", "__qv", "__qb",
                F.posexplode("__qb").alias("t", "bucket"),
            )
            join_cols = ["t", "bucket"]
            if "bg" in df.columns:
                probes = probes.withColumn(
                    "bg", (F.col("bucket") / group).cast("long")
                )
                join_cols = ["t", "bg", "bucket"]
            cand = probes.join(df, on=join_cols)
            # Exactly-once claim: a (query, row) pair sharing buckets in
            # several tables is kept only in the first (same discipline as
            # candidates()/dup_pairs — no dedup shuffle). Earlier tables
            # (j < t) must have DIFFERING buckets; j >= t passes by
            # construction (was the NULL __qb{j} padding pre-r14).
            once = None
            for j in range(tables - 1):
                clause = (F.lit(j) >= F.col("t")) | (
                    F.col(f"b{j}") != F.element_at("__qb", j + 1)
                )
                once = clause if once is None else (once & clause)
            if once is not None:
                cand = cand.filter(once)
        else:
            import numpy as np

            cents = m.get("centroids") or ivf_centroids(
                m["dim"], m["n_centroids"], m["seed"]
            )

            from pyspark.sql.functions import pandas_udf

            dim = m["dim"]

            def cells_fn(s):
                import pandas as pd

                from .similarity import _seq_dots, _vec_matrix

                X, ok = _vec_matrix(s, dim)
                dots = _seq_dots(X, cents)
                order = np.argsort(-dots, axis=1, kind="stable")[:, :nprobe] + 1
                return pd.Series(
                    [list(map(int, row)) if good else None
                     for row, good in zip(order, ok)]
                )

            cells_udf = pandas_udf(cells_fn, "array<int>")
            qb = queries.select(
                F.col(q_id).alias("__qid"),
                F.col(q_vec).alias("__qv"),
                F.explode(cells_udf(F.col(q_vec))).alias("cell"),
            )
            cand = qb.join(df, on="cell")
        sim = cosine_pair_col("__qv", F.col(m["vec_col"]))
        if round_digits is not None:
            sim = F.round(sim, round_digits)
        w = Window.partitionBy("__qid").orderBy(
            F.col("sim").desc(), F.col(m["id_col"]).asc()
        )
        return (
            cand.withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                F.col("__qid").alias(q_id if q_id != m["id_col"] else "query_id"),
                F.col(m["id_col"]),
                "sim",
                "rank",
            )
        )

    def dup_pairs(self, threshold: float, round_digits: int | None = 6) -> DataFrame:
        """Near-duplicate pairs ``(id_a, id_b, sim ≥ threshold)`` from the
        stored buckets (LSH only): a self-join on the ``(t, bucket)``
        partition key — no query-time rehashing — with an exactly-once pair
        claim (a pair sharing buckets in several tables is kept only in the
        first), then the exact fold-cosine rerank. Same result set as
        :func:`..similarity.embedding_dup_pairs` with matching parameters."""
        return _ann_dup_pairs(self, threshold, round_digits)

    def semdedup_pairs(
        self,
        threshold: float,
        keep: str = "low_centroid_sim",
        round_digits: int = 6,
        max_cell_rows: int | None = None,
        use_pandas_udf: bool = True,
    ) -> DataFrame:
        """SemDeDup pair frame from the stored IVF layout: the manifest's
        centroids (TRAINED ones persist there — this is how a
        pinned-centroid index donates its quantizer to semantic dedup)
        and the materialized ``cell`` partition column feed
        :func:`..semantic_dedup.semantic_dup_pairs` assignment-free.
        Quantized indexes are refused — their stored vectors are lossy
        and SemDeDup cosines must be exact; rebuild full-precision or run
        the operator on the source table."""
        from .semantic_dedup import semantic_dup_pairs

        m = self.m
        if self.kind != "ivf":
            raise ValueError("semdedup_pairs requires an IVF index")
        if m.get("quantize"):
            raise ValueError(
                "semdedup_pairs needs exact cosines; this index stores "
                "int8 codes — rebuild full-precision or run "
                "semantic_dup_pairs on the source table"
            )
        cents = m.get("centroids") or ivf_centroids(
            m["dim"], m["n_centroids"], m["seed"]
        )
        src = self._df.select(m["id_col"], m["vec_col"], "cell")
        return semantic_dup_pairs(
            src, cents, threshold, vec_col=m["vec_col"], id_col=m["id_col"],
            keep=keep, round_digits=round_digits, max_cell_rows=max_cell_rows,
            use_pandas_udf=use_pandas_udf, assigned_cell_col="cell",
        )


def _ann_dup_pairs(
    idx: "AnnIndex",
    threshold: float,
    round_digits: int | None = 6,
) -> DataFrame:
    """Near-duplicate pairs from a materialized LSH index (see
    :meth:`AnnIndex.dup_pairs`)."""
    from .similarity import cosine_pair_col

    m = idx.m
    if idx.kind != "lsh":
        raise ValueError("dup_pairs requires an LSH index")
    id_col, vec_col, tables = m["id_col"], m["vec_col"], m["tables"]
    df = idx._df
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("t"),
        F.col("bucket"),
        *[F.col(f"b{j}").alias(f"__ab{j}") for j in range(tables)],
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("t"),
        F.col("bucket"),
        *[F.col(f"b{j}").alias(f"__bb{j}") for j in range(tables)],
    )
    joined = a.join(b, on=["t", "bucket"]).filter(F.col("id_a") < F.col("id_b"))
    # Exactly-once pair claim: a pair sharing buckets in several tables is
    # kept only in the FIRST such table — for table t, require they did NOT
    # already share table j < t. No dropDuplicates shuffle needed.
    once = None
    for j in range(tables):
        neq = F.col(f"__ab{j}") != F.col(f"__bb{j}")
        cond = F.col("t") > j  # only constrains tables after j
        clause = ~cond | neq
        once = clause if once is None else (once & clause)
    pairs = joined.filter(once)
    sim = cosine_pair_col("__va", "__vb")
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        pairs.withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def load_ann_index(spark: SparkSession, path: str) -> AnnIndex:
    with open(os.path.join(path, _MANIFEST)) as f:
        return AnnIndex(spark, path, json.load(f))
