"""``SimilarityEngine`` — registry + route-or-delegate for similarity search.

The wheel side of this package keeps a registry of built indices and a router
that answers from them when the query shape matches, delegating otherwise
(reference ``UWheelOptimizer``'s wheel registry + rewrite rule,
``datafusion-uwheel/src/lib.rs:72-146``). This module applies the same
lifecycle to ANN search, closing the gap where the materialized index
(:mod:`.operators.ann_index`) existed but nothing routed through it: callers
of :func:`..operators.similarity.ann_topk` / ``ivf_topk`` were paying
query-time hashing over a full scan — measured 2.6–3× slower than brute
force at sf0.1 — even when a matching index had been built.

One engine = one table (parquet path or DataFrame) with one embedding
column. :meth:`build_index` materializes a partitioned ANN index and
registers the handle; :meth:`topk` / :meth:`dup_pairs` consult the registry
and serve a **partition-pruned probe** when a registered index's parameters
match the request, falling back to the query-time operators otherwise —
identical result sets either way (same seeded hyperplanes/centroids, same
exact fold-cosine rerank), so routing is purely a physical decision, like
the wheel router's. ``last_route`` records the decision for tests/benches.

Routing is **exact-parameter matched**: an index only serves requests whose
(kind, bits, tables, seed) / (kind, n_centroids, seed) equal its manifest,
and indexes built with *pinned trained centroids* (``centroids=...`` /
``train=True``) never serve seeded requests — the quantizers differ, so the
result sets would too. Probe a trained index through its returned handle.
"""

from __future__ import annotations

import os
import tempfile
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.ann_index import AnnIndex, build_ann_index, load_ann_index
from .operators.similarity import (
    ann_topk,
    cosine_topk,
    embedding_dup_pairs,
    ivf_centroids,
    ivf_topk,
    train_ivf_centroids,
)

__all__ = ["SimilarityEngine", "SimRoute"]


class SimRoute:
    """Routing decision record (the similarity analogue of
    :class:`..plans.router.RouteDecision`)."""

    def __init__(self, kind: str, detail: dict | None = None):
        self.kind = kind  # "indexed" | "query_time" | "exact"
        self.detail = detail or {}

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"SimRoute({self.kind!r}, {self.detail!r})"


def _lsh_key(bits: int, tables: int, seed: int) -> tuple:
    return ("lsh", bits, tables, seed)


def _ivf_key(n_centroids: int, seed: int) -> tuple:
    return ("ivf", n_centroids, seed)


class SimilarityEngine:
    """Similarity search over one table's embedding column with a
    build-once/probe-many index registry.

    Parameters
    ----------
    spark:
        Active session.
    name:
        Logical table name (used for default index paths).
    source:
        Parquet path or DataFrame holding ``id_col`` and ``vec_col``.
    dim:
        Embedding width. Required — probing it from data would launch a
        Spark job at construction.
    index_root:
        Directory for :meth:`build_index` default paths (a temp dir is
        created lazily when omitted). On a cluster this should be shared
        storage (S3/HDFS) so every executor can read the partitioned layout.
    max_delta_fraction:
        Freshness gate: when a registered index's :meth:`AnnIndex.staleness`
        (fraction of rows appended after its parameters were pinned)
        exceeds this, routing DEGRADES instead of serving the drifted
        layout — :meth:`topk`/:meth:`dup_pairs` fall back to the query-time
        operators (correct, slower), :meth:`knn_join` refuses (its only
        fallback is quadratic). ``None`` (default) keeps the pre-gate
        behavior: indexes serve regardless, callers watch staleness
        themselves. :meth:`retrain` restores routing. This is the
        "stale never answers" discipline the wheel registry and shim views
        already enforce, applied to the one index that can otherwise rot
        silently on a long append stream.
    """

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        source: str | DataFrame,
        dim: int,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        index_root: str | None = None,
        max_delta_fraction: float | None = None,
    ):
        self.spark = spark
        self.name = name
        self.dim = dim
        self.vec_col = vec_col
        self.id_col = id_col
        self.df = (
            spark.read.parquet(source) if isinstance(source, str) else source
        )
        for c in (vec_col, id_col):
            if c not in self.df.columns:
                raise ValueError(f"column {c!r} not in table {name!r}")
        self._index_root = index_root
        self.max_delta_fraction = max_delta_fraction
        #: param-key → AnnIndex, the analogue of ``WheelEngine.agg_wheels``.
        self.indexes: dict[tuple, AnnIndex] = {}
        self.last_route: SimRoute | None = None

    # ------------------------------------------------------------ freshness
    def _fresh(self, idx: AnnIndex) -> bool:
        return (
            self.max_delta_fraction is None
            or idx.staleness() <= self.max_delta_fraction
        )

    def _stale_route(self, kind: str, idx: AnnIndex) -> SimRoute:
        return SimRoute(
            "query_time",
            {
                "kind": kind,
                "reason": "stale",
                "staleness": idx.staleness(),
                "max_delta_fraction": self.max_delta_fraction,
            },
        )

    def staleness(self) -> float:
        """Worst-case drift across the registry: the max
        :meth:`AnnIndex.staleness` over registered indexes (0.0 when none
        are registered or none have appends). Dashboards alert on this; the
        ``max_delta_fraction`` gate acts on it per-index at probe time."""
        return max(
            (idx.staleness() for idx in self.indexes.values()), default=0.0
        )

    def retrain(self, train_sample: int = 4096, train_iters: int = 10) -> int:
        """Re-pin every registered index against the engine's CURRENT
        source table (:meth:`AnnIndex.retrain` with ``source=self.df`` —
        full-precision vectors, so quantized layouts rebuild exactly) and
        reset their staleness, restoring indexed routing under the
        ``max_delta_fraction`` gate. Returns the number retrained.

        Run it wherever :meth:`compact` runs, at the cadence the gate
        implies: compaction bounds files, retraining bounds drift."""
        for idx in self.indexes.values():
            idx.retrain(
                source=self.df.select(self.id_col, self.vec_col),
                train_sample=train_sample,
                train_iters=train_iters,
            )
        return len(self.indexes)

    # -------------------------------------------------------------- builds
    def _default_path(self, key: tuple) -> str:
        if self._index_root is None:
            self._index_root = tempfile.mkdtemp(prefix=f"simidx_{self.name}_")
        return os.path.join(self._index_root, "_".join(str(p) for p in key))

    def build_index(
        self,
        kind: str = "lsh",
        path: str | None = None,
        bits: int = 8,
        tables: int = 4,
        n_centroids: int = 8,
        seed: int = 42,
        train: bool = False,
        train_sample: int = 4096,
        train_iters: int = 10,
        quantize: str | None = None,
    ) -> AnnIndex:
        """Materialize a partitioned ANN index (one distributed write) and
        register the handle so :meth:`topk` / :meth:`dup_pairs` route
        through it — the similarity analogue of
        :meth:`..engine.WheelEngine.build_index` (``lib.rs:153-239``).

        ``train=True`` (IVF only) fits spherical-k-means centroids on a
        seeded sample first; the trained index is returned but NOT
        registered for seeded routing (its quantizer differs — see module
        docstring). ``quantize="int8"`` builds the compact int8-code index
        (~8× smaller — see :func:`..operators.ann_index.build_ann_index`);
        it too is returned unregistered, because its rounded rerank order
        can differ from the query-time operators the routing contract
        promises to match — probe it via the handle
        (``topk(..., rescore_with=...)`` recovers exact order)."""
        centroids = None
        if train:
            if kind != "ivf":
                raise ValueError("train=True applies to kind='ivf' only")
            centroids = train_ivf_centroids(
                self.df, self.dim, n_centroids, sample=train_sample,
                iters=train_iters, seed=seed, vec_col=self.vec_col,
            )
        key = (
            _lsh_key(bits, tables, seed) if kind == "lsh"
            else _ivf_key(n_centroids, seed)
        )
        if path is None:
            tag = (("trained",) if train else ()) + (
                (quantize,) if quantize else ()
            )
            path = self._default_path(key + tag)
        build_ann_index(
            self.df,
            path,
            kind=kind,
            dim=self.dim,
            vec_col=self.vec_col,
            id_col=self.id_col,
            bits=bits,
            tables=tables,
            n_centroids=n_centroids,
            seed=seed,
            centroids=centroids,
            quantize=quantize,
        )
        idx = load_ann_index(self.spark, path)
        if not train and quantize is None:
            self.indexes[key] = idx
        return idx

    def register_index(self, path_or_index: str | AnnIndex) -> AnnIndex:
        """Register an already-built index directory (or handle) for
        routing — the restart story: build once, re-register per session.
        Rejects indexes whose manifest disagrees with this engine's
        table/dim, and never registers pinned-centroid (trained) indexes
        for seeded routing."""
        idx = (
            load_ann_index(self.spark, path_or_index)
            if isinstance(path_or_index, str)
            else path_or_index
        )
        m = idx.m
        if m["dim"] != self.dim or m["vec_col"] != self.vec_col or m["id_col"] != self.id_col:
            raise ValueError(
                f"index manifest {m['kind']}/dim={m['dim']} does not match "
                f"engine table {self.name!r} (dim={self.dim})"
            )
        if m.get("centroids"):
            raise ValueError(
                "trained (pinned-centroid) indexes are probed via their "
                "handle, not registered for seeded routing"
            )
        if m.get("quantize"):
            raise ValueError(
                "quantized indexes are probed via their handle (rounded "
                "rerank order can differ from the query-time operators "
                "routing promises to match), not registered for routing"
            )
        key = (
            _lsh_key(m["bits"], m["tables"], m["seed"])
            if m["kind"] == "lsh"
            else _ivf_key(m["n_centroids"], m["seed"])
        )
        self.indexes[key] = idx
        return idx

    # ------------------------------------------------------------- queries
    def topk(
        self,
        query: Sequence[float],
        k: int = 10,
        kind: str = "lsh",
        bits: int = 8,
        tables: int = 4,
        n_centroids: int = 8,
        nprobe: int = 2,
        seed: int = 42,
        round_digits: int | None = 6,
    ) -> DataFrame:
        """Top-k by cosine similarity, route-or-delegate.

        ``kind="exact"`` is the brute-force scan (always available).
        ``kind="lsh"`` / ``"ivf"``: a registered index with matching
        parameters serves a partition-pruned probe (no rehash of the
        table); otherwise the query-time operator runs — same result set,
        slower physical plan. ``last_route`` tells which happened."""
        if len(query) != self.dim:
            raise ValueError(f"query dim {len(query)} != engine dim {self.dim}")
        if kind == "exact":
            self.last_route = SimRoute("exact")
            return cosine_topk(
                self.df, query, k, self.vec_col, self.id_col, round_digits=round_digits
            )
        if kind == "lsh":
            idx = self.indexes.get(_lsh_key(bits, tables, seed))
            if idx is not None and self._fresh(idx):
                self.last_route = SimRoute("indexed", {"kind": "lsh", "path": idx.path})
                return idx.topk(query, k=k, round_digits=round_digits)
            self.last_route = (
                self._stale_route("lsh", idx)
                if idx is not None
                else SimRoute("query_time", {"kind": "lsh"})
            )
            return ann_topk(
                self.df, query, k, self.vec_col, self.id_col,
                bits=bits, tables=tables, seed=seed, round_digits=round_digits,
            )
        if kind == "ivf":
            idx = self.indexes.get(_ivf_key(n_centroids, seed))
            if idx is not None and self._fresh(idx):
                self.last_route = SimRoute("indexed", {"kind": "ivf", "path": idx.path})
                return idx.topk(query, k=k, nprobe=nprobe, round_digits=round_digits)
            self.last_route = (
                self._stale_route("ivf", idx)
                if idx is not None
                else SimRoute("query_time", {"kind": "ivf"})
            )
            return ivf_topk(
                self.df, query, k, nprobe=nprobe, n_centroids=n_centroids,
                seed=seed, vec_col=self.vec_col, id_col=self.id_col,
                round_digits=round_digits,
            )
        raise ValueError(f"unknown topk kind {kind!r}")

    def dup_pairs(
        self,
        threshold: float,
        bits: int = 8,
        tables: int = 2,
        seed: int = 42,
        round_digits: int | None = 6,
    ) -> DataFrame:
        """Embedding-cosine near-duplicate pairs, route-or-delegate: a
        registered LSH index with matching parameters serves the stored
        bucket self-join (no query-time rehash, exactly-once pair claim);
        otherwise the query-time LSH-bucketed operator runs. Same result
        set either way."""
        idx = self.indexes.get(_lsh_key(bits, tables, seed))
        if idx is not None and self._fresh(idx):
            self.last_route = SimRoute("indexed", {"kind": "lsh", "path": idx.path})
            return idx.dup_pairs(threshold, round_digits=round_digits)
        self.last_route = (
            self._stale_route("lsh", idx)
            if idx is not None
            else SimRoute("query_time", {"kind": "lsh"})
        )
        return embedding_dup_pairs(
            self.df, threshold, self.vec_col, self.id_col,
            bits=bits, tables=tables, seed=seed,
            round_digits=round_digits, dim=self.dim,
        )

    def dup_clusters(
        self,
        threshold: float,
        bits: int = 8,
        tables: int = 2,
        seed: int = 42,
        max_iter: int = 25,
    ) -> DataFrame:
        """Transitive near-dup GROUPS over the embedding space:
        :meth:`dup_pairs` (route-or-delegate) fed through connected
        components (:func:`.operators.dedup.dup_clusters`) — returns
        ``(id, cluster_id)`` with the smallest id as the canonical
        survivor. The pairwise set alone over-/under-deletes on chains;
        this is the keep-one semantics a training pipeline wants."""
        from .operators.dedup import dup_clusters as _cc

        pairs = self.dup_pairs(threshold, bits=bits, tables=tables, seed=seed)
        return _cc(pairs, max_iter=max_iter)

    def semdedup_pairs(
        self,
        threshold: float,
        n_centroids: int = 8,
        seed: int = 42,
        keep: str = "low_centroid_sim",
        round_digits: int = 6,
        max_cell_rows: int | None = None,
        use_pandas_udf: bool = True,
    ) -> DataFrame:
        """SemDeDup pair frame (:func:`.operators.semantic_dedup.
        semantic_dup_pairs`), route-or-delegate under the registry's
        seeded-parity contract: a fresh registered IVF index with matching
        ``(n_centroids, seed)`` donates its stored ``cell`` partition
        column (the registry only ever holds seeded full-precision
        indexes, so stored cells ARE ``with_ivf_cells`` of the seeded
        centroids and appends were assigned with the pinned manifest
        parameters); otherwise the query-time operator assigns cells over
        the engine's source — identical pairs either way. For TRAINED
        (pinned-centroid) indexes probe the handle:
        :meth:`..operators.ann_index.AnnIndex.semdedup_pairs` uses the
        manifest centroids directly."""
        from .operators import semantic_dedup as _sd

        cents = ivf_centroids(self.dim, n_centroids, seed)
        idx = self.indexes.get(_ivf_key(n_centroids, seed))
        if idx is not None and self._fresh(idx):
            self.last_route = SimRoute(
                "indexed", {"kind": "ivf", "path": idx.path}
            )
            src = idx._df.select(
                F.col(idx.m["id_col"]).alias(self.id_col),
                F.col(idx.m["vec_col"]).alias(self.vec_col),
                "cell",
            )
            return _sd.semantic_dup_pairs(
                src, cents, threshold, vec_col=self.vec_col,
                id_col=self.id_col, keep=keep, round_digits=round_digits,
                max_cell_rows=max_cell_rows, use_pandas_udf=use_pandas_udf,
                assigned_cell_col="cell",
            )
        self.last_route = (
            self._stale_route("ivf", idx)
            if idx is not None
            else SimRoute("query_time", {"kind": "ivf"})
        )
        return _sd.semantic_dup_pairs(
            self.df, cents, threshold, vec_col=self.vec_col,
            id_col=self.id_col, keep=keep, round_digits=round_digits,
            max_cell_rows=max_cell_rows, use_pandas_udf=use_pandas_udf,
        )

    def semdedup(
        self,
        threshold: float,
        n_centroids: int = 8,
        seed: int = 42,
        keep: str = "low_centroid_sim",
        round_digits: int = 6,
        max_cell_rows: int | None = None,
        use_pandas_udf: bool = True,
    ) -> DataFrame:
        """Rows of the engine's SOURCE table surviving the SemDeDup pass —
        an anti-join against :meth:`semdedup_pairs`' drop set, so both
        routes return source rows row-for-row."""
        drops = (
            self.semdedup_pairs(
                threshold, n_centroids=n_centroids, seed=seed, keep=keep,
                round_digits=round_digits, max_cell_rows=max_cell_rows,
                use_pandas_udf=use_pandas_udf,
            )
            .select(F.col("id_drop").alias(self.id_col))
            .distinct()
        )
        return self.df.join(drops, on=self.id_col, how="left_anti")

    def append(self, delta: DataFrame) -> int:
        """Incremental maintenance: append a delta of new vectors into every
        registered index's partition layout (each index hashes the delta
        with its own pinned parameters — :meth:`AnnIndex.append`). Returns
        the number of indexes updated.

        The engine's ``df`` is NOT extended by this call: when the source
        table grows (new parquet files land), construct the engine over the
        growing source (path / view) so the query-time fallback and the
        indexes stay in sync, and feed only the delta here."""
        for idx in self.indexes.values():
            idx.append(delta)
        return len(self.indexes)

    def compact(self) -> int:
        """Compact every registered index (:meth:`AnnIndex.compact`) —
        run periodically wherever :meth:`append` runs at streaming cadence,
        so file generations stay bounded. Returns the number compacted."""
        for idx in self.indexes.values():
            idx.compact()
        return len(self.indexes)

    def knn_join(
        self,
        queries: DataFrame,
        k: int = 10,
        kind: str = "lsh",
        bits: int = 8,
        tables: int = 4,
        n_centroids: int = 8,
        nprobe: int = 2,
        seed: int = 42,
        q_id: str | None = None,
        q_vec: str | None = None,
        round_digits: int | None = 6,
    ) -> DataFrame:
        """Batch kNN join (top-``k`` neighbours for every row of
        ``queries``) — :meth:`AnnIndex.knn_join` through the registry.

        ``kind="exact"`` is the brute-force cross-join + per-query window —
        the ground truth for recall checks, priced accordingly (|queries| ×
        |table| similarity evaluations; fine for samples, never for 100 TB).
        ``"lsh"``/``"ivf"`` require a registered index with matching
        parameters and raise otherwise: there is no query-time fallback
        that is not quadratic, so silent degradation is refused."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from .operators.similarity import cosine_pair_col

        q_id = q_id or self.id_col
        q_vec = q_vec or self.vec_col
        if kind == "exact":
            self.last_route = SimRoute("exact")
            qd = queries.select(
                F.col(q_id).alias("__qid"), F.col(q_vec).alias("__qv")
            )
            sim = cosine_pair_col("__qv", F.col(self.vec_col))
            if round_digits is not None:
                sim = F.round(sim, round_digits)
            w = Window.partitionBy("__qid").orderBy(
                F.col("sim").desc(), F.col(self.id_col).asc()
            )
            return (
                qd.crossJoin(self.df)
                .withColumn("sim", sim)
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select(
                    F.col("__qid").alias(
                        q_id if q_id != self.id_col else "query_id"
                    ),
                    F.col(self.id_col),
                    "sim",
                    "rank",
                )
            )
        key = (
            _lsh_key(bits, tables, seed) if kind == "lsh"
            else _ivf_key(n_centroids, seed)
        )
        idx = self.indexes.get(key)
        if idx is None:
            raise ValueError(
                f"no registered {kind} index with matching parameters — "
                "build_index() first (batch kNN has no sub-quadratic "
                "query-time fallback)"
            )
        if not self._fresh(idx):
            # No sub-quadratic fallback exists here, so the gate REFUSES
            # rather than degrading — serving the drifted layout would be
            # silently worse recall, which is the failure mode the gate is
            # for.
            raise ValueError(
                f"{kind} index staleness {idx.staleness():.3f} exceeds "
                f"max_delta_fraction {self.max_delta_fraction} — retrain() "
                "to re-pin its parameters against the current population"
            )
        self.last_route = SimRoute("indexed", {"kind": kind, "path": idx.path})
        return idx.knn_join(
            queries, k=k, nprobe=nprobe, q_id=q_id, q_vec=q_vec,
            round_digits=round_digits,
        )

    # -------------------------------------------------------- persistence
    def save_registry(self, path: str | None = None) -> str:
        """Write the registry manifest (the paths of every registered
        index — the index *data* is already on disk) so a later session can
        :meth:`load_registry` instead of rebuilding: the restart story,
        mirroring :meth:`..engine.WheelEngine.save_indexes`."""
        import json

        if path is None:
            path = self._default_path(("registry",)) + ".json"
        with open(path, "w") as f:
            json.dump({"dim": self.dim, "vec_col": self.vec_col,
                       "id_col": self.id_col,
                       "paths": [idx.path for idx in self.indexes.values()]}, f)
        return path

    def load_registry(self, path: str) -> int:
        """Re-register every index recorded by :meth:`save_registry`
        (manifest-validated per :meth:`register_index`). Returns how many
        were registered."""
        import json

        with open(path) as f:
            reg = json.load(f)
        if reg["dim"] != self.dim:
            raise ValueError(
                f"registry dim {reg['dim']} != engine dim {self.dim}"
            )
        for p in reg["paths"]:
            self.register_index(p)
        return len(reg["paths"])

    # -------------------------------------------------------- introspection
    def list_indexes(self) -> list[dict]:
        """Manifest metadata for every registered index (the analogue of
        :meth:`..engine.WheelEngine.list_indexes`)."""
        return sorted(
            ({**idx.m, "path": idx.path} for idx in self.indexes.values()),
            key=lambda m: m["path"],
        )

    def drop_index(self, kind: str, bits: int = 8, tables: int = 4,
                   n_centroids: int = 8, seed: int = 42) -> bool:
        """Deregister an index (files are left on disk — they are a
        rebuildable cache, and other sessions may hold handles)."""
        key = (
            _lsh_key(bits, tables, seed) if kind == "lsh"
            else _ivf_key(n_centroids, seed)
        )
        return self.indexes.pop(key, None) is not None
