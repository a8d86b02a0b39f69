"""Ingestion-time exact dedup: drop documents already seen — in the
historical corpus or earlier in the stream — as they arrive.

The batch dedup operators (:mod:`.dedup`) assume the whole corpus is in
front of them; an LLM-data INGEST pipeline instead sees an endless stream
of crawled documents and must answer "have we EVER kept this content
before?" per micro-batch. Beyond the reference (which has no streaming
surface at all) — two pieces:

* :class:`CorpusDedup` — a persistent digest set (hash-bucketed parquet)
  plus a ``filter_batch`` that keeps only never-seen content and records
  what it kept. Drive it from Structured Streaming via :meth:`attach`
  (``foreachBatch``) or call it directly from batch code.
* :func:`dedup_within_stream` — the bounded-lateness form for unbounded
  ``readStream`` pipelines: Spark's own watermarked state
  (``dropDuplicatesWithinWatermark``), for when "seen before" only needs
  to look back ``delay`` worth of event time.

100 TB design: the state table is ONLY digests (32-char md5 per kept doc —
~3 orders of magnitude smaller than the corpus) laid out in
``bucket=pmod(xxhash64(digest), n_buckets)`` partition dirs. A micro-batch
touches just the buckets its own digests hash into: the anti-join reads
those partition dirs and nothing else (file-source partition pruning), so
per-batch cost scales with the BATCH, not the corpus. Appends are
per-bucket parquet appends; :meth:`compact` folds the accumulated small
files and drops any digests double-recorded by replayed batches (the state
is a SET — duplicate rows cost space, never correctness).

Retried micro-batches (foreachBatch is at-least-once) re-filter against a
state that already holds their digests, so replays emit FEWER rows, never
duplicates — the failure mode a dedup sink wants.

NULL text carries no content to match: such rows pass through unfiltered
and are never recorded.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["CorpusDedup", "dedup_within_stream"]

_STATE_SCHEMA = "digest string, bucket int"


class CorpusDedup:
    """Persistent exact-dedup state over a parquet digest set.

    ``filter_batch`` is the whole contract: give it any DataFrame with the
    configured text/id columns, get back the rows whose content was never
    seen (in-batch duplicates keep the lowest id), with the state updated.
    """

    def __init__(
        self,
        spark,
        state_dir: str,
        text: str = "text",
        id_col: str = "doc_id",
        n_buckets: int = 256,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.text = text
        self.id_col = id_col
        self.n_buckets = n_buckets

    # ------------------------------------------------------------ internals

    def _digests(self, df: DataFrame) -> DataFrame:
        d = F.md5(F.col(self.text))
        return df.select(
            F.col(self.id_col),
            d.alias("digest"),
            F.pmod(F.xxhash64(d), F.lit(self.n_buckets))
            .cast("int")
            .alias("bucket"),
        )

    def _state(self) -> DataFrame | None:
        if not os.path.isdir(self.state_dir):
            return None
        try:
            return self.spark.read.schema(_STATE_SCHEMA).parquet(
                self.state_dir
            )
        except Exception:
            return None  # empty dir: no batch recorded yet

    def seen_count(self) -> int:
        """Recorded digests (including any replay double-records until the
        next :meth:`compact`)."""
        s = self._state()
        return 0 if s is None else s.count()

    # -------------------------------------------------------------- filter

    def filter_batch(self, batch_df: DataFrame) -> DataFrame:
        """Rows of ``batch_df`` whose content digest is NEW — not in the
        corpus state and not earlier (lower id) in this batch — with those
        digests recorded. NULL-text rows pass through and are not recorded.

        One shuffle on the digest (in-batch keep-lowest), one anti-join
        against ONLY the state buckets this batch touches (partition-pruned
        scan), one per-bucket parquet append."""
        digests = self._digests(batch_df).filter(F.col("digest").isNotNull())
        # in-batch: lowest id per digest
        keep = (
            digests.groupBy("digest", "bucket")
            .agg(F.min(self.id_col).alias(self.id_col))
        )
        state = self._state()
        if state is not None:
            touched = [
                r["bucket"]
                for r in keep.select("bucket").distinct().collect()
            ]
            if touched:
                pruned = state.filter(F.col("bucket").isin(touched))
                keep = keep.join(pruned, on="digest", how="left_anti")
        # localCheckpoint CUTS the lineage before the state append: the
        # append's refreshByPath invalidates any cached plan that still
        # reads the state files (the anti-join), and a recompute after the
        # append would see this batch's own digests and emit nothing.
        new = keep.localCheckpoint(eager=True)
        new.select("digest", "bucket").write.mode("append").partitionBy(
            "bucket"
        ).parquet(self.state_dir)
        null_rows = batch_df.filter(F.col(self.text).isNull())
        survivors = batch_df.join(
            new.select(self.id_col), on=self.id_col, how="semi"
        )
        return survivors.unionByName(null_rows)

    # --------------------------------------------------------- maintenance

    def compact(self) -> None:
        """Fold the per-batch appended files into one file per bucket and
        drop double-recorded digests (replayed batches) — bounds the
        small-files decay exactly like ``AnnIndex.compact``. Readers of the
        OLD state see a full set throughout; the swap is per-bucket
        overwrite with ``partitionOverwriteMode=dynamic``."""
        s = self._state()
        if s is None:
            return
        folded = s.dropDuplicates(["digest"]).repartition("bucket")
        prev = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        self.spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            folded.write.mode("overwrite").partitionBy("bucket").parquet(
                self.state_dir
            )
        finally:
            self.spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )

    # ---------------------------------------------------------- streaming

    def attach(self, stream_df: DataFrame, sink, **start_kwargs):
        """Drive the dedup from a stream: every micro-batch is filtered and
        the survivors handed to ``sink(survivors_df, batch_id)``. Returns
        the started ``StreamingQuery``."""

        def _each(batch_df: DataFrame, batch_id: int) -> None:
            sink(self.filter_batch(batch_df), batch_id)

        return (
            stream_df.writeStream.foreachBatch(_each)
            .options(**start_kwargs.pop("options", {}))
            .start(**start_kwargs)
        )


def dedup_within_stream(
    stream_df: DataFrame,
    delay: str,
    time_column: str = "ts",
    text: str = "text",
) -> DataFrame:
    """Bounded-lateness streaming dedup on content digest: Spark's own
    watermarked dedup state (``dropDuplicatesWithinWatermark``), which
    evicts digests older than ``delay`` (e.g. ``"1 hour"``) — the unbounded
    ``readStream`` form for when "seen before" only needs a lookback
    window, with state size bounded by the window instead of the corpus."""
    return (
        stream_df.withColumn("__digest", F.md5(F.col(text)))
        .withWatermark(time_column, delay)
        .dropDuplicatesWithinWatermark(["__digest"])
        .drop("__digest")
    )
