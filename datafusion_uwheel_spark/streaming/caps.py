"""Ingestion-time per-key frequency caps — the streaming spelling of
:func:`..operators.packing.cap_per_key`, as a CUSTOM STATEFUL operator
(``applyInPandasWithState``).

A crawl pipeline that caps documents per domain only at curation time
still pays to ingest, store, and near-dedup a hot domain's full flood.
This operator enforces the cap AS EVENTS ARRIVE: per-key state is a
single counter (bounded by distinct keys — domains, sources — not rows),
and rows beyond the cap are dropped inside the stateful exchange, so
nothing downstream ever sees them. None of Spark's built-ins express
this: ``dropDuplicates*`` dedups exact values, windowed aggregation
emits aggregates not rows, and ``session_window`` groups by gaps — a
keep-first-N-rows-per-key-forever rule needs custom state, which is
exactly what ``applyInPandasWithState`` exists for (Arrow-batched: the
per-key callback sees pandas frames, never Python rows).

Semantics: keys are compared by the grouping column; within a
micro-batch rows are admitted in ``order_by`` ascending order (default:
the frame's arrival order) until the key's lifetime count reaches
``max_rows``. Replayed batches re-admit through the SAME counters, so
at-least-once replay can re-emit previously admitted rows (duplicates to
an idempotent sink) but never exceeds the cap by more than the replayed
batch's own contribution — pair with :class:`..operators.stream_dedup.
CorpusDedup` downstream for exact-once content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["stream_cap_per_key"]


def stream_cap_per_key(
    stream_df: DataFrame,
    key: str,
    max_rows: int,
    order_by: str | None = None,
) -> DataFrame:
    """At most ``max_rows`` rows per ``key`` value over the stream's whole
    lifetime, enforced per micro-batch from a per-key counter in Spark's
    state store. Returns the admitted rows with the input schema.

    ``order_by`` names a column that decides WHICH of a batch's rows are
    admitted first (ascending; e.g. a quality rank) — across batches,
    arrival order governs, as any ingest-time cap must accept.

    State is one ``bigint`` per distinct key — a crawl with a million
    domains carries ~8 MB of state regardless of row volume."""
    if max_rows <= 0:
        raise ValueError(f"max_rows must be positive, got {max_rows}")
    if key not in stream_df.columns:
        raise ValueError(f"key column {key!r} not in stream")
    if order_by is not None and order_by not in stream_df.columns:
        raise ValueError(f"order_by column {order_by!r} not in stream")
    schema = stream_df.schema
    cols = list(stream_df.columns)

    def admit(key_tuple, pdfs, state):
        n = state.get[0] if state.exists else 0
        if order_by is None:
            # arrival order: stream the Arrow chunks, never buffer the group
            for pdf in pdfs:
                if n >= max_rows:
                    continue  # drain the iterator; nothing more admits
                take = min(max_rows - n, len(pdf))
                n += take
                if take:
                    yield pdf.iloc[:take][cols]
        else:
            # order_by ranks across the WHOLE micro-batch group — a group
            # larger than one Arrow chunk must not let chunking decide who
            # admits. Incremental stable top-k instead of buffering the
            # group: fold each chunk into a survivor frame capped at the
            # remaining budget, so memory is ≤ budget + one Arrow chunk
            # even when a hot key floods the batch. Left-to-right folding
            # preserves the full-sort semantics exactly: survivors stay in
            # stable (value, arrival) order, appended chunks arrive later
            # than every survivor, so mergesort breaks boundary ties the
            # same way one sort of the whole group would.
            import pandas as pd

            budget = max_rows - n
            kept = None
            for pdf in pdfs:
                if budget <= 0:
                    continue  # drain the iterator; nothing admits
                both = pdf if kept is None else pd.concat([kept, pdf])
                kept = both.sort_values(order_by, kind="mergesort").iloc[:budget]
            if kept is not None and len(kept):
                n += len(kept)
                yield kept[cols]
        state.update((n,))

    return (
        stream_df.groupBy(key)
        .applyInPandasWithState(
            admit,
            outputStructType=schema,
            stateStructType="n bigint",
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
