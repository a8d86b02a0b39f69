"""Model-based document scoring: the classifier-filtering stage of a
training-data pipeline (educational-quality / toxicity / language-model
filters), as an Arrow-batched injection point.

Where :mod:`.text` computes HEURISTIC quality entirely in JVM expressions
(the fast path — use it whenever the score is expressible as column math),
this operator exists for OPAQUE models: a classifier that needs Python, a
tokenizer, or a GPU. The design splits cleanly:

* **The model is injected, never imported** — ``scorer`` is a picklable
  ``(texts: list[str]) -> list[float]`` callable shipped to the executors
  (the :mod:`.multimodal` decoder-injection discipline: no ML libraries in
  this container, so the operator's contract is the PLUMBING — schema,
  batching, null handling, single-pass shape — exercised by deterministic
  fake scorers, with the real model a drop-in).
* **Lazy model loading, stated precisely**: a callable OBJECT whose
  ``__call__`` loads weights on first use and caches them on ``self``
  amortizes the load across every micro-batch of ONE TASK — but a
  by-value-pickled object is re-deserialized fresh PER TASK, so a
  multi-GB model still loads once per task, not per worker. For true
  per-worker caching use :class:`CachedScorer`: its class pickles by
  REFERENCE to this module, so every task in a reused Python worker
  shares one ``_WORKER_MODEL_CACHE`` entry and the weights load once per
  worker PROCESS (tested across the executor boundary in
  tests/test_model_scoring.py). The difference is invisible at test
  scale and very visible at 1000 tasks × multi-GB weights.
* **Model batch size is independent of Arrow batch size**: Spark hands
  ``mapInPandas`` whatever ``spark.sql.execution.arrow.maxRecordsPerBatch``
  yields (default 10k); models want their own micro-batch (GPU memory).
  ``batch_size`` re-slices inside the iterator — constant memory per task,
  no repartition, no shuffle.

Scale: ``mapInPandas`` is a NARROW transformation — scoring 100 TB is one
scan with zero shuffles, parallel across every input partition; the
follow-up ``filter``/write pipelines into the same stage. NULL texts skip
the model entirely (score NULL, preserving SQL semantics), and a scorer
returning NaN is normalized to NULL too — under Spark's NaN ordering
(greater than every double) a NaN score would otherwise pass EVERY
``score >= threshold`` filter, keeping exactly the documents the model
choked on. A scorer returning the wrong batch length fails loudly with
the batch context — never a silent row misalignment (scores shifted one
row off their documents would silently poison a corpus filter).
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .colresolve import resolve_field

__all__ = ["score_texts", "filter_by_score", "CachedScorer"]

#: Per-worker-process model cache, keyed on :class:`CachedScorer` tokens.
#: Lives at module level so it belongs to the WORKER's imported module
#: object — Spark reuses Python worker processes across tasks
#: (``spark.python.worker.reuse``, default true), so an entry written by
#: task 1 is a hit for task 40 in the same process. Values are wrapped in
#: a 1-tuple so a loader legitimately returning None still caches.
#: BOUNDED (insertion-order eviction): the documented pattern bumps the
#: token on every weights change ('clf-v3' → 'clf-v4'), and an unbounded
#: dict would pin every superseded multi-GB model in the long-lived worker
#: until it OOMs (review r10p5). Raise the bound for a pipeline that
#: genuinely interleaves more resident models.
_WORKER_MODEL_CACHE: dict = {}
_WORKER_MODEL_CACHE_MAX = 2


class CachedScorer:
    """A picklable scorer whose model loads at most ONCE per Python worker
    process, however many tasks and micro-batches that worker runs.

    ``CachedScorer(token, loader)`` ships ``loader`` (cloudpickled by
    value, so closures are fine) to every task, but ``__call__`` consults
    the module-level ``_WORKER_MODEL_CACHE`` first — and this CLASS pickles
    by reference to an importable module, so every unpickled copy in one
    worker process sees the same dict. That is the difference from caching
    on ``self`` (one load per TASK — each task deserializes a fresh
    instance): here the multi-GB weights load once per WORKER.

    ``token`` must be a stable, hashable identity for the weights (e.g.
    ``"quality-clf-v3"``): two CachedScorers with the same token SHARE a
    model; bump the token when the weights change. No lock — Spark Python
    workers run tasks single-threaded, and the worst concurrent-driver
    case is a duplicate load, never a torn value (setdefault publishes
    exactly one)."""

    def __init__(self, token, loader: Callable[[], Callable[[list], list]]):
        if not isinstance(token, str) or not token:
            raise ValueError(
                f"token must be a non-empty string identifying the weights, "
                f"got {token!r}"
            )
        self.token = token
        self.loader = loader

    def __call__(self, texts: list) -> list:
        hit = _WORKER_MODEL_CACHE.get(self.token)
        if hit is None:
            hit = _WORKER_MODEL_CACHE.setdefault(self.token, (self.loader(),))
            while len(_WORKER_MODEL_CACHE) > _WORKER_MODEL_CACHE_MAX:
                # oldest-inserted first: superseded token generations
                # release their weights instead of pinning the worker
                oldest = next(iter(_WORKER_MODEL_CACHE))
                if oldest == self.token:
                    break  # never evict the entry this call just made
                _WORKER_MODEL_CACHE.pop(oldest, None)
        return hit[0](texts)


def score_texts(
    df: DataFrame,
    scorer: Callable[[list], list],
    text_column: str = "text",
    output_column: str = "score",
    batch_size: int = 512,
) -> DataFrame:
    """Append ``output_column`` (double) = ``scorer(texts)`` over
    ``text_column``, Arrow-batched via ``mapInPandas`` — one narrow pass,
    model micro-batches of at most ``batch_size`` non-null texts, NULL
    texts scored NULL without reaching the model.

    ``scorer`` must be picklable and return exactly one float (or None)
    per input text — length mismatches raise with context instead of
    misaligning rows. See the module docstring for the lazy per-worker
    model-loading pattern.
    """
    if scorer is None:
        raise NotImplementedError(
            "score_texts needs an injected model: pass scorer="
            "(texts: list[str]) -> list[float] — a picklable callable "
            "(e.g. a lazy-loading classifier object). For heuristic "
            "quality scores use operators.text (JVM expressions, no "
            "Python on the row path)."
        )
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    # Shared resolution semantics (colresolve): exact name first;
    # duplicate exact names raise (legal in Spark after joins, but
    # pdf[text_column] inside the worker would then return a DataFrame,
    # failing opaquely on the executor); ambiguous case-variants raise.
    field = resolve_field(df, text_column)
    text_column = field.name
    if any(c.lower() == output_column.lower() for c in df.columns):
        # strict on either case-sensitivity setting: an error beats a
        # silently shadowed column
        raise ValueError(
            f"output column {output_column!r} already exists — pick "
            "another name"
        )
    if not isinstance(field.dataType, T.StringType):
        # type-check the RESOLVED field, not df.schema[name] (which on a
        # duplicated name silently checks only the first occurrence)
        dtype = field.dataType.simpleString()
        raise ValueError(
            f"{text_column!r} is {dtype}, not string — cast it explicitly"
            " (a NULL in a non-string column surfaces as NaN in pandas"
            " and would be scored as the literal text 'nan')"
        )
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(output_column, T.DoubleType(), True)]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            # one materialization per Arrow batch — no per-row .iloc
            texts = pdf[text_column].tolist()
            scores = [None] * len(texts)
            # model micro-batches over the NON-NULL texts only — pd.isna
            # catches every null spelling (None, NaN, pd.NA) in one check;
            # the column is StringType, so real values are never "missing"
            idx = [i for i, t in enumerate(texts) if not pd.isna(t)]
            for lo in range(0, len(idx), batch_size):
                chunk = idx[lo : lo + batch_size]
                got = scorer([texts[i] for i in chunk])
                if len(got) != len(chunk):
                    raise ValueError(
                        f"scorer returned {len(got)} scores for a batch of "
                        f"{len(chunk)} texts — refusing to misalign rows"
                    )
                for i, sc in zip(chunk, got):
                    if sc is None:
                        continue  # abstention -> NULL (pre-filled)
                    # convert FIRST, then NaN-check (np.float32('nan') is
                    # not a Python float instance, so an isinstance-gated
                    # check would miss the commonest real model dtype).
                    # Spark's pandas->Arrow serializer happens to mask
                    # NaN to NULL on this path too — this makes the
                    # NaN-never-passes-the-filter contract EXPLICIT
                    # rather than an accident of the serializer (Spark
                    # sorts NaN above every double, so a surviving NaN
                    # would pass EVERY >= threshold)
                    v = float(sc)
                    if v == v:
                        scores[i] = v
            yield pdf.assign(**{output_column: scores})

    return df.mapInPandas(run, schema=out_schema)


def filter_by_score(
    df: DataFrame,
    scorer: Callable[[list], list],
    threshold: float,
    text_column: str = "text",
    output_column: str = "score",
    keep_score: bool = True,
    batch_size: int = 512,
) -> DataFrame:
    """The classifier-filter pipeline stage: score every document and keep
    rows with ``score >= threshold`` (NULL scores — NULL texts or a model
    abstaining with None — are DROPPED, the conservative corpus-filter
    default). ``keep_score=False`` drops the score column after filtering
    so downstream schemas stay unchanged. Still one narrow pass — the
    filter fuses into the scoring scan, no shuffle."""
    scored = score_texts(
        df, scorer, text_column=text_column,
        output_column=output_column, batch_size=batch_size,
    )
    kept = scored.filter(F.col(output_column) >= F.lit(float(threshold)))
    return kept.drop(output_column) if not keep_score else kept
