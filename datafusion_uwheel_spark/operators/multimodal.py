"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

North-star extension (BASELINE.json): media travels as an opaque ``binary``
column plus a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages. The container this
engine builds in has no image/audio libraries, so the *codec* layer is
stubbed (clearly marked, raises :class:`NotImplementedError` unless the
deterministic fake is requested) while everything Spark-side — schema,
partitioning, UDF signatures, batch shapes — is real and tested.

Scale design (100 TB of media):

* Media rows are **fat** (MBs of binary): ``spark.sql.files.maxPartitionBytes``
  governs scan parallelism, and :func:`repartition_for_media` rebalances by
  byte size, not row count, so one task never holds a skewed GB of video.
* ``mapInPandas`` streams *iterators* of record batches — a task never
  materializes its whole partition; peak memory is one Arrow batch
  (``spark.sql.execution.arrow.maxRecordsPerBatch``, lower it for media).
* Features (fixed-size ``array<float>``) feed straight into
  :mod:`.similarity` for embedding dedup/ANN — binary in, vectors out, all
  engine-side.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_SCHEMA",
    "MEDIA_SCHEMA",
    "with_media_stats",
    "repartition_for_media",
    "decode_media",
    "extract_features",
    "sample_frames",
]

#: Typed metadata carried alongside the opaque payload. Unused fields are
#: NULL per kind (images: no sample_rate; audio: no width/height).
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)


# ------------------------------------------------------------ JVM-side ops
def with_media_stats(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Size + content digest, pure built-in expressions (no Python):
    the dedup key for exact media dedup (`md5` works on binary)."""
    return df.withColumns(
        {
            "size_bytes": F.octet_length(F.col(data_col)).cast("long"),
            "digest": F.md5(F.col(data_col)),
        }
    )


def repartition_for_media(
    df: DataFrame, target_partition_bytes: int = 128 << 20, data_col: str = "data"
) -> DataFrame:
    """Rebalance by *payload bytes*, not rows. A row-count repartition leaves
    tasks skewed when media sizes vary by 1000×; range-partitioning on a
    running byte estimate keeps every task near ``target_partition_bytes``."""
    sized = df.withColumn("__bytes", F.octet_length(F.col(data_col)).cast("long"))
    total = sized.agg(F.sum("__bytes")).collect()[0][0] or 0
    parts = max(1, int(total // target_partition_bytes) + 1)
    # Hash-distribute; byte-aware salting would need a two-pass prefix sum —
    # at 100 TB prefer writing the table bucketed by digest instead.
    return sized.repartition(parts, F.crc32(F.col(data_col).cast("string"))).drop("__bytes")


# ----------------------------------------------------------- codec layer
def _fake_decode(payload: bytes, n: int) -> list[float]:
    """Deterministic stand-in decoder: derives ``n`` floats in [0, 1) from a
    SHA-256 stream of the payload. NOT a real codec — it exists so the
    Spark-side plumbing (schemas, batching, determinism) is testable in a
    container without PIL/ffmpeg/librosa."""
    out: list[float] = []
    counter = 0
    while len(out) < n:
        h = hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return out[:n]


def _real_decode(payload: bytes, kind: str):
    """Real decoders are STUBBED in this environment (no PIL/ffmpeg/librosa
    in the container). The import-gate keeps the API honest: if the libs are
    installed this starts working for images without code changes."""
    if kind == "image":
        try:
            import io

            from PIL import Image  # noqa: F401

            return Image.open(io.BytesIO(payload))
        except ImportError as err:
            raise NotImplementedError(
                "image decode requires Pillow, not present in this container"
            ) from err
    raise NotImplementedError(f"real decode for kind={kind!r} is stubbed")


def decode_media(
    df: DataFrame,
    n_values: int = 64,
    fake: bool = True,
    data_col: str = "data",
    decoder=None,
) -> DataFrame:
    """Decode the binary payload to a numeric ``decoded array<float>`` column
    via ``mapInPandas`` (iterator-of-batches: constant memory per task).

    ``decoder`` is the injection point for a REAL codec: a picklable
    ``(payload: bytes, kind: str | None) -> list[float]`` callable (wrap
    Pillow/ffmpeg/librosa here) — it ships to the executors and runs inside
    the same Arrow-batched plumbing, no operator edits needed. Without it,
    ``fake=True`` (the only mode that runs in this container) uses the
    deterministic SHA-stream stand-in and ``fake=False`` calls the
    import-gated :func:`_real_decode` stub.
    """
    fields = df.schema.fields
    out_schema = T.StructType(
        list(fields) + [T.StructField("decoded", T.ArrayType(T.FloatType()), True)]
    )
    has_kind = "kind" in df.columns

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            if decoder is not None:
                kinds = pdf["kind"] if has_kind else [None] * len(pdf)
                pdf = pdf.assign(
                    decoded=[
                        decoder(bytes(p), k) if p is not None else None
                        for p, k in zip(pdf[data_col], kinds)
                    ]
                )
            elif fake:
                pdf = pdf.assign(
                    decoded=[
                        _fake_decode(bytes(p), n_values) if p is not None else None
                        for p in pdf[data_col]
                    ]
                )
            else:
                pdf = pdf.assign(
                    decoded=[
                        _real_decode(bytes(p), k)
                        for p, k in zip(pdf[data_col], pdf["kind"])
                    ]
                )
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_features(
    df: DataFrame,
    dim: int = 64,
    fake: bool = True,
    data_col: str = "data",
    id_col: str = "media_id",
    decoder=None,
) -> DataFrame:
    """Binary → fixed-``dim`` feature vector ``(id_col, feature)``, ready for
    :func:`..operators.similarity.cosine_topk` / LSH bucketing.

    Column-pruned input (only id + payload — and ``kind`` when a real
    ``decoder`` is injected — cross into Python), Arrow-batched.
    ``decoder``: picklable ``(payload, kind) -> list[float]`` feature model
    (a real embed/decode pipeline); default is the deterministic fake."""
    has_kind = decoder is not None and "kind" in df.columns
    pruned = df.select(
        *([id_col, data_col] + (["kind"] if has_kind else []))
    )
    out_schema = T.StructType(
        [
            pruned.schema[id_col],
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            if decoder is not None:
                kinds = pdf["kind"] if has_kind else [None] * len(pdf)
                feats = [
                    decoder(bytes(p), k) if p is not None else None
                    for p, k in zip(pdf[data_col], kinds)
                ]
            else:
                feats = [
                    _fake_decode(bytes(p), dim) if (fake and p is not None) else None
                    for p in pdf[data_col]
                ]
            yield pdf.assign(feature=feats)[[id_col, "feature"]]

    return pruned.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    fake: bool = True,
    id_col: str = "media_id",
    decoder=None,
) -> DataFrame:
    """Video → one row per sampled frame ``(media_id, frame_idx, ts_ms,
    frame)`` — the row-exploding shape of a real frame sampler, driven by the
    ``duration_ms`` metadata. ``decoder``: picklable
    ``(payload, ts_ms) -> list[float]`` frame extractor (wrap ffmpeg/pyav
    here); default is the stubbed deterministic fake."""
    pruned = df.select(id_col, "kind", "data", F.col("meta.duration_ms").alias("__dur"))
    out_schema = T.StructType(
        [
            pruned.schema[id_col],
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("ts_ms", T.LongType(), False),
            T.StructField("frame", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, kind, payload, dur in zip(
                pdf[id_col], pdf["kind"], pdf["data"], pdf["__dur"]
            ):
                if kind != "video" or payload is None or dur is None:
                    continue
                n_frames = max(1, int(dur) // every_ms)
                for i in range(n_frames):
                    ts = i * every_ms
                    if decoder is not None:
                        frame = decoder(bytes(payload), ts)
                    elif fake:
                        frame = _fake_decode(
                            bytes(payload) + ts.to_bytes(8, "big"), 16
                        )
                    else:
                        frame = _real_decode(bytes(payload), "video")
                    rows.append((mid, i, ts, frame))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "ts_ms", "frame"])

    return pruned.mapInPandas(run, schema=out_schema)
