"""Multimodal → similarity end-to-end: binary media in, ANN search out.

The training-data-pipeline composition the operators were built for:

  1. media arrives as an opaque ``binary`` column (+ typed metadata),
  2. exact dedup by content digest (pure JVM expressions),
  3. feature extraction via Arrow-batched ``mapInPandas`` (the codec layer
     is the deterministic fake in this container — the Spark-side plumbing
     is the real thing),
  4. the feature vectors feed a :class:`SimilarityEngine`: a partitioned
     ANN index is built once, then top-k probes and near-dup pairs are
     partition-pruned reads (route-or-delegate, ``last_route`` shows it).

Run:  python examples/media_pipeline.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from datafusion_uwheel_spark import SimilarityEngine, get_spark  # noqa: E402
from datafusion_uwheel_spark.operators import multimodal  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DIM = 32


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:<38} {1e3 * (time.perf_counter() - t0):8.1f} ms")
    return out


def main() -> None:
    spark = get_spark("media-pipeline", master="local[8]", shuffle_partitions=8)

    # 1. binary media column (documents' UTF-8 bytes stand in for payloads)
    media = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.encode("text", "UTF-8").alias("data"))
    )

    # 2. exact media dedup on the content digest
    stats = multimodal.with_media_stats(media)
    n_total = media.count()
    n_unique = timed("digest dedup (distinct payloads)", lambda: stats.select("digest").distinct().count())
    print(f"  {n_total} payloads, {n_unique} unique")

    # 3. binary → feature vectors (Arrow-batched mapInPandas), materialized
    # once — the real pipeline shape at scale: the feature table is written,
    # then indexed (otherwise the extraction re-runs in every downstream job)
    feat_dir = tempfile.mkdtemp(prefix="media_feats_")
    timed(
        "feature extraction (mapInPandas)",
        lambda: multimodal.extract_features(media, dim=DIM, id_col="doc_id")
        .write.mode("overwrite")
        .parquet(feat_dir),
    )
    feats = spark.read.parquet(feat_dir)

    # 4. features → ANN: build once, probe partition-pruned
    eng = SimilarityEngine(
        spark, "media_features", feats, dim=DIM,
        vec_col="feature", id_col="doc_id",
        index_root=tempfile.mkdtemp(prefix="media_ann_"),
    )
    timed("ANN index build (lsh, partitioned)", lambda: eng.build_index(kind="lsh", bits=6, tables=2))

    qvec = [float(x) for x in feats.select("feature").head()[0]]
    top = timed("top-k probe (routed)", lambda: eng.topk(qvec, k=5, kind="lsh", bits=6, tables=2).collect())
    assert eng.last_route.kind == "indexed", eng.last_route
    print("  nearest:", [(r["doc_id"], r["sim"]) for r in top[:3]])

    pairs = timed("near-dup pairs (routed)", lambda: eng.dup_pairs(0.95, bits=6, tables=2).count())
    assert eng.last_route.kind == "indexed", eng.last_route
    print(f"  {pairs} near-dup feature pairs at sim >= 0.95")

    # fallback proof: unindexed parameters delegate to query-time hashing
    eng.topk(qvec, k=5, kind="lsh", bits=4, tables=1).collect()
    assert eng.last_route.kind == "query_time", eng.last_route
    print("route-or-delegate: unindexed params fell back to query-time hashing")

    real_codec_demo(spark)


# ------------------------------------------------- real codec via decoder=
def _make_png(pixels: list[list[int]]) -> bytes:
    """A spec-conformant grayscale 8-bit PNG built with stdlib only."""
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in pixels)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def real_codec_demo(spark) -> None:
    """The ``decoder=`` injection point against a REAL codec, optional-dep
    style: Pillow when importable (any PNG an executor can open), else a
    stdlib zlib/struct PNG parser (grayscale filter-0 — enough to prove the
    plumbing without adding a dependency). Same Arrow-batched
    ``extract_features`` path either way; where both codecs can run they
    produce identical pixel vectors, so swapping Pillow in changes NOTHING
    but codec coverage. On a cluster, executors need the chosen lib
    installed — the closure ships by value, the import happens per-task."""
    try:
        import PIL  # noqa: F401

        mode = "pillow"
    except ImportError:
        mode = "stdlib"

    def stdlib_png(payload: bytes, kind) -> list[float]:
        import struct
        import zlib

        assert payload[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG payload"
        pos, idat, w = 8, b"", None
        while pos < len(payload):
            (ln,) = struct.unpack(">I", payload[pos : pos + 4])
            typ = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + ln]
            if typ == b"IHDR":
                w, _h, _depth, color = struct.unpack(">IIBB", data[:10])
                assert color == 0, "grayscale only"
            elif typ == b"IDAT":
                idat += data
            pos += 12 + ln
        raw = zlib.decompress(idat)
        stride = w + 1
        px: list[float] = []
        for r in range(len(raw) // stride):
            row = raw[r * stride : (r + 1) * stride]
            assert row[0] == 0, "only filter type 0 supported"
            px.extend(b / 255.0 for b in row[1:])
        return px

    def pillow_png(payload: bytes, kind) -> list[float]:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("L")
        return [b / 255.0 for b in img.tobytes()]

    decoder = pillow_png if mode == "pillow" else stdlib_png

    # 8×4 grayscale frames, doc_id-deterministic → DIM=32 pixel vectors
    payloads = [
        (i, _make_png([[(i * 7 + r * 16 + c * 3) % 256 for c in range(8)] for r in range(4)]))
        for i in range(64)
    ]
    media = spark.createDataFrame(payloads, "doc_id long, data binary")
    feats = timed(
        f"real PNG decode via decoder= ({mode})",
        lambda: multimodal.extract_features(
            media, id_col="doc_id", decoder=decoder
        ).collect(),
    )
    assert len(feats) == 64 and all(len(r["feature"]) == 32 for r in feats)
    # both codecs must agree where both run (driver-side spot check)
    by_id = {r["doc_id"]: r["feature"] for r in feats}
    want = stdlib_png(payloads[0][1], None)
    got = list(map(float, by_id[0]))
    assert all(abs(a - b) < 1e-6 for a, b in zip(got, want))
    print(f"  64 PNGs decoded on executors with the {mode} codec; "
          "pixels match the stdlib reference")


if __name__ == "__main__":
    main()
