"""r15 probe: SemanticCorpusDedup two-batch run, float32 vs int8 state —
the bench row's exact workflow in isolation. Prints per-run seconds for
each mode (2 reps), matching bench.py's semantic_stream_run."""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from pyspark.sql import functions as F

from datafusion_uwheel_spark import get_spark
from datafusion_uwheel_spark.operators import similarity
from datafusion_uwheel_spark.sources import read_parquet

spark = get_spark(app_name="probe_q8")
emb = read_parquet(spark, os.path.join(SF, "embeddings.parquet"))
dim = len(emb.select("embedding").first()[0])
cents = similarity.train_ivf_centroids(emb, dim, k=16, seed=42)

from datafusion_uwheel_spark.operators.stream_dedup import SemanticCorpusDedup


def run(quantize):
    d = tempfile.mkdtemp(prefix="probe_q8_")
    try:
        t0 = time.perf_counter()
        sd = SemanticCorpusDedup(
            spark, f"{d}/vectors", cents, threshold=0.4, quantize=quantize
        )
        survivors, pending = sd.prepare_batch(emb)
        n1 = survivors.count()
        sd.commit(pending)
        batch = emb.withColumn("vec_id", F.col("vec_id") + 1_000_000)
        survivors, pending = sd.prepare_batch(batch)
        n2 = survivors.count()
        sd.commit(pending)
        dt = time.perf_counter() - t0
        return dt, n1, n2
    finally:
        shutil.rmtree(d, ignore_errors=True)
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()


for mode in (None, "int8", None, "int8"):
    dt, n1, n2 = run(mode)
    print(
        f"mode={mode or 'float32'}: {dt:.2f}s (kept batch1 {n1}, batch2 {n2})",
        flush=True,
    )
spark.stop()
