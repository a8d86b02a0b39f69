"""r15 probe: per-phase wall clock of the text_decontaminate_fuzzy row.

Phases: (1) construction (two hot-census jobs, which force signing both
sides), (2) the first count (join + groupBy + verdict persist + train
join), (3) the second count (persist hit + train join), (4) release.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_uwheel_spark import get_spark
from datafusion_uwheel_spark.operators import contamination
from datafusion_uwheel_spark.sources import read_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = get_spark(
    "probe_fuzzy_phases", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
)
sc = spark.sparkContext
docs = read_parquet(spark, f"{SF_DIR}/documents.parquet")
docs_wide = docs.repartition(int(CPUS))

for rep in range(3):
    held_fz = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.substring("text", 1, 400).alias("text")
    )
    jobs0 = len(sc.statusTracker().getJobIdsForGroup() or [])

    t0 = time.perf_counter()
    out = contamination.with_contamination_fuzzy(
        docs_wide.select("doc_id", "text"), held_fz, min_est_jaccard=0.5,
    )
    t_construct = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_src = out.filter("contaminated AND doc_id % 7 = 0").count()
    t_count1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    n = out.filter("contaminated").count()
    t_count2 = time.perf_counter() - t0

    t0 = time.perf_counter()
    held_n = held_fz.count()
    t_count3 = time.perf_counter() - t0

    out._uw_release()
    print(
        f"rep={rep}: construct {t_construct:.2f}s count1 {t_count1:.2f}s "
        f"count2 {t_count2:.2f}s held_count {t_count3:.2f}s  (n={n})",
        flush=True,
    )
