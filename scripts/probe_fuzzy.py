"""r15 probe: is lsh_join(broadcast_right=True) a win for the fuzzy
decontamination row at bench scale?

The r14-start bench showed text_decontaminate_fuzzy 4.0 s; after the
inherited broadcast change the r15-start run read 5.8 s [3.7, 5.8] — but
the box swings +-2x, so this probe interleaves the two join strategies
(B A B A ...) in ONE session over the exact bench-row body and reports
per-strategy medians plus answer equality. Interleaving cancels the box
drift that cross-run comparisons cannot.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_uwheel_spark import get_spark
from datafusion_uwheel_spark.operators import contamination, dedup
from datafusion_uwheel_spark.sources import read_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = get_spark(
    "probe_fuzzy", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
)
docs = read_parquet(spark, f"{SF_DIR}/documents.parquet")
docs_wide = docs.repartition(int(CPUS))


def run(broadcast: bool) -> tuple[float, int]:
    held_fz = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.substring("text", 1, 400).alias("text")
    )
    t0 = time.perf_counter()
    out = contamination.with_contamination_fuzzy(
        docs_wide.select("doc_id", "text"), held_fz, min_est_jaccard=0.5,
    )
    n = out.filter("contaminated").count()
    out._uw_release()
    return time.perf_counter() - t0, n


orig = dedup.lsh_join


def patched(*a, **kw):
    kw["broadcast_right"] = patched.flag
    return orig(*a, **kw)


dedup.lsh_join = patched
# with_contamination_fuzzy imports lsh_join at call time (from .dedup
# import lsh_join as _lsh_join) — function-local import, so the module
# attribute patch takes effect per call.

times: dict[bool, list[float]] = {True: [], False: []}
answers = set()
for rep in range(4):
    for flag in (True, False):
        patched.flag = flag
        spark.sparkContext.setJobDescription(
            f"fuzzy broadcast={flag} rep={rep}"
        )
        dt, n = run(flag)
        times[flag].append(dt)
        answers.add(n)
        print(f"broadcast={flag} rep={rep}: {dt:.2f}s n={n}", flush=True)

assert len(answers) == 1, f"answers diverged: {answers}"
for flag in (True, False):
    ts = sorted(times[flag])
    print(
        f"broadcast={flag}: median {ts[len(ts) // 2]:.2f}s "
        f"spread [{ts[0]:.2f}, {ts[-1]:.2f}]"
    )
