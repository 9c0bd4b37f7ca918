"""Micro-bench for gapfill_sql at sf0.1 — compare before/after the
single-day fast path. Run: python tools/microbench_gapfill.py [runs]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tsengine.env_tuning import setdefault_simd

setdefault_simd()

from pyspark.sql import functions as F

from tsengine import entry_queries as eq
from tsengine import gapfill
from tsengine.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

spark = get_spark(app_name="gapfill-microbench", master="local[32]")
ev = eq._events_long(spark, SF_DIR)
view = ev.where(F.col("metric") == "view")

# warm-up (JIT/codegen)
gapfill.gapfill_sql(view, freq="1h", method="linear").select(F.count("*")).collect()

times = []
for _ in range(runs):
    t0 = time.time()
    n = gapfill.gapfill_sql(view, freq="1h", method="linear").select(
        F.count("*")
    ).collect()[0][0]
    times.append(time.time() - t0)
print({"rows": n, "times": [round(t, 3) for t in times], "min": round(min(times), 3)})
