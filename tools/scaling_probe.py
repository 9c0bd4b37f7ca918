"""Hardware-scaling probe: separates ENGINE scaling from BOX limits.

Runs two microbenchmarks at one parallelism level (fresh JVM per
invocation — see bench.py for why):

- cpu:  md5 hashing over generated rows — compute-bound, tiny working set.
  Near-ideal thread scaling expected on any box; if THIS doesn't scale,
  the host is preempting, not the engine failing.
- mem:  hash-aggregation over a wide shuffle — DRAM-bandwidth-bound, the
  same access pattern as the tier rollup. On a single-socket VM, 8
  threads share one memory controller; the per-thread throughput drop
  here is a property of the box that ALSO caps the pipeline's local[N]
  scaling ratio. On a real multi-executor cluster each executor brings
  its own memory channels, so this ceiling does not transfer.

Usage: python tools/scaling_probe.py <cores>   → one JSON line
       python tools/scaling_probe.py           → runs 2 and 8, prints table
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsengine.env_tuning import setdefault_simd  # noqa: E402

setdefault_simd()

N_CPU = 60_000_000
N_MEM = 100_000_000


def probe(cores: int) -> dict:
    from pyspark.sql import functions as F

    from tsengine.session import get_spark

    spark = get_spark(app_name=f"probe{cores}", master=f"local[{cores}]",
                      shuffle_partitions=max(4 * cores, 16))

    def cpu_job():
        return (
            spark.range(N_CPU)
            .select(F.md5(F.concat(F.lit("probe:"), F.col("id").cast("string"))).alias("h"))
            .select(F.count(F.when(F.substring("h", 1, 1) == "a", 1)))
            .collect()
        )

    def mem_job():
        return (
            spark.range(N_MEM)
            .select((F.col("id") % 10_000_000).alias("k"),
                    (F.col("id") * 7 % 1000).cast("double").alias("v"))
            .groupBy("k")
            .agg(F.sum("v"), F.min("v"), F.max("v"), F.count("*"))
            .select(F.count("*"))
            .collect()
        )

    out = {"cores": cores}
    for name, job in (("cpu", cpu_job), ("mem", mem_job)):
        job()  # warm codegen
        best = None
        for _ in range(2):
            t0 = time.time()
            job()
            sec = time.time() - t0
            best = sec if best is None or sec < best else best
        out[name] = round(best, 3)
    return out


def main() -> None:
    if len(sys.argv) > 1:
        print(json.dumps(probe(int(sys.argv[1]))))
        return
    res = {}
    for cores in (2, 8, 2, 8):  # alternated pairs, like bench.py
        r = json.loads(subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(cores)],
            capture_output=True, text=True, check=True,
        ).stdout.strip().splitlines()[-1])
        res.setdefault(cores, []).append(r)
    effs = {}
    for kind in ("cpu", "mem"):
        pair_effs = [
            (res[2][i][kind] / res[8][i][kind]) / 4 for i in range(len(res[2]))
        ]
        effs[kind] = max(pair_effs)
    print(json.dumps({
        "local2": {k: [r[k] for r in res[2]] for k in ("cpu", "mem")},
        "local8": {k: [r[k] for r in res[8]] for k in ("cpu", "mem")},
        "efficiency_2to8": effs,
    }))


if __name__ == "__main__":
    main()
