"""Per-key isolation harness for optimization work (bench.py is frozen for
measurement; this file exists so individual headline keys can be timed and
re-timed at any scale factor without paying the full bench protocol).

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--keys pat1,pat2] [--cpus N]

Times each selected headline thunk (same thunks, same count_action as
bench.py) REPS times and prints one JSON line
{"sf_dir": ..., "queries": {name: [sec, ...]}, "queries_min": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tsengine.env_tuning import setdefault_simd  # noqa: E402

setdefault_simd()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--keys", default="")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--warm", default="", help="warm-up sf dir (untimed pass)")
    args = ap.parse_args()

    import bench
    from tsengine.session import get_spark

    spark = get_spark(app_name="bench-extra", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    pats = [p for p in args.keys.split(",") if p]

    def selected(thunks):
        if not pats:
            return thunks
        return {k: v for k, v in thunks.items() if any(p in k for p in pats)}

    if args.warm:
        for name, thunk in selected(bench._headline_thunks(spark, args.warm)).items():
            thunk()

    thunks = selected(bench._headline_thunks(spark, args.sf))
    qs: dict[str, list[float]] = {}
    for _ in range(args.reps):
        for name, thunk in thunks.items():
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            thunk()
            qs.setdefault(name, []).append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "sf_dir": args.sf,
        "queries": qs,
        "queries_min": {k: min(v) for k, v in qs.items()},
        "total_min": round(sum(min(v) for v in qs.values()), 3),
    }))


if __name__ == "__main__":
    main()
