"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "derived": {turns/sec, rolled points/sec, scaling efficiency N→4N}}

Two parts:
1. headline operator queries over $SPARK_GRAFT_SF_DIR (default
   /root/testdata/sf0.1) at local[$SPARK_GRAFT_CPUS];
2. the flagship transcript rollup pipeline (synth → features → 1m→1h→1d
   cascade) run at local[N/4] and local[N] on the SAME input — the
   in-sandbox evidence for the BASELINE scaling-efficiency criterion
   (a real two-cluster run is impossible here; see BASELINE.md).

Set SPARK_GRAFT_BENCH_CONVS / _MEGA to scale the synthetic load.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from tsengine import chunks, features, gapfill, indicators, rollup, synth, textops, vecops  # noqa: E402
from tsengine import entry_queries as eq  # noqa: E402
from tsengine.session import get_spark, stop_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "2000"))
MEGA = int(os.environ.get("SPARK_GRAFT_BENCH_MEGA", "120000"))


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def count_action(df):
    """Force full execution without driver-side row transfer."""
    return df.select(F.count("*")).collect()[0][0]


def transcript_pipeline(spark, out_root: str) -> tuple[int, int]:
    """synth → signal pack → 1m→1h→1d cascade; returns (turns, rolled points).

    Each tier is written to parquet (as the real pipeline does) so the
    cascade rescans the materialized tier, never raw data — raw is scanned
    exactly once."""
    import shutil

    shutil.rmtree(out_root, ignore_errors=True)
    t = synth.generate_transcripts(spark, n_convs=N_CONVS, mega_turns=MEGA)
    long = features.to_long(features.derive_features(t))
    t1m = rollup.rollup_from_raw(long, "1m")
    t1m.write.mode("overwrite").parquet(f"{out_root}/tier_1m")
    t1m_r = spark.read.parquet(f"{out_root}/tier_1m")
    rollup.cascade(t1m_r, "1h").write.mode("overwrite").parquet(f"{out_root}/tier_1h")
    t1h_r = spark.read.parquet(f"{out_root}/tier_1h")
    rollup.cascade(t1h_r, "1d").write.mode("overwrite").parquet(f"{out_root}/tier_1d")

    # turns = Σcnt of any always-present metric in the 1m tier — no rescan
    # of raw data needed to count ingested turns.
    n_turns = int(
        spark.read.parquet(f"{out_root}/tier_1m")
        .where(F.col("metric") == "n_chars")
        .agg(F.sum("cnt"))
        .collect()[0][0]
    )
    pts = sum(
        count_action(spark.read.parquet(f"{out_root}/tier_{k}"))
        for k in rollup.TIER_ORDER
    )
    return n_turns, pts


def headline_queries(spark) -> dict[str, float]:
    qs = {}

    def run(name, thunk):
        sec, _ = timed(thunk)
        qs[name] = round(sec, 3)

    ev = eq._events_long(spark, SF_DIR)
    run("tier_cascade_events", lambda: [
        count_action(rollup.cascade(rollup.cascade(
            rollup.rollup_from_raw(ev, "1m"), "1h"), "1d"))
    ])
    run("indicators", lambda: count_action(indicators.indicator_battery(ev)))
    view = ev.where(F.col("metric") == "view")
    run("gapfill_linear", lambda: count_action(
        gapfill.gapfill_sql(view, freq="1h", method="linear")))
    run("chunk_encode_decode", lambda: count_action(
        chunks.decode_chunks(chunks.encode_chunks(
            gapfill.gapfill_sql(view, freq="1h", method="ffill"),
            ts_col="bucket_ts", chunk_span="1d"))))

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    run("minhash_lsh", lambda: count_action(
        textops.lsh_candidate_pairs(
            textops.minhash_signature(docs, k=4, shingle_n=3), k=4, band_size=2)))
    run("dedup_exact", lambda: count_action(textops.exact_dedup_groups(docs)))

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    run("knn_cosine", lambda: count_action(vecops.cosine_topk(emb, qv, k=10)))
    return qs


def main() -> None:
    queries: dict[str, float] = {}
    derived: dict[str, float] = {}

    # -- part 1: headline operator queries at local[CPUS] ------------------
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    queries.update(headline_queries(spark))

    # -- part 2: flagship pipeline at N/4 then N cores (scaling evidence) --
    small = max(CPUS // 4, 1)
    stop_spark()
    spark = get_spark(app_name=f"bench-n{small}", master=f"local[{small}]",
                      shuffle_partitions=small * 2)
    sec_small, (n_turns, n_pts) = timed(
        lambda: transcript_pipeline(spark, "/tmp/tsengine_bench_small")
    )
    queries[f"pipeline_local{small}"] = round(sec_small, 3)

    stop_spark()
    spark = get_spark(app_name=f"bench-n{CPUS}", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS * 2)
    sec_big, (n_turns2, n_pts2) = timed(
        lambda: transcript_pipeline(spark, "/tmp/tsengine_bench_big")
    )
    queries[f"pipeline_local{CPUS}"] = round(sec_big, 3)

    factor = CPUS / small
    derived["turns"] = n_turns
    derived["rolled_points"] = n_pts
    derived[f"turns_per_sec_local{small}"] = round(n_turns / sec_small, 1)
    derived[f"turns_per_sec_local{CPUS}"] = round(n_turns / sec_big, 1)
    derived[f"rolled_points_per_sec_local{CPUS}"] = round(n_pts / sec_big, 1)
    derived["scaling_efficiency"] = round((sec_small / sec_big) / factor, 3)

    total = round(sum(queries.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "total wall sec (headline ops @ sf + transcript rollup pipeline at N/4 and N cores)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "derived": derived,
    }))


if __name__ == "__main__":
    main()
