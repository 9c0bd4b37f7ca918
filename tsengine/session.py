"""SparkSession construction.

Local mode is a single JVM with N executor threads; on a real cluster the
same config block applies minus ``driver.memory`` sizing. Everything here is
plain public Spark configuration. UTC everywhere so pandas / Spark / DuckDB
agree on timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from tsengine.env_tuning import setdefault_simd


def get_spark(
    app_name: str = "tsengine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``. ``shuffle_partitions`` defaults to the local parallelism
    so small-scale shuffles don't fan out into 200 empty tasks; on a real
    cluster, set it to ~2-3× total executor cores (AQE coalesces the rest).
    """
    # must run before the JVM launches: python workers inherit the env, and
    # numpy's SIMD dispatch is fixed at first import (see env_tuning.py)
    simd_workaround = setdefault_simd()

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "*"
        shuffle_partitions = 32 if n == "*" else max(int(n), 4)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("TSENGINE_PARQUET_CODEC", "zstd"),
        )
        # zstd level 1 for writes: the publish stage is write-throughput
        # bound (55 M-row long-tier publish measured 14.5 s at level 3 vs
        # 11.2 s at level 1 for +1.7% size on numeric tier data); bump via
        # env where storage cost dominates over write latency
        .config(
            "spark.hadoop.parquet.compression.codec.zstd.level",
            os.environ.get("TSENGINE_ZSTD_LEVEL", "1"),
        )
        # parquet dictionary encoding off for writes: the engine's bulk
        # writes are dominated by high-cardinality columns (conv_id keys,
        # per-bucket stats doubles, codec blobs) where the writer builds a
        # dictionary page per column chunk only to overflow it and fall
        # back — measured 2.56 s -> 1.68 s for the 55 M-row long-tier
        # publish with ~5% size change either way (zstd absorbs the
        # low-card columns' dict loss). Readers are unaffected (encoding
        # choice only; row-group stats pushdown unchanged). Re-enable via
        # env for dict-friendly archival tables.
        .config(
            "spark.hadoop.parquet.enable.dictionary",
            os.environ.get("TSENGINE_PARQUET_DICT", "false"),
        )
        # heap is lazily allocated — size for the worst stage, not the
        # average: at ~35M turns the wide-rollup hash agg + chunked windows
        # cross 24g's execution-memory threshold and spill, and 8 concurrent
        # spilling tasks on virtio disk ran 3x slower (measured 489s -> 161s
        # for the same job at 48g)
        .config("spark.driver.memory", os.environ.get("TSENGINE_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # committer v2: task outputs move to the final location at task
        # commit — avoids the driver-side sequential rename storm of v1
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # scan split sizing: Spark targets totalSize/defaultParallelism per
        # split but FLOORS the split size at openCostInBytes (default 4 MB),
        # so a few-MB zstd parquet input collapses to 1-2 scan partitions
        # and every narrow stage (md5 hashing, per-row feature exprs) runs
        # on 1-2 of N cores — measured 9.2 s -> 1.2 s for a 64-bit simhash
        # over a 5.7 MB input at local[32]. 64 KB keeps split sizing
        # following totalSize/parallelism for small inputs; at cluster
        # scale files are >> maxPartitionBytes and openCost is irrelevant
        # to split size (it only pads the packing cost model — raise via
        # env when scanning millions of tiny files on object storage).
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("TSENGINE_OPEN_COST_BYTES", "65536"),
        )
    )
    if simd_workaround:
        b = b.config(
            "spark.executorEnv.NPY_DISABLE_CPU_FEATURES",
            os.environ["NPY_DISABLE_CPU_FEATURES"],
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    """Stop the active session (used by the bench harness to switch
    parallelism levels between runs)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # SparkContext in local mode lives in the same JVM; a fresh
    # getOrCreate() after stop() honors a new master.


def grouped_apply(df, keys: list[str], fn, schema):
    """``groupBy(keys).applyInPandas`` with an EXPLICIT pre-repartition on
    the group keys — the grouped-UDF parallelism fix.

    Why: AQE coalesces post-shuffle partitions by BYTES, but a python
    grouped-UDF stage's cost scales with GROUP COUNT (per-group Arrow
    frame + python dispatch), not bytes. A compressed/blob-sized or
    small-SF input folds into one post-shuffle partition and every group
    then runs serially in a single python task — measured 9.9 s for a
    NO-OP grouped UDF over 39 K chunk-table rows (12 MB) at sf0.1, vs
    2.4 s for the real merge once parallelized. An explicit
    ``repartition(N, keys)`` is exempt from AQE coalescing and its hash
    partitioning satisfies the groupBy's clustering requirement, so
    Catalyst inserts NO second exchange — same shuffle count, restored
    parallelism. N = ``spark.sql.shuffle.partitions``, the same
    cluster-sized knob every other exchange here uses (AQE's skew
    handling cannot split a pandas group anyway — rows of one group must
    co-locate — so nothing real is lost at 100 TB either).
    """
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        df.repartition(n_part, *keys)
        .groupBy(*keys)
        .applyInPandas(fn, schema=schema)
    )


def sorted_batch_apply(df, keys: list[str], order: list[str], batch_fn, schema):
    """High-group-count fast path for per-series operators.

    ``groupBy().applyInPandas`` pays a per-GROUP toll (one Arrow batch,
    one pandas DataFrame construction, one Python call, one result
    concat per group) — measured ~5 ms/group, which dominates wall time
    when series are short and numerous (75 K groups of ~13 rows: the
    whole operator is pandas overhead, not compute). This helper keeps
    the same one-exchange shape but streams each partition through
    mapInPandas as FULL Arrow batches: repartition on the keys (exempt
    from AQE coalescing — see ``grouped_apply``), sortWithinPartitions
    (keys + order) so groups are contiguous and pre-sorted, then numpy
    change-point detection hands ``batch_fn`` whole batches plus group
    boundaries. Per-group cost collapses to an index slice.

    ``batch_fn(pdf, starts, ends) -> pdf_out`` processes EVERY group in
    the batch (group g = rows starts[g]:ends[g], already sorted by
    ``order``) and returns one DataFrame matching ``schema``. Groups
    never span batches: the last (possibly incomplete) group of each
    incoming Arrow batch is carried into the next one, so ``batch_fn``
    always sees complete series — same per-task memory bound as
    applyInPandas (one batch + one series).
    """
    import numpy as np
    import pandas as pd

    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    d = df.repartition(n_part, *keys).sortWithinPartitions(*keys, *order)

    def group_bounds(pdf):
        n = len(pdf)
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for k in keys:
            a = pdf[k].to_numpy()
            change[1:] |= a[1:] != a[:-1]
        starts = np.flatnonzero(change)
        return starts, np.append(starts[1:], n)

    def run(batches):
        tail = None
        for pdf in batches:
            if tail is not None and len(tail):
                pdf = pd.concat([tail, pdf], ignore_index=True)
            if not len(pdf):
                continue
            starts, ends = group_bounds(pdf)
            tail = pdf.iloc[starts[-1]:].reset_index(drop=True)
            if len(starts) == 1:  # whole batch is one (continuing) group
                continue
            # hand batch_fn ONLY the complete groups — the carried tail
            # must never appear in its input frame
            done = pdf.iloc[:starts[-1]].reset_index(drop=True)
            yield batch_fn(done, starts[:-1], ends[:-1])
        if tail is not None and len(tail):
            starts, ends = group_bounds(tail)
            yield batch_fn(tail, starts, ends)

    return d.mapInPandas(run, schema)
