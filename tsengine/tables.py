"""Table storage abstraction: Iceberg when the runtime is on the classpath,
layout-compatible partitioned parquet otherwise.

The north-rule target is Iceberg (`bucket(B, conv_id)` + `days(ts)`
partitioning, snapshot-based incremental reads). This sandbox has no
Iceberg Spark runtime jar, so the fallback emulates the partition layout
with explicit columns — the physical file layout (and therefore pruning
behavior) matches what Iceberg's partition transforms would produce, and
every call site goes through this module so swapping in Iceberg is a
config change, not a code change.

Pruning contract (what the 100 TB path relies on):
- `pbucket = crc32(conv_id) % B`  ≙ Iceberg `bucket(B, conv_id)` — point
  lookups and per-bucket work units touch 1/B of files;
- `pday = date(ts)`               ≙ Iceberg `days(ts)` — time-range queries
  prune by directory; parquet min/max stats prune within.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 16


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False


def partition_cols(df: DataFrame, ts_col: str = "ts", n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return df.withColumn(
        "pbucket", (F.crc32(F.col("conv_id")) % n_buckets).cast("int")
    ).withColumn("pday", F.to_date(F.col(ts_col)))


def write_fact(
    df: DataFrame,
    path_or_table: str,
    ts_col: str = "ts",
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "append",
) -> None:
    """Write a conv-keyed fact table with bucket+day partitioning."""
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in path_or_table:
        writer = df.writeTo(path_or_table).partitionedBy(
            F.bucket(n_buckets, F.col("conv_id")), F.days(F.col(ts_col))
        )
        # both backends must share write semantics: append appends, anything
        # else replaces — otherwise flipping Iceberg on silently turns
        # incremental loads into full-table rewrites. Existence is checked
        # explicitly: catching a bare append failure and retrying as create
        # would misdiagnose schema/permission/commit errors as table-missing
        if mode == "append":
            if spark.catalog.tableExists(path_or_table):
                writer.append()
            else:
                writer.create()
        else:
            writer.createOrReplace()
    else:
        (
            partition_cols(df, ts_col, n_buckets)
            .write.mode(mode)
            .partitionBy("pbucket", "pday")
            .parquet(path_or_table)
        )


def read_fact(
    spark: SparkSession,
    path_or_table: str,
    conv_id: str | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Read back with bucket pruning when a conv_id is given: the filter on
    the partition column prunes directories before any file is opened."""
    if iceberg_available(spark) and "/" not in path_or_table:
        df = spark.read.table(path_or_table)
        if conv_id is not None:
            df = df.where(F.col("conv_id") == conv_id)
        return df
    df = spark.read.parquet(path_or_table)
    if conv_id is not None:
        import zlib

        b = zlib.crc32(conv_id.encode()) % n_buckets
        df = df.where((F.col("pbucket") == b) & (F.col("conv_id") == conv_id))
    return df.drop("pbucket", "pday")


def zorder_value(x, y, bits: int = 16):
    """Morton/Z-order interleave of two non-negative integer columns
    (the Delta/Iceberg OPTIMIZE ZORDER layout key): bit i of x lands at
    output bit 2i, bit i of y at 2i+1, so lexicographic order on the
    z-value keeps rows close in BOTH dimensions — range-partitioning by
    it clusters scans that filter on either column (multi-dimensional
    data skipping from one sort key). Pure integer Column expr
    (unrolled shifts/masks, whole-stage codegen); ``bits`` per
    dimension, result < 2^(2·bits). Inputs are masked to their low
    ``bits`` bits (two's-complement for negatives), so out-of-domain
    values alias deterministically instead of producing stray high
    bits — callers wanting distinct cells for a wider domain must
    pre-bucket into [0, 2^bits)."""
    from pyspark.sql import functions as F

    mask = F.lit((1 << bits) - 1)
    xm = x.cast("long").bitwiseAND(mask)
    ym = y.cast("long").bitwiseAND(mask)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_layout(
    df,
    x_col: str,
    y_col: str,
    n_files: int = 32,
    bits: int = 16,
):
    """Assign each row its z-value and a range-partitioned file bucket:
    ``repartitionByRange(n_files, z)`` is the write-side clustering step
    (each output file covers a compact z-range ⇒ tight min/max stats on
    BOTH dimensions ⇒ row-group skipping for either predicate at read
    time). Returns the frame with ``zval`` for inspection; callers chain
    ``.write`` for the clustered layout."""
    from pyspark.sql import functions as F

    out = df.withColumn(
        "zval", zorder_value(F.col(x_col), F.col(y_col), bits=bits)
    )
    return out.repartitionByRange(n_files, F.col("zval"))


def compaction_plan(
    files,
    size_col: str = "bytes",
    target_bytes: int = 128 * 1024 * 1024,
    keys: tuple[str, ...] = ("bucket",),
    order_col: str = "file_id",
):
    """Small-file compaction planner (the OPTIMIZE / rewrite-data-files
    maintenance step every lakehouse table needs): within each partition
    key, greedily pack files in id order into merge groups that close as
    soon as the running size crosses ``target_bytes``. group =
    floor(exclusive-prefix-sum / target): a file whose own size spans
    multiple targets still lands in exactly one group, and every group
    except possibly the last holds ≥ target once closed by the next
    file. Pure integer window math over ONE key-sorted exchange — the
    planner touches file STATS (catalog-sized), never data. The group
    assignment uses SQL ``div`` (integral division on longs) so it
    stays exact at any cumulative size — float ``/`` would round past
    2^53 bytes of prefix."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = (
        W.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum(size_col).over(w).cast("long")
    prefix_excl = cum - F.col(size_col).cast("long")
    return (
        files.select(
            *keys,
            order_col,
            F.col(size_col).cast("long").alias(size_col),
            prefix_excl.alias("_prefix_excl"),
        )
        .withColumn(
            "merge_group",
            F.expr(f"_prefix_excl div {int(target_bytes)}L").cast("long"),
        )
        .drop("_prefix_excl")
    )
