"""EMPS fixed-text sink — S10 in SURVEY §2.1.

Reproduces `saveToFileEmps` (`src/rewemo/ncep_reanalysis/
timeseries_tools.py:407-454`): per series key, drop Feb-29 and Dec-31
(the 52×7=364-day EMPS year), pivot date×hour into 24 columns, and write
a semicolon-separated text file with the 3-line EMPS header and
``%9.3f``-formatted floats (missing hours render empty, matching pandas
``to_csv`` on NaN).

Spark shapes: the pivot + row formatting is fully distributed
(groupBy-pivot + format_string — one shuffle keyed by (key, day), all
JVM-side); line ordering rides the day column. ``write_emps`` is a
single ``partitionBy(key).text`` write (headers unioned in as sortable
rows, one part file per key) — no per-key driver loop, no collect; the
driver only renames the per-key part files, O(#keys) fs ops.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# `timeseries_tools.py:443-448` — the EMPS header block (public format)
HEADER_FIELDS = (
    "Antall aar;Startaar;Antall uker;Startuke;Sluttuke;Startdogn;"
    "Type data(Vind=1, Tilsig=2);"
    "Type oppløsning(Uke=1, Dogn=2, Time=3);"
)
TITLE = "Vindserier på timenivå;"


def drop_emps_days(df: DataFrame, ts_col: str = "bucket_ts") -> DataFrame:
    """P5/P6: remove Feb-29 and Dec-31 → 364-day EMPS year
    (`timeseries_tools.py:425-433`)."""
    t = F.col(ts_col)
    return df.where(~((F.month(t) == 2) & (F.dayofmonth(t) == 29))).where(
        ~((F.month(t) == 12) & (F.dayofmonth(t) == 31))
    )


def emps_lines(
    series: DataFrame,
    key: str = "conv_id",
    ts_col: str = "bucket_ts",
    value_col: str = "value",
) -> DataFrame:
    """(key, ts, value) → (key, day, line): one formatted EMPS row per day,
    24 ``%9.3f`` fields ``;``-joined, missing hours empty."""
    hours = [f"h{h:02d}" for h in range(24)]
    pivoted = (
        drop_emps_days(series, ts_col)
        .select(
            key,
            F.to_date(ts_col).alias("day"),
            F.format_string("h%02d", F.hour(ts_col)).alias("hr"),
            F.col(value_col).alias("v"),
        )
        .groupBy(key, "day")
        .pivot("hr", hours)
        .agg(F.avg("v"))
    )
    fields = [
        F.when(F.col(h).isNull(), F.lit("")).otherwise(
            F.format_string("%9.3f", F.col(h))
        )
        for h in hours
    ]
    return pivoted.select(key, "day", F.concat_ws(";", *fields).alias("line"))


def write_emps(
    series: DataFrame,
    outpath: str,
    key: str = "conv_id",
    ts_col: str = "bucket_ts",
    value_col: str = "value",
) -> list[str]:
    """Write one ``<key>.csv`` per series key (≙ the reference's per-area
    loop, `timeseries_tools.py:407-454`). Returns the written paths.

    Fully distributed — ONE ``partitionBy(key).text`` write, no per-key
    driver loop and no data rows through the driver: header lines (the
    per-key params row included) are unioned onto the day lines with a
    sort key, the union is hash-repartitioned by ``key`` (each key →
    exactly one task → exactly one part file) and sorted within
    partitions by (key, section, day). The writer's required ordering
    (the partition column) is already satisfied by that sort's prefix,
    so Spark inserts NO extra sort and row order inside each file is
    preserved. Driver work is O(#keys) file renames — inherent to the
    file-per-key contract, independent of data volume.

    Key values must be filesystem-safe (true for conv ids); exotic keys
    would be Hive-escaped in the staging dir names."""
    outpath = os.path.abspath(outpath)
    os.makedirs(outpath, exist_ok=True)
    clean = drop_emps_days(series, ts_col)
    params_line = F.concat_ws(
        "; ",
        F.count_distinct(F.year(ts_col)).cast("string"),
        F.min(F.year(ts_col)).cast("string"),
        *[F.lit(str(x)) for x in (52, 1, 52, 0, 1, 3, "VIND")],
    )
    hdr = (
        clean.groupBy(key)
        .agg(params_line.alias("_params"))
        .select(
            key,
            F.lit(0).alias("_sec"),
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("s"), F.lit(HEADER_FIELDS).alias("line")),
                    F.struct(F.lit(1).alias("s"), F.col("_params").alias("line")),
                    F.struct(F.lit(2).alias("s"), F.lit(TITLE).alias("line")),
                )
            ).alias("h"),
        )
        .select(key, "_sec", F.col("h.s").alias("_sub"), F.lit("").alias("_day"), F.col("h.line").alias("line"))
    )
    body = emps_lines(series, key, ts_col, value_col).select(
        key,
        F.lit(1).alias("_sec"),
        F.lit(0).alias("_sub"),
        F.col("day").cast("string").alias("_day"),  # ISO date sorts lexically
        "line",
    )
    staging = os.path.join(outpath, "_spark_staging")
    (
        hdr.unionByName(body)
        .repartition(F.col(key))
        .sortWithinPartitions(key, "_sec", "_sub", "_day")
        .select(F.col(key), F.col("line"))
        .write.mode("overwrite")
        .partitionBy(key)
        .text(staging)
    )
    paths = []
    for d in sorted(os.listdir(staging)):
        if not d.startswith(f"{key}="):
            continue
        kval = d.split("=", 1)[1]
        pdir = os.path.join(staging, d)
        parts = sorted(f for f in os.listdir(pdir) if f.startswith("part-"))
        # repartition(key) guarantees one task -> one part file per key;
        # fail LOUDLY if a config (e.g. spark.sql.files.maxRecordsPerFile)
        # split the write — renaming only parts[0] would silently drop the
        # rest of the key's rows, and an empty dir means a torn write
        if len(parts) != 1:
            raise RuntimeError(
                f"EMPS staging for {key}={kval} has {len(parts)} part files "
                "(expected exactly 1); refusing to emit a partial export"
            )
        dst = os.path.join(outpath, f"{kval}.csv")
        os.replace(os.path.join(pdir, parts[0]), dst)
        paths.append(dst)
    shutil.rmtree(staging)
    return paths
