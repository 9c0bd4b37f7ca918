"""EMPS fixed-text sink — S10 in SURVEY §2.1.

Reproduces `saveToFileEmps` (`src/rewemo/ncep_reanalysis/
timeseries_tools.py:407-454`): per series key, drop Feb-29 and Dec-31
(the 52×7=364-day EMPS year), pivot date×hour into 24 columns, and write
a semicolon-separated text file with the 3-line EMPS header and
``%9.3f``-formatted floats (missing hours render empty, matching pandas
``to_csv`` on NaN).

Spark shapes: the pivot + row formatting is fully distributed
(groupBy-pivot + format_string — one shuffle keyed by (key, day), all
JVM-side); line ordering rides the day column. The per-key file writer
mirrors the reference's per-area loop and is meant for dimension-sized
key sets (areas/sites); for corpus-scale fan-out use ``emps_lines``
directly with ``df.write.partitionBy(key).text`` and prepend headers
downstream.
"""

from __future__ import annotations

import os

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
    loop). Returns the written paths."""
    os.makedirs(os.path.abspath(outpath), exist_ok=True)
    lines = emps_lines(series, key, ts_col, value_col).cache()
    try:
        years = (
            drop_emps_days(series, ts_col)
            .groupBy(key)
            .agg(
                F.countDistinct(F.year(ts_col)).alias("y_num"),
                F.min(F.year(ts_col)).alias("y_start"),
            )
        )
        meta = {r[key]: (r["y_num"], r["y_start"]) for r in years.collect()}
        paths = []
        for k in sorted(meta):
            y_num, y_start = meta[k]
            params = "; ".join(
                str(x) for x in [y_num, y_start, 52, 1, 52, 0, 1, 3, "VIND"]
            )
            rows = (
                lines.where(F.col(key) == k).orderBy("day").select("line").collect()
            )
            fname = os.path.join(outpath, f"{k}.csv")
            with open(fname, "w") as f:
                for h in (HEADER_FIELDS, params, TITLE):
                    f.write(h + "\n")
                for r in rows:
                    f.write(r["line"] + "\n")
            paths.append(fname)
        return paths
    finally:
        lines.unpersist()
