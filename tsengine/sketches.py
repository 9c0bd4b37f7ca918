"""Reaggregable distinct-count sketch: a deterministic HyperLogLog.

The cardinality sibling of the histogram sketch in `tsengine/rollup.py`
(hist → quantiles, HLL → distinct counts): registers roll up through the
retention tiers with max() exactly like cnt/sum roll up with sum() —
merge(day sketches) ≡ sketch(all days), so a 1d tier can answer "distinct
users last quarter" without rescanning raw data. `approx_count_distinct`
cannot do this: its sketch is opaque, engine-specific, and not
oracle-checkable.

Determinism design (Flajolet et al. 2007 HLL with md5 hashing):
- hash = the engine-wide 60-bit md5 carve (same as textops) — bit-identical
  in DuckDB, so registers match exactly;
- rho via STRING bit-length (``length(ltrim(bin(r), '0'))``) — integer
  exact in both engines, no log2-on-double ulp edges;
- the indicator sum Σ 2^(-M_j) is computed as the INTEGER Σ 2^(55 − M_j)
  (max 64 · 2^54 < 2^61, exact in int64) and divided once in double — the
  one FP op, identical operands both engines.

m = 64 registers → relative error ≈ 1.04/√64 ≈ 13%; the register column
is 64 rows per group (long + byte), negligible next to any tier row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M = 64  # registers (2^6)
_BUCKET_BITS = 6
_REM_BITS = 60 - _BUCKET_BITS  # 54-bit remainder field
ALPHA = 0.709  # alpha_64, Flajolet et al. 2007 Table/eq. for m = 64


def _h60(col):
    # 60-bit md5 carve; oracle: ('0x'||substr(md5(x),1,15))::BIGINT
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Build per-group HLL registers: (group..., bucket, rho) with one row
    per NON-EMPTY register (absent bucket ≡ register 0). bucket = low 6
    hash bits; rho = 1 + leading zeros of the 54-bit remainder
    (= 55 − bit_length(remainder), 55 when the remainder is 0)."""
    h = _h60(F.col(value_col).cast("string"))
    rem = F.shiftright(h, _BUCKET_BITS)
    # bit_length(rem) as a string op: Spark's bin() has no leading zeros
    # except bin(0) = '0', which the regexp strips to '' → length 0 → rho 55
    rho = F.lit(_REM_BITS + 1).cast("long") - F.length(
        F.regexp_replace(F.bin(rem), "^0+", "")
    ).cast("long")
    return df.groupBy(
        *group_cols, h.bitwiseAND(F.lit(M - 1).cast("long")).alias("bucket")
    ).agg(F.max(rho).alias("rho"))


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register sets (e.g. daily → monthly): max per bucket — the
    lossless HLL union, same algebra the tier cascade uses for min/max."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("rho")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cardinality estimate per group from its registers.

    est_raw = alpha · m² / Σ_j 2^(−M_j), with the small-range linear
    counting correction (est_raw ≤ 2.5 m and empty registers remain →
    m · ln(m / V)). The indicator sum is integer-exact (docstring above);
    the estimate is rounded to 2 dp."""
    scale = 1 << (_REM_BITS + 1)  # 2^55: integer weight of an empty register
    agg = registers.groupBy(*group_cols).agg(
        # shiftleft with a COLUMN shift amount needs the SQL form — the
        # PySpark wrapper only takes an int literal
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), cast({_REM_BITS + 1} - rho as int))"))
        .alias("_present_sum"),
        F.count("*").cast("long").alias("_n_present"),
    )
    zeros = F.lit(M).cast("long") - F.col("_n_present")
    int_total = F.col("_present_sum") + zeros * F.lit(scale).cast("long")
    # numerator folded left-to-right: (alpha · m²) · 2^55 — mirrored in SQL
    est_raw = (
        F.lit(ALPHA) * F.lit(float(M * M)) * F.lit(float(scale))
    ) / int_total.cast("double")
    est = F.when(
        (est_raw <= F.lit(2.5 * M)) & (zeros > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / zeros.cast("double")),
    ).otherwise(est_raw)
    return agg.select(*group_cols, F.round(est, 2).alias("hll_est"))


def hll_distinct(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Convenience: registers → estimate in one call (per-group distinct
    count of ``value_col``)."""
    return hll_estimate(
        hll_registers(df, value_col, group_cols), group_cols
    )
