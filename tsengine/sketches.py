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
    # the engine-wide 60-bit md5 carve — ONE definition, shared with the
    # text pipeline, so the parity-critical hash cannot drift per module;
    # oracle: ('0x'||substr(md5(x),1,15))::BIGINT
    from tsengine.textops import _h60 as _textops_h60

    return _textops_h60(col)


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


# ---------------------------------------------------------------------------
# Count-min sketch: the FREQUENCY sibling of the HLL above (HLL → how many
# distinct, CMS → how often each). Same design rules: md5-derived hashes so
# every cell reproduces bit-identically in SQL, and a merge that is a plain
# column sum — CMS(day1) + CMS(day2) ≡ CMS(day1 ∪ day2), so the retention
# tiers can carry per-day sketches and answer "how often did key X appear
# last quarter" without rescanning raw data. Estimate = min over the d rows
# (Cormode & Muthukrishnan 2005): always ≥ the true count, over by at most
# εN with probability 1−δ (ε = e/w ≈ 1.06%, δ = e^−d ≈ 1.8% at d=4, w=256).
# ---------------------------------------------------------------------------

CMS_D = 4    # hash rows
CMS_W = 256  # columns per row; d·w = 1024 cells/group ceiling


def _cms_col(value, row: int):
    # row-salted 60-bit md5 carve % w; oracle:
    #   ('0x'||substr(md5(<row>||'|'||x),1,15))::BIGINT % 256
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(row)), F.lit("|"), value)), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return h % CMS_W


def cms_build(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group CMS cells: (group..., row, col, cnt), non-zero cells only
    (absent ≡ 0). One union of d cheap projections and ONE groupBy — the
    shuffle carries ≤ d·w rows per group regardless of input size, with
    map-side partial aggregation doing the heavy counting."""
    v = F.col(value_col).cast("string")
    parts = [
        df.select(
            *group_cols,
            F.lit(r).alias("row"),
            _cms_col(v, r).alias("col"),
        )
        for r in range(CMS_D)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*group_cols, "row", "col").agg(
        F.count("*").cast("long").alias("cnt")
    )


def cms_merge(cells: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge cell sets (e.g. daily → monthly): element-wise sum — the
    lossless CMS union (counts are additive per cell)."""
    return cells.groupBy(*group_cols, "row", "col").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_query(
    cells: DataFrame,
    keys: DataFrame,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Point-estimate counts for each (group, key) in ``keys``: min over
    the d rows of the addressed cell (missing cell = 0). ``keys`` is a
    small lookup table (the candidates being audited), so the per-row
    address join broadcasts it; the output carries ``cms_est``.

    Estimator contract: cms_est ≥ true count always (cells only ever
    over-count by collision), within εN w.h.p. — the inequality is
    asserted as data by the `ts_cms_topk` oracle entry."""
    v = F.col(value_col).cast("string")
    addressed = None
    for r in range(CMS_D):
        a = keys.select(
            *group_cols,
            F.col(value_col),
            F.lit(r).alias("row"),
            _cms_col(v, r).alias("col"),
        )
        addressed = a if addressed is None else addressed.unionByName(a)
    joined = addressed.join(cells, [*group_cols, "row", "col"], "left")
    return joined.groupBy(*group_cols, value_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cms_est")
    )


# ---------------------------------------------------------------------------
# Bloom filter: the MEMBERSHIP sibling (HLL → how many distinct, CMS → how
# often, bloom → "did key X ever appear"). Spark ships bloom_filter_agg /
# might_contain SQL functions, but they are not registered in this build
# and their sketch bytes are engine-opaque anyway — this one follows the
# house pattern instead: md5-derived bit positions that reproduce
# bit-identically in ANSI SQL, a SPARSE set-bit representation (one row per
# set bit, absent ≡ 0), and a merge that is a plain distinct-union — OR of
# bloom filters, so per-day filters roll up through the retention tiers
# like every other sketch here.
#
# Contract (Bloom 1970): no false negatives ever (every inserted key's k
# positions are set), false positives at rate ≈ (1 − e^{−kn/m})^k — with
# k=4, m=1024 that is ~3.9% at n=150, ~1.2% at n=100. Both halves are
# audited AS DATA by the `ts_bloom_member` oracle entry (fn count must be
# 0; fp rate is an output column the tests bound).
# ---------------------------------------------------------------------------

BLOOM_K = 4     # hash functions (row-salted md5 carves)
BLOOM_M = 1024  # bits


def _bloom_pos(value, row: int):
    # row-salted 60-bit md5 carve % m; oracle:
    #   ('0x'||substr(md5(<row>||'|'||x),1,15))::BIGINT % 1024
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(row)), F.lit("|"), value)), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return h % BLOOM_M


def bloom_build(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group bloom set bits: (group..., bit), one row per SET bit.
    One union of k cheap projections and one distinct — the shuffle
    carries ≤ k·n rows pre-dedup and ≤ m rows per group after, with
    map-side partial dedup doing the heavy lifting."""
    v = F.col(value_col).cast("string")
    parts = [
        df.select(*group_cols, _bloom_pos(v, r).alias("bit"))
        for r in range(BLOOM_K)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.distinct()


def bloom_merge(bits: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge set-bit sets (e.g. daily → monthly): distinct union — the
    bitwise OR of bloom filters, lossless for membership."""
    return bits.select(*group_cols, "bit").distinct()


def bloom_query(
    bits: DataFrame,
    keys: DataFrame,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Membership test for each (group, key) in ``keys``: member iff ALL
    k addressed bits are set. ``keys`` is a small probe table (the
    candidates being audited), so the address join broadcasts it; output
    carries ``bloom_member`` (boolean)."""
    v = F.col(value_col).cast("string")
    addressed = None
    for r in range(BLOOM_K):
        a = keys.select(
            *group_cols, F.col(value_col), _bloom_pos(v, r).alias("bit")
        )
        addressed = a if addressed is None else addressed.unionByName(a)
    joined = addressed.join(bits, [*group_cols, "bit"], "left_semi").groupBy(
        *group_cols, value_col
    ).agg(F.count("*").cast("long").alias("_hits"))
    return (
        keys.select(*group_cols, value_col)
        .join(joined, [*group_cols, value_col], "left")
        .select(
            *group_cols,
            value_col,
            (F.coalesce(F.col("_hits"), F.lit(0)) == F.lit(BLOOM_K)).alias(
                "bloom_member"
            ),
        )
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum values) bottom-k sketch: the SAMPLE sibling (HLL → how
# many distinct as registers, KMV → the k smallest distinct hash values —
# simultaneously a deterministic uniform sample of the distinct set AND a
# distinct-count estimator est = (k−1)·2^60 / v_k, Bar-Yossef et al.
# RANDOM 2002 / Beyer et al. SIGMOD 2007). Same house rules: md5-carved
# hashes reproduce bit-identically in SQL; merge = distinct-union then
# re-take the k smallest, so merge(day sketches) ≡ sketch(all days) and
# the retention tiers can carry it. Exact below k (n < k distinct values
# → the sketch IS the distinct set), ~1/√(k−2) relative error above.
# ---------------------------------------------------------------------------

KMV_K = 32
_KMV_RANGE = float(1 << 60)  # hash domain size, exactly representable


def kmv_sample(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group bottom-k: (group..., hv, rk) — the KMV_K smallest
    distinct 60-bit hash values. One distinct (digest-keyed, uniform)
    + one rank window over ≤ the distinct count; at 100 TB the partial
    dedup compacts map-side and only distinct hashes reach the sort."""
    from pyspark.sql import Window

    h = _h60(F.col(value_col).cast("string"))
    d = df.select(*group_cols, h.alias("hv")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("hv")
    return (
        d.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= KMV_K)
    )


def kmv_merge(samples: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sample sets (e.g. daily → monthly): distinct-union then keep
    the k smallest again — the lossless KMV union."""
    from pyspark.sql import Window

    d = samples.select(*group_cols, "hv").distinct()
    w = Window.partitionBy(*group_cols).orderBy("hv")
    return (
        d.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= KMV_K)
    )


def kmv_estimate(samples: DataFrame, group_cols: list[str]) -> DataFrame:
    """Distinct-count estimate per group: exact count when fewer than k
    hashes exist (the sketch saw every distinct value), else
    (k−1)·2^60 / v_k with v_k = the k-th smallest hash. Two float ops on
    integer-exact operands; rounded to 2 dp."""
    agg = samples.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_sample"),
        F.max("hv").alias("_vk"),
    )
    est = F.when(
        F.col("n_sample") < F.lit(KMV_K),
        F.col("n_sample").cast("double"),
    ).otherwise(
        F.lit(float(KMV_K - 1)) * F.lit(_KMV_RANGE) / F.col("_vk").cast("double")
    )
    return agg.select(
        *group_cols, "n_sample", F.round(est, 2).alias("kmv_est")
    )
