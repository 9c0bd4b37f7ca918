"""Distance-based interpolation weight tables — F15/J2 in SURVEY §2.3/§2.6.

Reference semantics reproduced (`src/rewemo/ncep_reanalysis/
timeseries_tools.py:16-76`):
- distance = spherical law-of-cosines "haversine" variant:
  r · arccos(cos(Δlat) − cos lat₁ · cos lat₂ · (1 − cos Δlon)),
  angles converted to radians FIRST (the subtraction happens in radians,
  matching `_spherical_dist` exactly);
- per target: if any grid point is at distance 0, those points take weight
  1 (the reference's exact-hit branch); otherwise the k smallest distances
  get weights ∝ 1/d, normalized to sum 1 (`computeInterpolationWeights`).

Spark shapes:
- the target set is tiny (points of interest) → grid × broadcast(targets)
  cross join, ranked per target by a (dist, grid_id) window. The window
  partitions by target_id, so state per task is |grid| rows for ONE target
  — at a huge grid, pre-filter by bounding box before ranking.
- the weight table itself is |targets| × k rows → always broadcast into
  the weighted re-aggregation join (J2): no shuffle of the fact table
  beyond its own groupBy.

Cross-engine parity notes (for the DuckDB oracle): radians conversion is an
explicit multiply by the same literal constant, distances are rounded to 4
decimals before weighting, weights to 6 — trig libm ulps can't flip the
driver's value hash.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

RAD = math.pi / 180.0
EARTH_R = 6378.137  # km, ≙ `timeseries_tools.py:16`


def spherical_dist(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column, r: float = EARTH_R
) -> Column:
    """Reference-exact spherical distance (degrees in, km out)."""
    la1, la2 = lat1 * F.lit(RAD), lat2 * F.lit(RAD)
    lo1, lo2 = lon1 * F.lit(RAD), lon2 * F.lit(RAD)
    arg = F.cos(la1 - la2) - F.cos(la1) * F.cos(la2) * (F.lit(1.0) - F.cos(lo1 - lo2))
    # clamp both ends: float spill above 1 for nearly-identical points and
    # below -1 for near-antipodal pairs would make acos return NaN (which
    # sorts last in Spark and silently drops the pair from kNN rankings)
    return F.lit(r) * F.acos(F.greatest(F.least(arg, F.lit(1.0)), F.lit(-1.0)))


def snap_to_grid(coord: Column, origin: float, step: float) -> Column:
    """J1 nearest-axis snap for a UNIFORM grid: the nearest grid value of
    ``coord`` on the axis origin + k·step (≙ xarray ``.sel(method=
    'nearest')`` after the argmin-|Δ| lookup, `src/rewemo/era5.py:11-17`).

    floor(x + 0.5) instead of round(): round() ties break differently
    across engines (half-even vs half-up); floor is bit-identical
    everywhere, and the half-step tie goes consistently up."""
    k = F.floor((coord - F.lit(origin)) / F.lit(step) + F.lit(0.5))
    return k * F.lit(step) + F.lit(origin)


def nearest_grid_join(
    points: DataFrame,
    grid: DataFrame,
    origin: tuple[float, float],
    step: tuple[float, float],
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Nearest-neighbour spatial join on a uniform grid, as an EQUI-join:
    snap each point's coordinates to the nearest axis values, then
    broadcast-join the (small) grid dimension on the snapped key — the
    distributed form of per-point ``ds.sel(..., method='nearest')``
    (`src/rewemo/era5.py:174-176,211-213`). Never a cross join: the snap
    is a pure projection, the join is hash-equi on exact grid keys."""
    snapped = points.withColumn(
        "_glat", snap_to_grid(F.col(lat), origin[0], step[0])
    ).withColumn("_glon", snap_to_grid(F.col(lon), origin[1], step[1]))
    g = grid.select(
        F.col(lat).alias("_glat"), F.col(lon).alias("_glon"),
        *[c for c in grid.columns if c not in (lat, lon)],
    )
    return snapped.join(F.broadcast(g), ["_glat", "_glon"], "left").drop(
        "_glat", "_glon"
    )


def normalize_grid_coords(df: DataFrame, lat: str = "lat", lon: str = "lon") -> DataFrame:
    """V3 input normalization (≙ `timeseries_tools.py:84-86`): wrap
    longitude from [0, 360) into [-180, 180) and nudge the poles off ±90
    (the spherical distance degenerates exactly at the poles)."""
    lo = F.when(F.col(lon) < 180.0, F.col(lon)).otherwise(F.col(lon) - 360.0)
    la = (
        F.when(F.col(lat) == 90.0, F.lit(89.999))
        .when(F.col(lat) == -90.0, F.lit(-89.999))
        .otherwise(F.col(lat))
    )
    return df.withColumn(lat, la).withColumn(lon, lo)


def bbox_filter(
    df: DataFrame,
    lat_range: tuple[float, float],
    lon_range: tuple[float, float],
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """P7 spatial range predicate: a plain pushable column filter — prunes
    the grid BEFORE the cross join / ranking window, which is the 100 TB
    guard for build_knn_weight_table (with the grid stored partitioned by
    coarse cell this becomes partition pruning)."""
    (la0, la1), (lo0, lo1) = lat_range, lon_range
    return df.where(
        (F.col(lat) >= la0) & (F.col(lat) <= la1)
        & (F.col(lon) >= lo0) & (F.col(lon) <= lo1)
    )


def _nn_round(p: DataFrame, g0: DataFrame, c: float, point_id: str, grid_id: str) -> DataFrame:
    """One cell-bucketed candidate round: 3x3 neighbor-cell equi-join +
    per-point argmin. Returns (point_id, grid_id, nn_dist) best rows."""
    gb = g0.select(
        grid_id, "_gla", "_glo",
        F.floor(F.col("_gla") / c).alias("_cx"),
        F.floor(F.col("_glo") / c).alias("_cy"),
    )
    neigh = F.explode(
        F.array(*[
            F.struct(
                (F.floor(F.col("_pla") / c) + dx).alias("_cx"),
                (F.floor(F.col("_plo") / c) + dy).alias("_cy"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ])
    ).alias("_n")
    pb = p.select(point_id, "_pla", "_plo", neigh).select(
        point_id, "_pla", "_plo", "_n._cx", "_n._cy"
    )
    # explicit multiplies (not pow): exact IEEE ops + correctly-rounded
    # sqrt ⇒ bit-identical distances across engines, so the (dist, id)
    # ranking can never flip in a SQL oracle
    dx = F.col("_pla") - F.col("_gla")
    dy = F.col("_plo") - F.col("_glo")
    d = F.sqrt(dx * dx + dy * dy)
    cand = pb.join(gb, ["_cx", "_cy"]).select(point_id, grid_id, d.alias("nn_dist"))
    return (
        cand.withColumn(
            "_rk", F.row_number().over(W.partitionBy(point_id).orderBy("nn_dist", grid_id))
        )
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


def nearest_point_join(
    points: DataFrame,
    grid: DataFrame,
    cell: float,
    point_id: str = "point_id",
    grid_id: str = "grid_id",
    lat: str = "lat",
    lon: str = "lon",
    max_rounds: int = 4,
) -> DataFrame:
    """General (NON-uniform grid) nearest-neighbour join — the J1
    extension beyond the reference's uniform-grid snap (`weights.
    nearest_grid_join`): for every point, the euclidean-nearest grid row,
    found via cell-bucketed equi-joins, never a cross join.

    Plan per round: both sides key by (floor(lat/cell), floor(lon/cell));
    each point explodes into its 3x3 neighbor cells (9 keys) and
    equi-joins grid rows in those cells, then a (point, distance) window
    keeps the argmin. A best candidate at distance <= cell is PROVABLY the
    global minimum: any competitor nearer than it lies within ``cell`` in
    both axes, hence inside the 3x3 neighborhood. Points whose best
    candidate is farther (or who found none) escalate to the next round
    with the cell doubled — dense regions resolve in exactly one round,
    sparse regions pay log2(spread/cell) more; the escalation is a
    driver-side loop over a shrinking unresolved set, each round one
    bounded shuffle keyed by cells. The LAST round accepts its best
    candidate unconditionally (2^max_rounds * cell covers the spread by
    then; pick ``cell`` near the typical nearest-neighbor spacing).

    At 100 TB: the join is always hash-equi on cell keys (uniform at any
    density because the key IS the geometry) — same ``no_cartesian``
    contract as the LSH/simhash pairers. Euclidean on raw (lat, lon);
    feed projected coordinates for true spherical semantics."""
    p = points.select(point_id, F.col(lat).alias("_pla"), F.col(lon).alias("_plo"))
    g0 = grid.select(grid_id, F.col(lat).alias("_gla"), F.col(lon).alias("_glo"))
    resolved = None
    c = float(cell)
    for _ in range(max_rounds - 1):
        # persist each round's argmin (it feeds BOTH the resolved union
        # and the next round's anti-join), materialize those two
        # consumers as eager localCheckpoints (≤ |points| rows each,
        # lineage truncated so later actions never re-run the round's
        # join + window), then unpersist the round's cache immediately —
        # a long-running session holds only the checkpointed survivors,
        # not every round's candidate table
        best = _nn_round(p, g0, c, point_id, grid_id).persist()
        ok = best.where(F.col("nn_dist") <= c).localCheckpoint(eager=True)
        p = p.join(ok.select(point_id), point_id, "left_anti").localCheckpoint(
            eager=True
        )
        best.unpersist()
        resolved = ok if resolved is None else resolved.unionByName(ok)
        c *= 2.0
    # final round: cell = the combined bounding-box spread, which makes the
    # 3x3 neighborhood PROVABLY cover every grid point for every remaining
    # point (|Δ| ≤ spread ⇒ cell-index diff ≤ 1) — completeness without a
    # cross join. The two bbox aggs are tiny: the grid is dimension-sized
    # and the unresolved point set has shrunk through the rounds.
    gb_ext = g0.agg(
        F.min("_gla"), F.max("_gla"), F.min("_glo"), F.max("_glo")
    ).collect()[0]
    pb_ext = p.agg(
        F.min("_pla"), F.max("_pla"), F.min("_plo"), F.max("_plo")
    ).collect()[0]
    if pb_ext[0] is not None and gb_ext[0] is not None:
        lo_la = min(gb_ext[0], pb_ext[0])
        hi_la = max(gb_ext[1], pb_ext[1])
        lo_lo = min(gb_ext[2], pb_ext[2])
        hi_lo = max(gb_ext[3], pb_ext[3])
        c = max(hi_la - lo_la, hi_lo - lo_lo, c, 1e-9)
    # an empty grid flows through as an empty tail (no candidates), never
    # a crash — callers get the points they could resolve (none)
    tail = _nn_round(p, g0, c, point_id, grid_id)
    return tail if resolved is None else resolved.unionByName(tail)


def build_knn_weight_table(
    grid: DataFrame,
    targets: DataFrame,
    k: int = 3,
    grid_id: str = "grid_id",
    target_id: str = "target_id",
) -> DataFrame:
    """(grid_id, lat, lon) × (target_id, lat, lon) → (grid_id, target_id,
    weight), the J2 weight table. ≙ `computeInterpolationWeights`
    (`timeseries_tools.py:40-76`) including the exact-hit branch."""
    g = grid.select(grid_id, F.col("lat").alias("_gla"), F.col("lon").alias("_glo"))
    t = targets.select(
        target_id, F.col("lat").alias("_tla"), F.col("lon").alias("_tlo")
    )
    d = g.crossJoin(F.broadcast(t)).select(
        grid_id,
        target_id,
        F.round(
            spherical_dist(F.col("_gla"), F.col("_glo"), F.col("_tla"), F.col("_tlo")),
            4,
        ).alias("dist"),
    )
    wt = W.partitionBy(target_id)
    d = d.withColumn("_mind", F.min("dist").over(wt))

    zero = d.where((F.col("_mind") == 0) & (F.col("dist") == 0)).select(
        grid_id, target_id, F.lit(1.0).alias("weight")
    )
    ranked = (
        d.where(F.col("_mind") > 0)
        .withColumn(
            "_rk", F.row_number().over(wt.orderBy("dist", grid_id))
        )
        .where(F.col("_rk") <= k)
    )
    inv = F.lit(1.0) / F.col("dist")
    knn = ranked.withColumn("_s", F.sum(inv).over(wt)).select(
        grid_id, target_id, F.round(inv / F.col("_s"), 6).alias("weight")
    )
    return zero.unionByName(knn)


def weighted_rollup(
    fact: DataFrame,
    weight_table: DataFrame,
    grid_id: str = "grid_id",
    target_id: str = "target_id",
    ts_col: str = "ts",
    value_col: str = "value",
    freq_unit: str = "hour",
) -> DataFrame:
    """J2 weighted re-aggregation: broadcast-join the weight table onto the
    fact stream, then one groupBy (target, bucket) with a weighted sum —
    the matrix-product reaggregation of `ncep/wind.py:302-310` as a join +
    partial-agg plan. The fact table shuffles exactly once, keyed by the
    (small) target set × time bucket."""
    j = fact.join(F.broadcast(weight_table), grid_id)
    return (
        j.groupBy(target_id, F.date_trunc(freq_unit, ts_col).alias("bucket_ts"))
        .agg(
            F.sum(F.col(value_col) * F.col("weight")).alias("wsum"),
            F.count("*").alias("cnt"),
        )
    )
