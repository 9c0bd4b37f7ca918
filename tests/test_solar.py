"""Solar pack (F1-F12) tests: Spark Column exprs vs vectorized numpy twins
on a grid covering mid-latitudes AND the polar special cases."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsengine import solar

LATS = [-80.0, -45.0, 0.0, 30.0, 59.9, 78.0]
LONS = [-120.0, -10.0, 0.0, 25.0, 179.0]
DAYS = [1, 80, 172, 200, 265, 355]
HOURS = [0.0, 3.0, 6.0, 9.0, 12.0, 15.0, 18.0, 21.0, 23.0]


@pytest.fixture(scope="module")
def grid(spark):
    rows = [
        (float(h), float(n), la, lo)
        for h in HOURS for n in DAYS for la in LATS for lo in LONS
    ]
    return spark.createDataFrame(rows, "h double, n double, lat double, lon double")


def _np_cols(pdf):
    return (
        pdf["h"].to_numpy(), pdf["n"].to_numpy(),
        pdf["lat"].to_numpy(), pdf["lon"].to_numpy(),
    )


def test_geometry_matches_numpy(grid):
    out = grid.select(
        "h", "n", "lat", "lon",
        solar.decl(F.col("n")).alias("decl"),
        solar.hourangle(F.col("h"), F.col("lon")).alias("w"),
        solar.hourangle_sunset(F.col("n"), F.col("lat")).alias("ws"),
        solar.zenithangle(F.col("h"), F.col("n"), F.col("lat"), F.col("lon")).alias("thz"),
    ).toPandas()
    h, n, lat, lon = _np_cols(out)
    np.testing.assert_allclose(out["decl"], solar.np_decl(n), rtol=1e-12)
    np.testing.assert_allclose(out["w"], solar.np_hourangle(h, lon), rtol=1e-12)
    np.testing.assert_allclose(out["ws"], solar.np_hourangle_sunset(n, lat), rtol=1e-12)
    np.testing.assert_allclose(out["thz"], solar.np_zenithangle(h, n, lat, lon), rtol=1e-12)
    # polar special values present in the grid: summer light (-1), polar night (pi)
    assert (out["ws"] == -1.0).any() and (out["ws"] == math.pi).any()


def test_cpr_rtd_match_numpy(grid):
    a, b, f = solar.cpr(F.col("h"), F.col("n"), F.col("lat"), F.col("lon"))
    rt, rd = solar.r_td(F.col("h"), F.col("n"), F.col("lat"), F.col("lon"))
    out = grid.select(
        "h", "n", "lat", "lon",
        a.alias("a"), b.alias("b"), f.alias("f"), rt.alias("rt"), rd.alias("rd"),
    ).toPandas()
    h, n, lat, lon = _np_cols(out)
    na, nb, nf = solar.np_cpr(h, n, lat, lon)
    nrt, nrd = solar.np_r_td(h, n, lat, lon)
    np.testing.assert_allclose(out["a"], na, rtol=1e-12)
    np.testing.assert_allclose(out["b"], nb, rtol=1e-12)
    np.testing.assert_allclose(out["f"], nf, rtol=1e-9)
    np.testing.assert_allclose(out["rt"], nrt, rtol=1e-9)
    np.testing.assert_allclose(out["rd"], nrd, rtol=1e-9)
    assert (out["rt"] >= 0).all() and (out["rd"] >= 0).all()
    # f is zeroed outside the daylight window (night rows exist in grid)
    assert (out["f"] == 0.0).any()


@pytest.mark.parametrize("tracking", [None, "fixed", "azimuth", "2-axis"])
def test_rb_and_power_match_numpy(grid, tracking):
    slope, azim, albedo, eta = 35.0 * solar.RAD, 180.0, 0.2, 0.95
    g = grid.withColumn("ssrd", (F.col("h") * 100000.0 + 50000.0)).withColumn(
        "fdir", F.col("ssrd") * 0.6
    ).withColumn("ts", F.expr(
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,cast(h as int),0,0)"
        " + make_interval(0,0,0,cast(n as int)-1,0,0,0)"
    ))
    out = solar.compute_solar_power(
        g, F.col("lat"), F.col("lon"), slope, azim, albedo, eta, tracking
    ).toPandas()
    h, n, lat, lon = _np_cols(out)
    want = solar.np_solar_power(
        out["ssrd"].to_numpy(), out["fdir"].to_numpy(), h, n, lat, lon,
        slope, azim, albedo, eta, tracking,
    )
    np.testing.assert_allclose(out["power"], want, rtol=1e-9, atol=1e-15)
    assert (out["power"] >= 0).all()


def test_tracker_dispatch_raises():
    with pytest.raises(ValueError):
        solar.panel_angles("bogus", 0.5, 180.0, 60.0, 10.0, F.lit(12.0), F.lit(100.0))


def test_components_sum_to_total(grid):
    slope = 30.0 * solar.RAD
    comp = solar.tilted_components(
        F.lit(800.0), F.lit(400.0), slope,
        solar.hourangle(F.col("h"), F.col("lon") - 180.0),
        F.col("h"), F.col("n"), F.col("lat"), F.col("lon"), 0.2,
    )
    out = grid.select(
        comp["direct"].alias("d"), comp["diffuse"].alias("f"),
        comp["reflect"].alias("r"), comp["total"].alias("t"),
    ).toPandas()
    np.testing.assert_allclose(out["t"], out["d"] + out["f"] + out["r"], rtol=1e-12)


def test_tilted_from_daily_renorm_invariant(spark):
    """Per-day hourly beam estimates must renormalize to the daily total
    (when the pre-scale sum is positive), matching `ncep/solar.py:296-301`."""
    rows = []
    for day, doy, hb, hd in [("2024-03-01", 61, 4800.0, 2400.0),
                             ("2024-06-20", 172, 9000.0, 3000.0),
                             ("2024-12-21", 356, 600.0, 900.0)]:
        for h in range(24):
            rows.append(("s1", day, doy, h, hb, hd))
    df = spark.createDataFrame(
        rows, "site string, day_ts string, doy int, hour int, Hb double, Hd double"
    )
    out = solar.tilted_from_daily(
        df, keys=["site"], lat=59.9, lon=10.7, slope=40.0 * solar.RAD, albedo=0.2
    )
    agg = out.groupBy("day_ts", "Hb", "Hd").agg(
        F.sum("hhb").alias("sb"), F.sum("hhd").alias("sd"),
        F.sum("h_total").alias("st"),
    ).toPandas()
    for _, r in agg.iterrows():
        if r["sb"] > 0:
            assert abs(r["sb"] - r["Hb"]) < 1e-6 * max(r["Hb"], 1.0)
        if r["sd"] > 0:
            assert abs(r["sd"] - r["Hd"]) < 1e-6 * max(r["Hd"], 1.0)
    # daylight hours actually produce irradiance on at least the two
    # non-winter days
    assert (agg["st"] > 0).sum() >= 2
