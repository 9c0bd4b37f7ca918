"""weights tests against the reference's numpy formulas."""

from __future__ import annotations

import numpy as np
import pytest

from tsengine import weights


def _ref_dist(pos1, pos2, r=6378.137):
    """Reference `_spherical_dist` (timeseries_tools.py:16-38) re-typed as
    the parity oracle."""
    pos1 = np.asarray(pos1, dtype=np.float64) * np.pi / 180
    pos2 = np.asarray(pos2, dtype=np.float64) * np.pi / 180
    cos_lat1 = np.cos(pos1[..., 0])
    cos_lat2 = np.cos(pos2[..., 0])
    cos_lat_d = np.cos(pos1[..., 0] - pos2[..., 0])
    cos_lon_d = np.cos(pos1[..., 1] - pos2[..., 1])
    return r * np.arccos(
        np.minimum(cos_lat_d - cos_lat1 * cos_lat2 * (1 - cos_lon_d), 1.0)
    )


@pytest.fixture(scope="module")
def tables(spark):
    grid_rows = [(i, float(10 * (i % 5)), float(15 * (i // 5))) for i in range(15)]
    target_rows = [(0, 12.0, 20.0), (1, 40.0, 30.0), (2, 10.0, 15.0)]  # t2 = exact hit on grid 6
    g = spark.createDataFrame(grid_rows, "grid_id long, lat double, lon double")
    t = spark.createDataFrame(target_rows, "target_id long, lat double, lon double")
    return g, t, grid_rows, target_rows


def test_weight_table_matches_reference(tables):
    g, t, grid_rows, target_rows = tables
    wt = weights.build_knn_weight_table(g, t, k=3).toPandas()
    for tid, tla, tlo in target_rows:
        sub = wt[wt["target_id"] == tid].set_index("grid_id")["weight"]
        d = np.round(
            _ref_dist(np.array([[la, lo] for _, la, lo in grid_rows]), [tla, tlo]), 4
        )
        if (d == 0).any():
            # exact-hit branch: weight 1 on the zero-distance grid points only
            hit = {grid_rows[i][0] for i in np.nonzero(d == 0)[0]}
            assert set(sub.index) == hit
            assert (sub == 1.0).all()
        else:
            order = np.argsort(d, kind="stable")[:3]
            inv = 1.0 / d[order]
            expect = inv / inv.sum()
            assert set(sub.index) == {grid_rows[i][0] for i in order}
            for pos, i in enumerate(order):
                assert sub[grid_rows[i][0]] == pytest.approx(expect[pos], abs=1e-6)


def test_weights_sum_to_one(tables):
    g, t, _, _ = tables
    wt = weights.build_knn_weight_table(g, t, k=3).toPandas()
    sums = wt.groupby("target_id")["weight"].sum()
    np.testing.assert_allclose(sums, 1.0, atol=2e-6)


def test_weighted_rollup_broadcast_plan(tables, spark):
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    g, t, _, _ = tables
    wt = weights.build_knn_weight_table(g, t, k=3)
    fact = spark.createDataFrame(
        [(i % 15, f"2024-01-01 0{i % 10}:00:00", float(i)) for i in range(100)],
        "grid_id long, ts string, value double",
    ).select("grid_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    out = weights.weighted_rollup(fact, wt)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()
    pdf = out.toPandas()
    assert (pdf["cnt"] > 0).all()


def test_normalize_grid_coords(spark):
    rows = [(0, 90.0, 350.0), (1, -90.0, 180.0), (2, 45.0, 179.0), (3, 0.0, 0.0)]
    df = spark.createDataFrame(rows, "grid_id long, lat double, lon double")
    out = weights.normalize_grid_coords(df).toPandas().set_index("grid_id")
    assert out.loc[0, "lat"] == 89.999 and out.loc[0, "lon"] == -10.0
    assert out.loc[1, "lat"] == -89.999 and out.loc[1, "lon"] == -180.0
    assert out.loc[2, "lat"] == 45.0 and out.loc[2, "lon"] == 179.0
    assert out.loc[3, "lon"] == 0.0


def test_bbox_filter_prunes(spark):
    rows = [(i, float(i * 10 - 40), float(i * 20 - 80)) for i in range(9)]
    df = spark.createDataFrame(rows, "grid_id long, lat double, lon double")
    kept = weights.bbox_filter(df, (-20.0, 20.0), (-50.0, 50.0)).toPandas()
    assert set(kept["grid_id"]) == {
        i for i in range(9)
        if -20 <= i * 10 - 40 <= 20 and -50 <= i * 20 - 80 <= 50
    }


def test_nearest_point_join_matches_bruteforce(spark):
    """Cell-bucketed general NN join == brute-force argmin, including a
    sparse outlier that needs escalation rounds."""
    import numpy as np

    rng = np.random.default_rng(11)
    # non-uniform grid: clustered blob + scattered tail
    gx = np.concatenate([rng.normal(10, 1.0, 40), rng.uniform(0, 50, 10)])
    gy = np.concatenate([rng.normal(20, 1.5, 40), rng.uniform(0, 50, 10)])
    grid = spark.createDataFrame(
        [(i, float(gx[i]), float(gy[i])) for i in range(50)],
        "grid_id long, lat double, lon double",
    )
    px = np.concatenate([rng.normal(10, 2.0, 30), np.array([49.0, -30.0])])
    py = np.concatenate([rng.normal(20, 2.0, 30), np.array([49.0, -30.0])])
    pts = spark.createDataFrame(
        [(i, float(px[i]), float(py[i])) for i in range(32)],
        "point_id long, lat double, lon double",
    )
    got = {
        r["point_id"]: (r["grid_id"], r["nn_dist"])
        for r in weights.nearest_point_join(pts, grid, cell=1.0).collect()
    }
    assert len(got) == 32
    for i in range(32):
        d = np.sqrt((px[i] - gx) ** 2 + (py[i] - gy) ** 2)
        j = int(np.argmin(d))
        assert got[i][0] == j, f"point {i}: got {got[i][0]}, want {j}"
        assert abs(got[i][1] - float(d[j])) < 1e-9


def test_nearest_point_join_no_cartesian(spark):
    grid = spark.createDataFrame(
        [(i, float(i), float(i)) for i in range(20)],
        "grid_id long, lat double, lon double",
    )
    pts = spark.createDataFrame(
        [(i, i + 0.1, i + 0.2) for i in range(20)],
        "point_id long, lat double, lon double",
    )
    plan = weights.nearest_point_join(pts, grid, cell=2.0)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
