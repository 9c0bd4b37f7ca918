"""sketches.py unit tests: HLL determinism, merge ≡ rebuild, accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from tsengine import sketches


def _ids(spark, n, group="g", start=0):
    return spark.range(start, start + n).select(
        F.lit(group).alias("grp"), F.col("id").cast("string").alias("uid")
    )


def test_hll_merge_equals_rebuild(spark):
    # THE reaggregability property the tier cascade relies on:
    # merge(sketch(part1), sketch(part2)) == sketch(part1 ∪ part2),
    # including overlapping parts (union, not sum)
    part1 = _ids(spark, 400, start=0)
    part2 = _ids(spark, 400, start=300)  # 100-id overlap
    whole = part1.unionByName(part2)

    r1 = sketches.hll_registers(part1, "uid", ["grp"])
    r2 = sketches.hll_registers(part2, "uid", ["grp"])
    merged = sketches.hll_merge(r1.unionByName(r2), ["grp"])
    direct = sketches.hll_registers(whole, "uid", ["grp"])

    m = {(r["bucket"],): r["rho"] for r in merged.collect()}
    d = {(r["bucket"],): r["rho"] for r in direct.collect()}
    assert m == d  # registers bit-identical, not just estimates close

    em = sketches.hll_estimate(merged, ["grp"]).collect()[0]["hll_est"]
    ed = sketches.hll_estimate(direct, ["grp"]).collect()[0]["hll_est"]
    assert em == ed


def test_hll_estimate_accuracy(spark):
    # m=64 -> typical relative error 1.04/sqrt(64) ~ 13%; allow 3 sigma
    n = 700
    est = sketches.hll_distinct(_ids(spark, n), "uid", ["grp"]).collect()[0][
        "hll_est"
    ]
    assert abs(est - n) / n < 0.40


def test_hll_small_range_linear_counting(spark):
    # tiny cardinality hits the linear-counting branch and is near-exact
    est = sketches.hll_distinct(_ids(spark, 5), "uid", ["grp"]).collect()[0][
        "hll_est"
    ]
    assert abs(est - 5) < 1.0


def test_hll_deterministic_and_duplicate_insensitive(spark):
    df = _ids(spark, 300)
    dup = df.unionByName(df).unionByName(df)  # 3x duplicated rows
    e1 = sketches.hll_distinct(df, "uid", ["grp"]).collect()[0]["hll_est"]
    e2 = sketches.hll_distinct(dup, "uid", ["grp"]).collect()[0]["hll_est"]
    e3 = sketches.hll_distinct(df, "uid", ["grp"]).collect()[0]["hll_est"]
    assert e1 == e2 == e3


def test_hll_groups_independent(spark):
    df = _ids(spark, 200, group="a").unionByName(_ids(spark, 200, group="b"))
    single = sketches.hll_distinct(_ids(spark, 200, group="a"), "uid", ["grp"])
    both = sketches.hll_distinct(df, "uid", ["grp"])
    sa = single.collect()[0]["hll_est"]
    ba = {r["grp"]: r["hll_est"] for r in both.collect()}
    assert ba["a"] == sa == ba["b"]  # same ids -> same registers per group


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def _freq_df(spark, pairs, group="g"):
    rows = [(group, str(uid)) for uid, n in pairs for _ in range(n)]
    return spark.createDataFrame(rows, "grp string, uid string")


def test_cms_never_underestimates_and_exact_when_sparse(spark):
    pairs = [(1, 50), (2, 30), (3, 5), (4, 1)]
    df = _freq_df(spark, pairs)
    cells = sketches.cms_build(df, "uid", ["grp"])
    keys = spark.createDataFrame(
        [("g", str(u)) for u, _ in pairs], "grp string, uid string"
    )
    got = {
        r["uid"]: r["cms_est"]
        for r in sketches.cms_query(cells, keys, "uid", ["grp"]).collect()
    }
    truth = {str(u): n for u, n in pairs}
    for uid, n in truth.items():
        assert got[uid] >= n           # CMS contract: never under
    # 4 keys in 4x256 cells: collisions essentially impossible -> exact
    assert got == truth


def test_cms_merge_is_additive(spark):
    d1 = _freq_df(spark, [(1, 10), (2, 5)])
    d2 = _freq_df(spark, [(1, 7), (3, 4)])
    whole = d1.unionByName(d2)
    merged = sketches.cms_merge(
        sketches.cms_build(d1, "uid", ["grp"]).unionByName(
            sketches.cms_build(d2, "uid", ["grp"])
        ),
        ["grp"],
    )
    direct = sketches.cms_build(whole, "uid", ["grp"])
    m = {(r["row"], r["col"]): r["cnt"] for r in merged.collect()}
    d = {(r["row"], r["col"]): r["cnt"] for r in direct.collect()}
    assert m == d


def test_cms_absent_key_estimates_near_zero(spark):
    df = _freq_df(spark, [(i, 2) for i in range(20)])
    cells = sketches.cms_build(df, "uid", ["grp"])
    keys = spark.createDataFrame([("g", "never-seen")], "grp string, uid string")
    est = sketches.cms_query(cells, keys, "uid", ["grp"]).collect()[0]["cms_est"]
    # min-over-4-rows of 40 counts in 256 cols: w.h.p. one row is empty
    assert est <= 2


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def _member_df(spark, ids, grp="g"):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"grp": grp, "uid": [str(i) for i in ids]})
    )


def test_bloom_no_false_negatives(spark):
    df = _member_df(spark, range(100))
    bits = sketches.bloom_build(df, "uid", ["grp"])
    probes = _member_df(spark, range(100))
    got = sketches.bloom_query(bits, probes, "uid", ["grp"]).collect()
    assert len(got) == 100
    assert all(r["bloom_member"] for r in got)


def test_bloom_fp_rate_bounded(spark):
    df = _member_df(spark, range(150))
    bits = sketches.bloom_build(df, "uid", ["grp"])
    probes = _member_df(spark, range(150, 550))  # 400 absent keys
    got = sketches.bloom_query(bits, probes, "uid", ["grp"]).collect()
    fp = sum(1 for r in got if r["bloom_member"])
    # theory: (1 - e^(-4*150/1024))^4 ~ 3.9%; bound generously at 10%
    assert fp / 400 < 0.10


def test_bloom_merge_is_or(spark):
    d1 = _member_df(spark, range(0, 40))
    d2 = _member_df(spark, range(30, 80))
    merged = sketches.bloom_merge(
        sketches.bloom_build(d1, "uid", ["grp"]).unionByName(
            sketches.bloom_build(d2, "uid", ["grp"])
        ),
        ["grp"],
    )
    direct = sketches.bloom_build(d1.unionByName(d2), "uid", ["grp"])
    m = {r["bit"] for r in merged.collect()}
    d = {r["bit"] for r in direct.collect()}
    assert m == d


def test_bloom_groups_independent(spark):
    a = _member_df(spark, range(10), grp="a")
    b = _member_df(spark, range(10, 20), grp="b")
    bits = sketches.bloom_build(a.unionByName(b), "uid", ["grp"])
    # probe group a with group b's keys: membership is per-group
    probes = _member_df(spark, range(10, 20), grp="a")
    got = sketches.bloom_query(bits, probes, "uid", ["grp"]).collect()
    fp = sum(1 for r in got if r["bloom_member"])
    assert fp <= 2  # only chance collisions, never b's actual bits


# ---------------------------------------------------------------------------
# KMV bottom-k sketch
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    df = _member_df(spark, range(20))
    est = sketches.kmv_estimate(
        sketches.kmv_sample(df, "uid", ["grp"]), ["grp"]
    ).collect()[0]
    assert est["n_sample"] == 20
    assert est["kmv_est"] == 20.0


def test_kmv_estimate_reasonable_above_k(spark):
    df = _member_df(spark, range(1000))
    est = sketches.kmv_estimate(
        sketches.kmv_sample(df, "uid", ["grp"]), ["grp"]
    ).collect()[0]
    assert est["n_sample"] == 32
    # ~1/sqrt(k-2) ≈ 18% relative error; generous deterministic bounds
    assert 400 < est["kmv_est"] < 2500


def test_kmv_duplicates_do_not_inflate(spark):
    import pandas as pd

    ids = [str(i) for i in range(40)] * 5  # heavy duplication
    df = spark.createDataFrame(pd.DataFrame({"grp": "g", "uid": ids}))
    est = sketches.kmv_estimate(
        sketches.kmv_sample(df, "uid", ["grp"]), ["grp"]
    ).collect()[0]
    single = sketches.kmv_estimate(
        sketches.kmv_sample(_member_df(spark, range(40)), "uid", ["grp"]),
        ["grp"],
    ).collect()[0]
    assert est["kmv_est"] == single["kmv_est"]


def test_kmv_merge_is_rebuild(spark):
    d1 = _member_df(spark, range(0, 300))
    d2 = _member_df(spark, range(200, 600))
    merged = sketches.kmv_merge(
        sketches.kmv_sample(d1, "uid", ["grp"]).unionByName(
            sketches.kmv_sample(d2, "uid", ["grp"])
        ),
        ["grp"],
    )
    direct = sketches.kmv_sample(d1.unionByName(d2), "uid", ["grp"])
    m = sorted(r["hv"] for r in merged.collect())
    d = sorted(r["hv"] for r in direct.collect())
    assert m == d
