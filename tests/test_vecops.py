"""vecops tests against numpy oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsengine import vecops

RNG = np.random.default_rng(7)
N, D = 40, 64
VECS = RNG.normal(size=(N, D)).astype(np.float32)


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, [float(x) for x in VECS[i]], int(i % 3)) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label long")


def _cos(a, b):
    a, b = a.astype(np.float64), b.astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_cosine_topk_matches_numpy(emb):
    q = [float(x) for x in VECS[0]]
    top = vecops.cosine_topk(emb.where(F.col("vec_id") != 0), q, k=5).toPandas()
    sims = sorted(
        ((_cos(VECS[i], VECS[0]), i) for i in range(1, N)), key=lambda t: (-t[0], t[1])
    )[:5]
    assert list(top["vec_id"]) == [i for _, i in sims]
    np.testing.assert_allclose(top["cosine_sim"], [s for s, _ in sims], atol=1e-9)


def test_self_similarity_is_one(emb):
    q = [float(x) for x in VECS[3]]
    top = vecops.cosine_topk(emb, q, k=1).toPandas()
    assert top["vec_id"].iloc[0] == 3
    assert abs(top["cosine_sim"].iloc[0] - 1.0) < 1e-9


def _bucket(v, n_bits=8, stride=13):
    b = 0
    for j in range(n_bits):
        if float(v[j]) > float(v[(j + stride) % 64]):
            b |= 1 << j
    return b


def test_lsh_topk_bucket_pruning(emb):
    q = [float(x) for x in VECS[0]]
    top = vecops.lsh_topk(emb, q, k=10).toPandas()
    qb = _bucket(VECS[0])
    # every candidate is in the query's bucket; query itself always qualifies
    assert (top["bucket"] == qb).all()
    assert 0 in set(top["vec_id"])
    expected = [i for i in range(N) if _bucket(VECS[i]) == qb]
    assert set(top["vec_id"]) <= set(expected)


def test_pairwise_topk_join(emb):
    out = vecops.pairwise_topk_join(emb, emb, k=3).toPandas()
    assert (out["left_id"] != out["right_id"]).all()
    assert out.groupby("left_id")["rank"].max().max() <= 3
    # ranks are dense from 1 per left_id
    for _, g in out.groupby("left_id"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))


def test_lsh_dimension_not_hardcoded(spark):
    """d != 64 must bucket correctly (regression: '% 64' was hardcoded and
    silently emitted NULL-comparison 0-bits for shorter vectors)."""
    d = 24
    vecs = RNG.normal(size=(12, d)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label long")
    for i in range(12):
        q = [float(x) for x in vecs[i]]
        top = vecops.lsh_topk(emb, q, k=1).toPandas()
        # the query vector itself is always in its own bucket with sim 1
        assert top["vec_id"].iloc[0] == i, f"self-lookup failed for vec {i} at d={d}"
        assert top["bucket"].iloc[0] == vecops.query_bucket(q)


def test_lsh_multiprobe_improves_recall(emb):
    q = [float(x) for x in VECS[0]]
    brute = set(vecops.cosine_topk(emb, q, k=10).toPandas()["vec_id"])
    exact = set(vecops.lsh_topk(emb, q, k=10, probe_dist=0).toPandas()["vec_id"])
    probed = set(vecops.lsh_topk(emb, q, k=10, probe_dist=1).toPandas()["vec_id"])
    qb = vecops.query_bucket(q)
    # probed candidates come only from buckets within hamming 1
    allowed = {i for i in range(N) if bin(_bucket(VECS[i]) ^ qb).count("1") <= 1}
    assert probed <= allowed
    # multi-probe recall vs brute force is at least exact-bucket recall
    assert len(probed & brute) >= len(exact & brute)


def test_pairwise_topk_bucket_cap(emb):
    capped = vecops.pairwise_topk_join(emb, emb, k=3, max_bucket=2).toPandas()
    full = vecops.pairwise_topk_join(emb, emb, k=3).toPandas()
    assert len(capped) <= len(full)
    # pairs that survive come only from right-side buckets of size <= 2
    from collections import Counter

    sizes = Counter(_bucket(VECS[i]) for i in range(N))
    ok_right = {i for i in range(N) if sizes[_bucket(VECS[i])] <= 2}
    assert set(capped["right_id"]) <= ok_right


def test_label_stats(emb):
    s = vecops.label_centroid_stats(emb).toPandas().set_index("label")
    for lbl in range(3):
        ids = [i for i in range(N) if i % 3 == lbl]
        assert s.loc[lbl, "cnt"] == len(ids)
        expect = np.mean([np.linalg.norm(VECS[i].astype(np.float64)) for i in ids])
        assert abs(s.loc[lbl, "avg_norm"] - expect) < 1e-9


def test_pairwise_topk_join_dropped_metrics(emb):
    """max_bucket capping must report what it dropped."""
    topk, dropped = vecops.pairwise_topk_join(
        emb, emb, k=3, max_bucket=2, return_dropped=True
    )
    m = dropped.collect()[0]
    capped_only = vecops.pairwise_topk_join(emb, emb, k=3, max_bucket=2)
    assert topk.count() == capped_only.count()
    # every dropped row belongs to a bucket with >2 members
    assert m["n_rows_dropped"] >= 0
    if m["n_rows_dropped"] > 0:
        assert m["n_buckets_dropped"] >= 1
        assert m["n_rows_dropped"] > 2 * m["n_buckets_dropped"]
    # no-cap variant reports explicit zeros
    _, zero = vecops.pairwise_topk_join(emb, emb, k=3, return_dropped=True)
    zm = zero.collect()[0]
    assert zm["n_buckets_dropped"] == 0 and zm["n_rows_dropped"] == 0


def test_ivf_topk_probes_subset_and_finds_neighbors(emb):
    """IVF with all lists probed == brute force; fewer probes = subset."""
    q = [float(x) for x in VECS[5]]
    full = vecops.ivf_topk(emb, q, k=5, n_centroids=8, nprobe=8).toPandas()
    brute = vecops.cosine_topk(emb, q, k=5).toPandas()
    # probing every list degenerates to exact brute-force top-k
    assert list(full["vec_id"]) == list(brute["vec_id"])
    part = vecops.ivf_topk(emb, q, k=5, n_centroids=8, nprobe=2).toPandas()
    assert len(part) == 5
    assert set(part["centroid_id"]).issubset(set(full["centroid_id"]))


def test_ivf_assign_ties_lowest_centroid(spark):
    """Equidistant vector assigns to the lowest centroid id."""
    rows = [(0, [0.0, 0.0]), (1, [2.0, 0.0]), (2, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [(0, [0.0, 0.0]), (1, [2.0, 0.0])]
    out = {r["vec_id"]: r["centroid_id"] for r in vecops.ivf_assign(df, cents).collect()}
    assert out[0] == 0 and out[1] == 1 and out[2] == 0  # tie -> centroid 0


def test_kmeans_centroids_match_numpy_twin(emb):
    """Distributed k-means|| + Lloyd must equal the single-process numpy
    twin bit-for-bit after the shared rounding discipline — init
    sampling, weighting, and every iteration are deterministic."""
    got = vecops.kmeans_centroids(
        emb, n_centroids=4, n_iter=3, init_rounds=2, seed=1
    )
    want = vecops.np_kmeans_centroids(
        list(range(N)), VECS.astype(np.float64),
        n_centroids=4, n_iter=3, init_rounds=2, seed=1,
    )
    assert [cid for cid, _ in got] == [cid for cid, _ in want]
    for (_, g), (_, w) in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-9)
    # determinism across runs
    again = vecops.kmeans_centroids(
        emb, n_centroids=4, n_iter=3, init_rounds=2, seed=1
    )
    assert again == got


def test_kmeans_centroids_improve_quantization(emb):
    """Trained centroids must not quantize worse than the lowest-id
    placeholder set (sum of rounded distances to nearest centroid)."""
    def cost(cents):
        C = np.asarray([c for _, c in cents])
        X = VECS.astype(np.float64)
        d = np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(2))
        return float(np.round(d, 6).min(1).sum())

    trained = vecops.kmeans_centroids(
        emb, n_centroids=4, n_iter=3, init_rounds=2, seed=1
    )
    naive = vecops.ivf_centroids(emb, 4)
    assert cost(trained) <= cost(naive)


def test_ivf_topk_with_trained_centroids(emb):
    """ivf_topk accepts precomputed (trained) centroids; probing every
    trained list degenerates to exact brute force."""
    q = [float(x) for x in VECS[5]]
    cents = vecops.kmeans_centroids(
        emb, n_centroids=4, n_iter=2, init_rounds=2, seed=1
    )
    full = vecops.ivf_topk(emb, q, k=5, nprobe=4, centroids=cents).toPandas()
    brute = vecops.cosine_topk(emb, q, k=5).toPandas()
    assert list(full["vec_id"]) == list(brute["vec_id"])


def test_kmeans_empty_and_degenerate(spark):
    """Empty input -> []; corpus with fewer distinct points than k pads
    deterministically and still returns k centroid slots."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert vecops.kmeans_centroids(empty, n_centroids=3) == []
    rows = [(i, [float(i % 2), 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = vecops.kmeans_centroids(df, n_centroids=4, n_iter=2)
    assert len(cents) == 4


# ---------------------------------------------------------------------------
# OPQ (no SQL oracle — these numpy-twin tests ARE the correctness gate,
# disclosed in vec_opq_topk's docstring)
# ---------------------------------------------------------------------------

OPQ_D = 8
OPQ_N = 400


def _aniso_vecs(seed=9):
    rng = np.random.default_rng(seed)
    scales = np.array([4, 2.5, 1.5, 1, 0.6, 0.3, 0.15, 0.05])
    A = rng.normal(size=(OPQ_D, OPQ_D)) * scales
    X = rng.normal(size=(OPQ_N, OPQ_D)) @ A.T
    return X, rng


@pytest.fixture(scope="module")
def aniso(spark):
    X, _ = _aniso_vecs()
    rows = [(i, [float(x) for x in X[i]]) for i in range(OPQ_N)]
    return X, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _pq_topk_np(X, q, m_sub, n_codes=16, k=10):
    """numpy twin of vecops.pq_topk: codebooks = first n_codes rows'
    subvectors, encode by round(dist,6)-argmin (lowest cid ties), ADC
    sum, rank by round(adc,6) then id."""
    n, d = X.shape
    dsub = d // m_sub
    cb = X[:n_codes]
    adc = np.zeros(n)
    for j in range(m_sub):
        sl = slice(j * dsub, (j + 1) * dsub)
        dd = np.round(((X[:, None, sl] - cb[None, :, sl]) ** 2).sum(axis=2), 6)
        codes = np.argmin(dd, axis=1)
        lut = ((q[sl][None, :] - cb[:, sl]) ** 2).sum(axis=1)
        adc += lut[codes]
    order = np.lexsort((np.arange(n), np.round(adc, 6)))
    return order[:k]


def _exact_topk_np(X, q, k=10):
    return np.lexsort((np.arange(len(X)), ((X - q) ** 2).sum(axis=1)))[:k]


def test_opq_rotation_orthogonal(aniso):
    _, df = aniso
    R = np.asarray(vecops.opq_rotation(df, m_sub=2, n_train=256))
    assert R.shape == (OPQ_D, OPQ_D)
    assert np.abs(R @ R.T - np.eye(OPQ_D)).max() < 1e-9
    assert abs(abs(np.linalg.det(R)) - 1.0) < 1e-9


def test_opq_topk_matches_numpy_twin(aniso):
    X, df = aniso
    _, rng = _aniso_vecs()
    q = X[37] + rng.normal(size=OPQ_D) * 0.05
    got = vecops.opq_topk(
        df, [float(v) for v in q], k=10, n_codes=16, m_sub=2, n_train=256
    ).collect()
    R = np.asarray(vecops.opq_rotation(df, m_sub=2, n_train=256))
    Xr, qr = X @ R.T, R @ q
    want = _pq_topk_np(Xr, qr, m_sub=2)
    assert [r["vec_id"] for r in got] == [int(i) for i in want]


def test_opq_recall_beats_pq_on_anisotropic(aniso):
    """The OPQ paper's claim as data: mean recall@10 over 20 probe
    queries on an anisotropic set, rotated PQ >= plain PQ (numpy twins
    fed by the REAL opq_rotation from the Spark frame)."""
    X, df = aniso
    R = np.asarray(vecops.opq_rotation(df, m_sub=2, n_train=256))
    Xr = X @ R.T
    _, rng = _aniso_vecs()
    rec_pq = rec_opq = 0.0
    for qi in range(20, 40):
        q = X[qi] + rng.normal(size=OPQ_D) * 0.05
        truth = set(_exact_topk_np(X, q).tolist())
        rec_pq += len(set(_pq_topk_np(X, q, 2).tolist()) & truth)
        rec_opq += len(set(_pq_topk_np(Xr, R @ q, 2).tolist()) & truth)
    assert rec_opq >= rec_pq, (rec_opq, rec_pq)
    assert rec_opq / (20 * 10) > 0.5  # sane absolute floor


def test_opq_rotate_expr_matches_udf_path(aniso):
    """The literal-SQL rotation (opq_rotate_expr) and the UDF matmul
    agree to float tolerance — the expr form stays available for
    engines/plans that prefer pure SQL."""
    X, df = aniso
    R = vecops.opq_rotation(df, m_sub=2, n_train=256)
    rot_sql = (
        df.select("vec_id", F.col("embedding").alias("_dv"))
        .selectExpr("vec_id", f"{vecops.opq_rotate_expr(R)} AS r")
        .orderBy("vec_id")
        .collect()
    )
    Rm = np.asarray(R)
    for row in rot_sql[:50]:
        want = Rm @ X[int(row["vec_id"])]
        assert np.abs(np.array(row["r"]) - want).max() < 1e-9
