"""Embedding similarity search over `array<float>` columns.

No reference analog (rewemo has no vectors); the nearest relative is its
k-NN inverse-distance spatial join (`ncep/timeseries_tools.py:40-76`) —
same find-nearest-under-a-metric shape, generalized to cosine over
embeddings.

Two paths:
- ``cosine_topk`` — brute-force baseline: one pass, pure Column exprs
  (zip_with dot product), broadcast query vector. O(N·d) scan, the
  correctness oracle.
- ``lsh_topk`` — scale path: deterministic rank-comparison LSH buckets
  (bit j = e[p_j] > e[q_j]) prune candidates to one bucket before scoring.
  The bucket expression is plain SQL → oracle-checkable, unlike
  random-hyperplane LSH whose planes live outside the query. At 100 TB,
  bucket the table ON WRITE (partition by bucket) so a query touches one
  partition; multi-probe = visit Hamming-adjacent buckets.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string annotations
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    The query vector is a constant-folded array literal (broadcast by the
    plan, no join); scoring is whole-stage-codegen'd. Deterministic ties
    broken by id."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        id_col,
        cosine(_as_double(F.col(vec_col)), q).alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


def rank_lsh_bucket(
    vec: Column, n_bits: int = 8, stride: int = 13, d: int = 64
) -> Column:
    """Deterministic rank-comparison LSH: bit j = vec[j] > vec[(j+stride) % d].

    A comparison-based hash family (order-statistics LSH): cheap, scale- and
    shift-invariant per pair, and expressible in ANSI SQL. ``d`` MUST be the
    actual vector length — an out-of-range element_at would yield NULL
    comparisons and silent 0-bits (wrong buckets), so callers that know the
    data pass the real dimension."""
    acc = F.lit(0)
    for j in range(n_bits):
        bit = F.when(
            F.element_at(vec, j + 1) > F.element_at(vec, ((j + stride) % d) + 1),
            F.lit(1),
        ).otherwise(F.lit(0))
        acc = acc + F.shiftleft(bit, j)
    return acc


def query_bucket(query_vec: list[float], n_bits: int = 8, stride: int = 13) -> int:
    """Driver-side twin of rank_lsh_bucket for a literal query vector —
    guaranteed to use the same (stride, d) as the column expression."""
    d = len(query_vec)
    if d <= n_bits:
        raise ValueError(f"query dim {d} too small for {n_bits} LSH bits")
    b = 0
    for j in range(n_bits):
        if query_vec[j] > query_vec[(j + stride) % d]:
            b |= 1 << j
    return b


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 5,
    n_bits: int = 8,
    stride: int = 13,
    probe_dist: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-pruned cosine top-k: score only vectors in (or near) the query's
    bucket. The dimension is derived from the query vector, and the Python
    qbucket uses the SAME (stride, d) as the Spark column expression.

    ``probe_dist`` enables multi-probe: candidates from every bucket within
    Hamming distance ≤ probe_dist of the query bucket. probe_dist=0 scans
    1/2^n_bits of the data; probe_dist=1 adds the n_bits adjacent buckets —
    the standard recall fix for query vectors near a comparison boundary.
    The bucket predicate stays a pushable column filter either way: with
    the table written partitioned-by-bucket this is partition pruning."""
    d = len(query_vec)
    dv = _as_double(F.col(vec_col))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qbucket = query_bucket(query_vec, n_bits, stride)
    bucket = F.col("bucket")
    if probe_dist == 0:
        pred = bucket == F.lit(qbucket)
    else:
        pred = F.bit_count(bucket.bitwiseXOR(F.lit(qbucket))) <= probe_dist
    return (
        embeddings.select(
            id_col, dv.alias("_v"), rank_lsh_bucket(dv, n_bits, stride, d).alias("bucket")
        )
        .where(pred)
        .select(id_col, "bucket", cosine(F.col("_v"), q).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def pairwise_topk_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    stride: int = 13,
    d: int = 64,
    max_bucket: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_dropped: bool = False,
) -> DataFrame:
    """All-pairs ANN join: bucket both sides, join on bucket, top-k
    neighbors per left row by cosine. The scalable batch form of lsh_topk
    (query set = a whole table). Shuffle key = bucket (2^n_bits salted
    groups). ``max_bucket`` caps the RIGHT side per bucket (a B-row bucket
    costs B² scores); with ``return_dropped=True`` the result is
    (topk, dropped_metrics) where dropped_metrics is a 1-row DataFrame
    (n_buckets_dropped, n_rows_dropped) — left rows whose true neighbors
    lived in a capped bucket get worse-than-k results, and a production
    run must see that count rather than infer it from a histogram."""
    from pyspark.sql import Window as W

    from tsengine.textops import bucket_cap

    lb = left.select(
        F.col(id_col).alias("left_id"),
        _as_double(F.col(vec_col)).alias("lv"),
    ).withColumn("bucket", rank_lsh_bucket(F.col("lv"), n_bits, stride, d))
    rb = right.select(
        F.col(id_col).alias("right_id"),
        _as_double(F.col(vec_col)).alias("rv"),
    ).withColumn("bucket", rank_lsh_bucket(F.col("rv"), n_bits, stride, d))
    dropped = None
    if max_bucket is not None:
        rb, dropped = bucket_cap(rb, ["bucket"], max_bucket)
    scored = (
        lb.join(rb, "bucket")
        .where(F.col("left_id") != F.col("right_id"))
        .select("left_id", "right_id", cosine(F.col("lv"), F.col("rv")).alias("cosine_sim"))
    )
    w = W.partitionBy("left_id").orderBy(F.col("cosine_sim").desc(), F.col("right_id"))
    topk = scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    if return_dropped:
        if dropped is None:  # no cap → nothing can be dropped
            dropped = left.sparkSession.createDataFrame(
                [(0, 0)], "n_buckets_dropped long, n_rows_dropped long"
            )
        return topk, dropped
    return topk


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic centroid set: the ``n_centroids`` lowest-id vectors
    (a seeded sample — production would run k-means/k-means||, but the
    IVF probe/assign plumbing is identical whatever produces the
    centroids, and a deterministic set keeps the whole path
    oracle-checkable). Dimension-sized driver collect."""
    rows = embeddings.orderBy(id_col).limit(n_centroids).collect()
    return [(int(r[id_col]), [float(x) for x in r[vec_col]]) for r in rows]


def _l2_to(vec: Column, c: list[float]) -> Column:
    carr = F.array(*[F.lit(float(x)) for x in c])
    return F.sqrt(
        F.aggregate(
            F.zip_with(vec, carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )


def nearest_centroid_expr(
    dv: Column,
    centroids: list[tuple[int, list[float]]],
    dist_round: int | None = None,
) -> Column:
    """argmin over the centroid list as array_min over (dist, cid)
    structs: linear-size expression with lexicographic tie-break on the
    lowest centroid id. (A fold of F.when updates was tried first and is
    unusable: each level embeds the previous tree twice -> a
    2^n_centroids-node expression that hangs the analyzer.)

    ``dist_round`` rounds each distance before ranking — cross-engine /
    cross-twin determinism: two engines summing squares in different
    orders agree after rounding, and a round-induced tie breaks by cid
    identically on both."""
    def d(c: list[float]) -> Column:
        raw = _l2_to(dv, c)
        return F.round(raw, dist_round) if dist_round is not None else raw

    pairs = F.array(*[
        F.struct(d(c).alias("d"), F.lit(int(cid)).alias("cid"))
        for cid, c in centroids
    ])
    return F.array_min(pairs)["cid"]


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_round: int | None = None,
) -> DataFrame:
    """IVF list assignment: each vector gets the id of its L2-nearest
    centroid (ties → lowest centroid id) — pure Column exprs, no join,
    no shuffle; at 100 TB this runs at scan speed and the table is
    written partitioned by ``centroid_id`` so probes prune partitions."""
    dv = _as_double(F.col(vec_col))
    return embeddings.withColumn(
        "centroid_id", nearest_centroid_expr(dv, centroids, dist_round)
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: score only vectors whose inverted list
    (nearest centroid) is among the ``nprobe`` centroids closest to the
    query — the centroid-bucketed sibling of ``lsh_topk``. The probe set
    is computed driver-side from the centroid list; the candidate filter
    is a pushable IN-predicate on ``centroid_id`` (partition pruning when
    the table is laid out by centroid). Pass ``centroids`` (e.g. from
    ``kmeans_centroids``) for production-quality lists; the default
    lowest-id set keeps the path oracle-checkable."""
    import numpy as np

    # `is not None`, not `or`: an empty centroid list from a degenerate
    # training run must surface as an error downstream, not silently fall
    # back to untrained lowest-id centroids
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(embeddings, n_centroids, id_col, vec_col)
    )
    qv = np.asarray(query_vec, dtype=np.float64)
    order = sorted(
        cents, key=lambda c: (float(np.linalg.norm(qv - np.asarray(c[1]))), c[0])
    )
    probe = [cid for cid, _ in order[:nprobe]]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    return (
        assigned.where(F.col("centroid_id").isin(probe))
        .select(
            id_col,
            "centroid_id",
            cosine(_as_double(F.col(vec_col)), q).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


# --------------------------------------------------------------------------
# k-means|| centroid training (the production IVF centroid builder)
# --------------------------------------------------------------------------
#
# Scalable k-means++ (k-means||, Bahmani et al., VLDB 2012) followed by
# distributed Lloyd iterations. Design constraints honored throughout:
# - DETERMINISTIC: the init sampling uses a replayable integer hash of the
#   vector id (not rand()), every distance/mean is rounded to `round_dec`
#   on every engine/twin, and all argmin ties break on the lowest id —
#   two runs (or Spark vs the numpy twin) produce identical centroids.
# - SCALE SHAPE: each init round / Lloyd iteration is ONE scan of the
#   (persisted, projected) table + a k×d-sized partial aggregate — the
#   shuffle carries k rows of d partial sums, never the data. Only
#   centroid-sized sets (≤ oversample·rounds candidates, k centroids)
#   ever reach the driver.

_HASH_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
_HASH_MUL = 1_315_423_911


def _hash_u01(id_expr: Column, salt: int) -> Column:
    """Deterministic uniform-ish [0,1) from an integer id — replayable in
    numpy/SQL with plain int64 arithmetic (operands bounded ~1e15, no
    overflow on any engine)."""
    h = F.pmod(
        F.pmod(id_expr.cast("long"), F.lit(1_000_003)) * F.lit(_HASH_MUL)
        + F.lit(int(salt)),
        F.lit(_HASH_MOD),
    )
    return h.cast("double") / F.lit(float(_HASH_MOD))


def _np_hash_u01(ids, salt: int):
    import numpy as np

    ids = np.asarray(ids, dtype=np.int64)
    return ((ids % 1_000_003) * _HASH_MUL + int(salt)) % _HASH_MOD / float(_HASH_MOD)


def _min_dist2_expr(dv: Column, centers: list[list[float]]) -> Column:
    """min over centers of squared L2 distance (no sqrt — the k-means||
    sampling weight). Itself unrounded; the CONSUMER rounds the derived
    sampling threshold ell·d2/tot to 9 dp before comparing against the
    hash uniform, because tot's summation-order error is independent of
    an individual d2's and an unrounded strict compare could flip a
    candidate between this path and the numpy twin."""
    def d2(c: list[float]) -> Column:
        carr = F.array(*[F.lit(float(x)) for x in c])
        return F.aggregate(
            F.zip_with(dv, carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    return F.array_min(F.array(*[d2(c) for c in centers]))


def _np_weighted_lloyd(cand, weights, k: int, iters: int, round_dec: int):
    """Driver-side weighted k-means over the (small) k-means|| candidate
    set: init = the k heaviest candidates (ties by candidate order, i.e.
    discovery order — deterministic), then weighted Lloyd with the same
    rounding discipline as the distributed phase."""
    import numpy as np

    cand = np.asarray(cand, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    order = np.lexsort((np.arange(len(cand)), -weights))
    centers = cand[np.sort(order[:k])].copy()
    if len(centers) < k:
        # fewer candidates than k (corpus with < k distinct vectors):
        # pad by cycling existing centers so the k-slot contract holds —
        # duplicate centroids are harmless downstream (argmin ties break
        # to the lowest centroid id, so duplicates just sit empty)
        pad = [centers[i % len(centers)] for i in range(k - len(centers))]
        centers = np.vstack([centers, pad])
    for _ in range(iters):
        d = np.linalg.norm(cand[:, None, :] - centers[None, :, :], axis=2)
        assign = np.argmin(np.round(d, round_dec), axis=1)
        new = centers.copy()
        for j in range(len(centers)):
            m = assign == j
            if weights[m].sum() > 0:
                new[j] = np.round(
                    (cand[m] * weights[m, None]).sum(0) / weights[m].sum(),
                    round_dec,
                )
        if np.array_equal(new, centers):
            break
        centers = new
    return [list(map(float, c)) for c in centers]


def kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    n_iter: int = 4,
    init_rounds: int = 3,
    oversample: int | None = None,
    seed: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dec: int = 6,
) -> list[tuple[int, list[float]]]:
    """k-means|| init + distributed Lloyd; returns [(0..k-1, center)] for
    ``ivf_assign`` / ``ivf_topk``. See the block comment above for the
    determinism and scale contracts; per-dim means aggregate as d scalar
    partial sums (map-side combine, k×d bytes shuffled per iteration)."""
    k = int(n_centroids)
    ell = oversample or 2 * k
    emb = embeddings.select(
        F.col(id_col).cast("long").alias("_id"),
        _as_double(F.col(vec_col)).alias("_v"),
    ).persist()
    try:
        first = emb.orderBy("_id").limit(1).collect()
        if not first:
            return []
        d = len(first[0]["_v"])
        centers: list[list[float]] = [[float(x) for x in first[0]["_v"]]]
        for r in range(init_rounds):
            d2 = _min_dist2_expr(F.col("_v"), centers)
            tot = emb.agg(F.sum(d2)).collect()[0][0]
            if not tot or tot <= 0:
                break  # every point sits on a center already
            u = _hash_u01(F.col("_id"), seed * 7_919 + r)
            # the threshold ell·d2/tot is rounded (9 dp) before the
            # strict compare: tot and d2 carry summation-order ulps that
            # differ between this path and the numpy twin, and an
            # unrounded `u·tot < ell·d2` could flip a candidate's
            # inclusion on one side only — after which the entire
            # centroid set diverges. u's granularity is ~1e-15, so the
            # 9-dp round dominates any ulp noise on both sides.
            thr = F.round(F.lit(float(ell)) * d2 / F.lit(float(tot)), 9)
            cand = emb.where(u < thr).orderBy("_id").collect()
            centers.extend([[float(x) for x in row["_v"]] for row in cand])
        if len(centers) <= k:
            # degenerate corpus (fewer distinct regions than k): pad from
            # lowest-id vectors, preserving determinism
            pad = emb.orderBy("_id").limit(k).collect()
            seen = {tuple(c) for c in centers}
            for row in pad:
                v = [float(x) for x in row["_v"]]
                if tuple(v) not in seen:
                    centers.append(v)
                    seen.add(tuple(v))
                if len(centers) >= k:
                    break
        # weight candidates by their basin size (one scan), then reduce
        # to k centers driver-side — the candidate set is O(ell·rounds)
        enum = [(i, c) for i, c in enumerate(centers)]
        wrows = (
            emb.withColumn(
                "_c", nearest_centroid_expr(F.col("_v"), enum, round_dec)
            )
            .groupBy("_c")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        wmap = {r["_c"]: r["n"] for r in wrows}
        weights = [wmap.get(i, 0) for i in range(len(centers))]
        centers_k = _np_weighted_lloyd(centers, weights, k, 8, round_dec)

        cents = [(i, c) for i, c in enumerate(centers_k)]
        mean_aggs = [
            F.round(F.avg(F.element_at(F.col("_v"), i + 1)), round_dec).alias(f"m{i}")
            for i in range(d)
        ]
        for _ in range(n_iter):
            rows = (
                emb.withColumn(
                    "_c", nearest_centroid_expr(F.col("_v"), cents, round_dec)
                )
                .groupBy("_c")
                .agg(*mean_aggs)
                .collect()
            )
            got = {r["_c"]: [float(r[f"m{i}"]) for i in range(d)] for r in rows}
            new = [(i, got.get(i, c)) for i, c in cents]  # empty list keeps center
            if new == cents:
                break
            cents = new
        return cents
    finally:
        emb.unpersist()


def np_kmeans_centroids(
    ids,
    vecs,
    n_centroids: int = 8,
    n_iter: int = 4,
    init_rounds: int = 3,
    oversample: int | None = None,
    seed: int = 1,
    round_dec: int = 6,
) -> list[tuple[int, list[float]]]:
    """Single-process numpy twin of ``kmeans_centroids`` — same hash
    sampling, same rounding, same tie-breaks; the distributed run must
    match it bit-for-bit (after round_dec) on identical input."""
    import numpy as np

    ids = np.asarray(ids, dtype=np.int64)
    X = np.asarray(vecs, dtype=np.float64)
    if len(ids) == 0:
        return []
    order = np.argsort(ids, kind="stable")
    ids, X = ids[order], X[order]
    k = int(n_centroids)
    ell = oversample or 2 * k
    centers = [list(map(float, X[0]))]
    for r in range(init_rounds):
        C = np.asarray(centers)
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2).min(1)
        tot = d2.sum()
        if tot <= 0:
            break
        u = _np_hash_u01(ids, seed * 7_919 + r)
        # mirrors the distributed path's 9-dp-rounded threshold compare
        mask = u < np.round(ell * d2 / tot, 9)
        centers.extend([list(map(float, v)) for v in X[mask]])
    if len(centers) <= k:
        seen = {tuple(c) for c in centers}
        for v in X[:k]:
            t = tuple(map(float, v))
            if t not in seen:
                centers.append(list(t))
                seen.add(t)
            if len(centers) >= k:
                break
    C = np.asarray(centers)
    dists = np.round(
        np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(2)), round_dec
    )
    assign = np.argmin(dists, axis=1)
    weights = np.bincount(assign, minlength=len(centers)).astype(float)
    centers_k = _np_weighted_lloyd(centers, weights, k, 8, round_dec)
    cents = [(i, c) for i, c in enumerate(centers_k)]
    for _ in range(n_iter):
        C = np.asarray([c for _, c in cents])
        dists = np.round(
            np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(2)), round_dec
        )
        assign = np.argmin(dists, axis=1)
        new = []
        for i, c in cents:
            m = assign == i
            if m.any():
                new.append((i, [float(x) for x in np.round(X[m].mean(0), round_dec)]))
            else:
                new.append((i, c))
        if new == cents:
            break
        cents = new
    return cents


def label_centroid_stats(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label count + mean L2 norm — the cheap per-cluster health stats
    (agg over array exprs, JVM-side)."""
    dv = _as_double(F.col(vec_col))
    return (
        embeddings.select(label_col, norm(dv).alias("_n"))
        .groupBy(label_col)
        .agg(F.count("*").alias("cnt"), F.avg("_n").alias("avg_norm"))
    )


# --------------------------------------------------------------------------
# Product quantization (Jégou, Douze & Schmid 2011, "Product Quantization
# for Nearest Neighbor Search") — the compressed-domain ANN scale path:
# encode each vector as m_sub small codes, answer queries with asymmetric
# distance computation (ADC) against a per-query lookup table, never
# touching the raw vectors at query time.
# --------------------------------------------------------------------------

def pq_codebooks(
    embeddings: DataFrame,
    n_codes: int = 16,
    m_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Deterministic PQ codebooks: subspace j's codes are the j-th
    sub-vectors of the first ``n_codes`` vectors in ``id_col`` order —
    the same seeded-deterministic convention as ``ivf_centroids`` (a
    trained variant would swap in ``kmeans_centroids`` per subspace; the
    encode/ADC machinery below is identical either way). Driver-side
    collect of ``n_codes`` rows — O(KB), broadcast as literals."""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_codes)
        .collect()
    )
    dim = len(rows[0][vec_col])
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    return [
        [
            (c, [float(x) for x in row[vec_col][j * dsub:(j + 1) * dsub]])
            for c, row in enumerate(rows)
        ]
        for j in range(m_sub)
    ]


def _dlit(v: float) -> str:
    """A double literal in Spark-SQL text: shortest round-trip repr (the
    JVM parses it back to the bitwise-identical double); plain decimals
    need the D suffix or Spark types them DECIMAL, exponent forms are
    already DOUBLE."""
    s = repr(float(v))
    return s if ("e" in s or "E" in s) else s + "D"


def _sub_l2sq_sql(dv: str, code_vec: list[float], off: int) -> str:
    """Squared L2 between a sub-vector slice and a literal code, as an
    UNROLLED left-associated chain — the one association order mirrored
    verbatim by the SQL oracle and by the driver-side Python lut, so all
    three produce bitwise-identical doubles. Emitted as SQL TEXT, not
    stacked Column objects: the 16-code × 8-term trees cost thousands of
    py4j round trips to build (~10 s/plan measured) but parse JVM-side
    in milliseconds."""
    return " + ".join(
        f"({dv}[{off + i}] - {_dlit(cv)}) * ({dv}[{off + i}] - {_dlit(cv)})"
        for i, cv in enumerate(code_vec)
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_round: int = 6,
) -> DataFrame:
    """PQ encoding at scan speed: per subspace, argmin over the code list
    as ``array_min`` over (rounded dist, cid) structs — pure scalar
    exprs, no join, no shuffle (the ``nearest_centroid_expr`` shape, one
    per subspace). At 100 TB the output is the stored index: m_sub
    small ints per vector (here 8 × 4 bits of information ≈ 64× smaller
    than the raw float32[64]), written once, scanned by every query."""
    dsub = len(codebooks[0][0][1])
    cols = []
    for j, cb in enumerate(codebooks):
        structs = ", ".join(
            f"named_struct('d', round({_sub_l2sq_sql('_dv', c, j * dsub)},"
            f" {dist_round}), 'cid', {int(cid)})"
            for cid, c in cb
        )
        cols.append(f"array_min(array({structs}))['cid'] AS code_{j}")
    return embeddings.select(
        id_col, F.col(vec_col).cast("array<double>").alias("_dv")
    ).selectExpr(id_col, *cols)


def pq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_codes: int = 16,
    m_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ top-k by asymmetric distance: encode the base vectors (or read
    the stored codes), build the per-query lut ``qd[j][c]`` driver-side
    (m_sub·n_codes doubles, sequential left-to-right accumulation — the
    same association order as ``_sub_l2sq``), then ADC is a chain of
    ``element_at`` lookups summed j-ascending. The query never touches a
    raw vector: at 100 TB the scan reads only the code columns
    (column-pruned), each row costs m_sub array lookups + adds, and the
    top-k is one ``orderBy ... limit`` (map-side partial top-k). Ranking
    uses the 6-dp-rounded distance with a vec_id tie-break — the
    cross-engine determinism rule every distance rank here follows."""
    cbs = pq_codebooks(embeddings, n_codes, m_sub, id_col, vec_col)
    enc = pq_encode(embeddings, cbs, id_col, vec_col)
    dsub = len(query_vec) // m_sub
    terms = []
    for j, cb in enumerate(cbs):
        lut = []
        for _cid, c in cb:
            acc = None
            for i, cv in enumerate(c):
                x = float(query_vec[j * dsub + i]) - cv
                t = x * x
                acc = t if acc is None else acc + t
            lut.append(acc)
        arr = ", ".join(_dlit(v) for v in lut)
        terms.append(f"element_at(array({arr}), code_{j} + 1)")
    # j-ascending left-associated sum, as SQL text for the same
    # build-cost reason as _sub_l2sq_sql
    adc = F.expr(" + ".join(terms))
    return (
        enc.withColumn("_adc", adc)
        .orderBy(F.round(F.col("_adc"), 6).asc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            F.concat_ws(
                "-", *[F.col(f"code_{j}").cast("string") for j in range(m_sub)]
            ).alias("pq_code"),
            F.round(F.col("_adc") + F.lit(5e-10), 6).alias("pq_dist"),
        )
    )


# --------------------------------------------------------------------------
# IVF-PQ (IVFADC; Jégou, Douze & Schmid 2011 §IV) — the billion-vector
# composition: a coarse quantizer prunes the scan to nprobe inverted
# lists, and within each list vectors are PQ-encoded as RESIDUALS from
# their coarse centroid, so a query pays m_sub table lookups per
# candidate against a per-(probe, subspace) lookup table.
# --------------------------------------------------------------------------

def _l2_py(a: list[float], b: list[float]) -> float:
    """Left-associated L2 in plain Python — the driver-side mirror of
    ``_l2_to``'s zip_with/aggregate fold (same IEEE association order;
    numpy's pairwise summation would NOT match near ties)."""
    acc = 0.0
    first = True
    for x, y in zip(a, b):
        t = (float(x) - float(y)) * (float(x) - float(y))
        acc = t if first else acc + t
        first = False
    return acc ** 0.5


def _res_chain_sql(
    dv: str, cc: str, code_res: list[float], off: int, dsub: int
) -> str:
    """Squared L2 between a row's RESIDUAL sub-vector ((dv[i] - cc[i]),
    computed in-expression) and a literal residual code, unrolled
    left-associated — one association order shared with the Python lut
    builder and the SQL oracle."""
    return " + ".join(
        f"(({dv}[{off + i}] - {cc}[{off + i}]) - {_dlit(code_res[off + i])})"
        f" * (({dv}[{off + i}] - {cc}[{off + i}]) - {_dlit(code_res[off + i])})"
        for i in range(dsub)
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    n_codes: int = 16,
    m_sub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    dist_round: int = 6,
) -> DataFrame:
    """IVF-PQ top-k: probe the ``nprobe`` coarse lists nearest the query,
    PQ-encode each candidate's residual (vector − its coarse centroid) at
    scan speed, and rank by asymmetric distance against per-(probe,
    subspace) lookup tables built driver-side from the query's OWN
    residual to each probed centroid. The 100 TB shape: the table is
    written partitioned by ``centroid_id`` with the m_sub code columns
    stored, so a query prunes to nprobe partitions, reads only codes,
    and pays m_sub map+array lookups per row — never a raw vector.

    Codebooks are the residuals of the first ``n_codes`` vectors in
    ``id_col`` order (the deterministic, oracle-checkable convention of
    ``ivf_centroids``/``pq_codebooks``; production swaps in per-subspace
    k-means residuals through the identical machinery). Every distance
    is the one left-associated chain the SQL oracle replays, rounded at
    ``dist_round`` with lowest-id tie-breaks."""
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(embeddings, n_centroids, id_col, vec_col)
    )
    cmap = {int(cid): [float(x) for x in v] for cid, v in cents}
    probe = [
        cid for cid, _ in
        sorted(cents, key=lambda c: (_l2_py(query_vec, c[1]), int(c[0])))[:nprobe]
    ]

    assigned = ivf_assign(embeddings, cents, id_col, vec_col)

    # residual codebook: first n_codes vectors, each minus ITS OWN coarse
    # centroid (Spark computes the assignment; the subtraction is exact
    # IEEE, identical on every engine). The assignment is row-local, so
    # it runs AFTER the id-ordered limit: the old order (assign → limit)
    # evaluated the full nearest-centroid expression battery — |C|
    # unrolled 64-term chains + |C| BigDecimal rounds per row — over the
    # whole table just to keep 16 rows (measured ~1.5 s of the key at
    # bench scale); same rows, bitwise-same assignment either way.
    cb_rows = ivf_assign(
        embeddings.orderBy(id_col).limit(n_codes), cents, id_col, vec_col
    ).orderBy(id_col).collect()
    dim = len(cb_rows[0][vec_col])
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    rescb: list[tuple[int, list[float]]] = []
    for ci, r in enumerate(cb_rows):
        cc = cmap[int(r["centroid_id"])]
        rescb.append(
            (ci, [float(r[vec_col][i]) - cc[i] for i in range(dim)])
        )

    # probed rows only (the partition-pruned scan), residual encode at
    # scan speed — SQL text for the same plan-build-cost reason as
    # _sub_l2sq_sql
    centmap = "map(" + ", ".join(
        f"{int(p)}, array({', '.join(_dlit(x) for x in cmap[int(p)])})"
        for p in probe
    ) + ")"
    base = (
        assigned.where(F.col("centroid_id").isin([int(p) for p in probe]))
        .select(
            id_col, "centroid_id",
            F.col(vec_col).cast("array<double>").alias("_dv"),
        )
        .withColumn("_cc", F.expr(f"{centmap}[centroid_id]"))
    )
    code_cols = []
    for j in range(m_sub):
        structs = ", ".join(
            f"named_struct('d', round("
            f"{_res_chain_sql('_dv', '_cc', rv, j * dsub, dsub)},"
            f" {dist_round}), 'cid', {ci})"
            for ci, rv in rescb
        )
        code_cols.append(f"array_min(array({structs}))['cid'] AS code_{j}")
    enc = base.selectExpr(id_col, "centroid_id", *code_cols)

    # per-(probe, subspace) ADC luts from the query residual, Python
    # left-to-right accumulation — the shared association order
    terms = []
    for j in range(m_sub):
        entries = []
        for p in probe:
            cc = cmap[int(p)]
            lut = []
            for _ci, rv in rescb:
                acc = 0.0
                first = True
                for i in range(j * dsub, (j + 1) * dsub):
                    x = (float(query_vec[i]) - cc[i]) - rv[i]
                    t = x * x
                    acc = t if first else acc + t
                    first = False
                lut.append(acc)
            entries.append(
                f"{int(p)}, array({', '.join(_dlit(v) for v in lut)})"
            )
        terms.append(
            f"element_at(map({', '.join(entries)})[centroid_id],"
            f" code_{j} + 1)"
        )
    adc = F.expr(" + ".join(terms))
    return (
        enc.withColumn("_adc", adc)
        .orderBy(F.round(F.col("_adc"), 6).asc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            F.col("centroid_id").cast("long").alias("centroid_id"),
            F.concat_ws(
                "-", *[F.col(f"code_{j}").cast("string") for j in range(m_sub)]
            ).alias("pq_code"),
            F.round(F.col("_adc") + F.lit(5e-10), 6).alias("pq_dist"),
        )
    )


# --------------------------------------------------------------------------
# OPQ — Optimized Product Quantization (Ge, He, Ke & Sun, CVPR 2013 /
# TPAMI 2014): learn an orthogonal rotation R so the PQ subspaces are
# decorrelated and carry balanced variance, then run the UNCHANGED PQ
# machinery on R·x. This implements the parametric variant (§4 of the
# paper, "OPQ-P"): eigendecompose the data covariance and allocate
# eigen-directions to subspaces balancing the per-subspace variance
# product — closed-form, deterministic, no alternating minimization.
#
# Oracle status (disclosed, same precedent as kmeans||'s driver-bounded
# collect): the rotation needs an eigendecomposition, which ANSI SQL
# cannot express, so `vec_opq_topk` registers WITHOUT a value oracle
# (the driver records the weaker rows-only check) and correctness rides
# on numpy-twin unit tests: R is provably orthogonal (R·Rᵀ = I to 1e-9),
# rotation preserves exact ranks under brute-force distance, and
# recall@k on an anisotropic set is >= plain PQ's (the paper's claim,
# asserted as data in tests/test_vecops.py).
# --------------------------------------------------------------------------

def opq_rotation(
    embeddings: DataFrame,
    m_sub: int = 8,
    n_train: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Parametric OPQ rotation from a bounded training sample: collect
    the first ``n_train`` vectors in ``id_col`` order (dimension-sized
    driver collect, O(n_train·d) — the same bounded-collect contract as
    ``kmeans_centroids``' ℓ·rounds candidates), eigendecompose their
    covariance, and greedily assign eigen-directions (descending
    eigenvalue) to the subspace with the smallest current log-variance
    product (the paper's balanced eigenvalue allocation). Returns R as
    row-major lists: row i of R is the i-th rotated coordinate's weights;
    subspace j owns rotated coordinates [j·dsub, (j+1)·dsub)."""
    import math

    import numpy as np

    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_train)
        .collect()
    )
    X = np.array(
        [[float(x) for x in r[vec_col]] for r in rows], dtype="float64"
    )
    d = X.shape[1]
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    dsub = d // m_sub
    Xc = X - X.mean(axis=0)
    C = (Xc.T @ Xc) / float(len(Xc))
    w, V = np.linalg.eigh(C)  # ascending
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    # balanced allocation: descending eigenvalues, each to the non-full
    # subspace with the smallest running log-product of variances
    buckets: list[list[int]] = [[] for _ in range(m_sub)]
    logprod = [0.0] * m_sub
    for i in range(d):
        open_js = [j for j in range(m_sub) if len(buckets[j]) < dsub]
        j = min(open_js, key=lambda jj: (logprod[jj], jj))
        buckets[j].append(i)
        logprod[j] += math.log(max(float(w[i]), 1e-12))
    perm = [i for b in buckets for i in b]
    R = V[:, perm].T  # rows are the rotated coordinates
    return [[float(x) for x in row] for row in R]


def opq_rotate_expr(R: list[list[float]], dv: str = "_dv") -> str:
    """R·x as unrolled SQL text (one left-associated dot product per
    rotated coordinate) — scan-speed, whole-stage codegen, the same
    literal-unroll idiom as ``_sub_l2sq_sql``."""
    comps = []
    for row in R:
        comps.append(
            " + ".join(f"({_dlit(v)} * {dv}[{j}])" for j, v in enumerate(row))
        )
    return "array(" + ", ".join(comps) + ")"


def opq_rotate_query(R: list[list[float]], query_vec: list[float]) -> list[float]:
    """Driver-side R·q via the same numpy matmul the rotation UDF runs,
    so rotated base and rotated query feed ``pq_topk`` with consistent
    doubles."""
    import numpy as np

    return [
        float(x)
        for x in np.asarray(R, dtype="float64")
        @ np.asarray([float(v) for v in query_vec], dtype="float64")
    ]


def opq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_codes: int = 16,
    m_sub: int = 8,
    n_train: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """OPQ top-k = learn/receive R, rotate base + query, run the
    unchanged ``pq_topk`` ADC machinery in the rotated space. Orthogonal
    R preserves true L2 distances exactly, so the brute-force ground
    truth is unchanged — only the quantization grid improves. Output
    schema matches ``pq_topk`` (vec_id, pq_code, pq_dist); pq_dist is
    the ADC distance in the ROTATED space (same estimator the ranking
    uses).

    The rotation runs as an Arrow-batched pandas UDF (one numpy matmul
    per batch) rather than ``opq_rotate_expr``'s literal SQL, ON
    PURPOSE: CollapseProject inlines a projection expression into every
    downstream reference, and the PQ encode/ADC chains reference the
    rotated array ~100× — the inlined plan costs ~25 s of codegen
    compile (measured, sf0.01) vs ~6 s with the UDF boundary, whose
    output materializes once per row. Production at 100 TB would
    materialize the rotated codes to storage anyway (encode is a
    write-once pipeline); the UDF's Arrow toll is confined to it."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    R = rotation if rotation is not None else opq_rotation(
        embeddings, m_sub, n_train, id_col, vec_col
    )
    Rm = np.asarray(R, dtype="float64")

    @pandas_udf("array<double>")
    def _rotate(col: pd.Series) -> pd.Series:
        X = np.array([np.asarray(v, dtype="float64") for v in col])
        if not len(X):
            return pd.Series([], dtype="object")
        Xr = X @ Rm.T
        return pd.Series(list(Xr))

    rotated = embeddings.select(
        id_col,
        _rotate(F.col(vec_col).cast("array<double>")).alias(vec_col),
    )
    return pq_topk(
        rotated, opq_rotate_query(R, query_vec), k, n_codes, m_sub,
        id_col, vec_col,
    )


# --------------------------------------------------------------------------
# Scalar quantization (SQ8) — the simplest compressed-domain ANN path:
# each dimension is uniformly quantized to one byte against per-dimension
# [min, max] trained from the base set (the FAISS ScalarQuantizer /
# Lucene int8 HNSW storage recipe). 4× smaller than float32 with near-
# exact recall; unlike PQ there is no codebook join anywhere — encode and
# ADC are pure scalar expressions at scan speed.
# --------------------------------------------------------------------------

def sq8_params(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the base set — one aggregate job
    (map-side partial min/max, d=64 doubles each way) and a driver
    collect of 2·d scalars: the same bounded-collect contract as
    ``pq_codebooks`` (O(KB), broadcast back as literals). min/max are
    exact selections of existing doubles — no arithmetic — so the SQL
    oracle recomputing them from the same table lands on the bitwise-
    identical values."""
    dim = len(embeddings.select(vec_col).first()[0])
    dv = F.col(vec_col).cast("array<double>")
    aggs = []
    for i in range(dim):
        aggs.append(F.min(dv[i]).alias(f"mn{i}"))
        aggs.append(F.max(dv[i]).alias(f"mx{i}"))
    row = embeddings.agg(*aggs).first()
    mins = [float(row[f"mn{i}"]) for i in range(dim)]
    maxs = [float(row[f"mx{i}"]) for i in range(dim)]
    return mins, maxs


def _grouped_sum_sql(terms: list[str], group: int = 8) -> str:
    """Sum ``terms`` as a left-associated chain of parenthesized
    ``group``-term left-associated sub-chains: ((t0+…+t7)) + ((t8+…)) + …
    A flat 64-term chain nests the first term ~64 levels deep, which
    blows DuckDB's 128-level binder recursion limit once each term has
    its own depth; grouping caps the depth at ~group + dim/group. The
    grouping CHANGES float association vs a flat chain, so BOTH engines
    must (and do) use this same helper-generated shape."""
    chunks = [
        "(" + " + ".join(terms[i:i + group]) + ")"
        for i in range(0, len(terms), group)
    ]
    return " + ".join(chunks)


def sq8_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SQ8 top-k by asymmetric distance: encode every dimension as
    ``clamp(floor((x - mn) / (mx - mn) * 255 + 0.5), 0, 255)`` (floor of
    the shifted value, NOT round — floor is bitwise-identical across
    engines while round's half-way rule is not), then rank by the true
    query against the dequantized reconstruction
    ``mn + code * ((mx - mn) / 255)``. Both passes are unrolled scalar
    SQL text over literal mn/step values (the ``_sub_l2sq_sql`` build-
    cost rationale): no join, no shuffle, no UDF — the scan IS the
    query, and at 100 TB only the byte codes need storing. A degenerate
    dimension (mx == mn) encodes as 0 and contributes
    ``(q_i - mn_i)^2`` — mirrored verbatim in the oracle. Ranking uses
    the 6-dp-rounded distance with an ``id_col`` tie-break, the
    cross-engine determinism rule of every distance rank in this
    module."""
    mins, maxs = sq8_params(embeddings, id_col, vec_col)
    dim = len(mins)
    if len(query_vec) != dim:
        raise ValueError(f"query dim {len(query_vec)} != base dim {dim}")
    code_exprs = []
    for i in range(dim):
        mn, mx = mins[i], maxs[i]
        rng = mx - mn
        if rng == 0.0:
            code_exprs.append(f"0 AS code_{i}")
        else:
            code_exprs.append(
                f"least(greatest(cast(floor((_dv[{i}] - {_dlit(mn)})"
                f" / {_dlit(rng)} * 255.0 + 0.5) as int), 0), 255)"
                f" AS code_{i}"
            )
    terms = []
    for i in range(dim):
        mn, mx = mins[i], maxs[i]
        rng = mx - mn
        qi = _dlit(float(query_vec[i]))
        recon = f"({_dlit(mn)} + code_{i} * ({_dlit(rng)} / 255.0))"
        terms.append(f"({qi} - {recon}) * ({qi} - {recon})")
    enc = embeddings.select(
        id_col, F.col(vec_col).cast("array<double>").alias("_dv")
    ).selectExpr(id_col, *code_exprs)
    dist = F.expr(_grouped_sum_sql(terms))
    return (
        enc.withColumn("_sqd", dist)
        .orderBy(F.round(F.col("_sqd"), 6).asc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            F.concat_ws(
                "-", *[F.col(f"code_{i}").cast("string") for i in range(dim)]
            ).alias("sq_code"),
            F.round(F.col("_sqd") + F.lit(5e-10), 6).alias("sq_dist"),
        )
    )


# --------------------------------------------------------------------------
# Hybrid retrieval — reciprocal-rank fusion (Cormack, Clarke & Buettcher
# SIGIR 2009) of a lexical BM25 ranking and a dense cosine ranking: the
# standard two-tower production recipe (sparse + dense retrievers fused
# without score calibration, since RRF only consumes ranks).
# --------------------------------------------------------------------------

def hybrid_rrf_topk(
    embeddings: DataFrame,
    docs: DataFrame,
    query_vec: list[float],
    query_terms: list[str],
    k: int = 10,
    k_each: int = 50,
    rrf_k: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by RRF score ``Σ_lists 1/(rrf_k + rank)``
    over two independently-computed top-``k_each`` lists: dense = cosine
    vs the literal query vector ranked by (5-dp-rounded sim desc, id) —
    the ``vec_knn_brute`` determinism rule — and lexical =
    ``textops.bm25_search`` ranked by (6-dp-rounded score desc, id).
    Ranks are exact integers, so the fused score is bitwise-identical
    cross-engine (same two divisions, same written order); exact RRF
    ties (symmetric rank swaps) break by id.

    Scale shape: each list is an independent top-k (map-side partial
    top-k over its own scan — the BM25 side never touches embeddings and
    vice versa), the fuse is a full-outer join of two ≤ k_each-row sets
    (driver-bounded constants, broadcast by AQE), and the final rank
    sorts ≤ 2·k_each rows."""
    from pyspark.sql import Window as W

    from tsengine import textops

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sims = embeddings.where(F.col(id_col) != 0).select(
        F.col(id_col).alias("_rid"),
        F.round(cosine(_as_double(F.col(vec_col)), q), 5).alias("_sim"),
    )
    wv = W.orderBy(F.col("_sim").desc(), F.col("_rid").asc())
    v = (
        sims.orderBy(F.col("_sim").desc(), F.col("_rid").asc())
        .limit(k_each)
        .select(
            "_rid",
            F.row_number().over(wv).cast("long").alias("vec_rank"),
        )
    )
    t = textops.bm25_search(
        docs, query_terms, k=k_each, id_col=doc_id_col
    ).select(F.col(doc_id_col).alias("_rid"), F.col("rank").alias("text_rank"))
    # D suffixes: Spark types bare decimal literals as DECIMAL (DuckDB
    # types them DOUBLE), and decimal division would both change the
    # values and break schema parity with the oracle
    rrf = (
        f"coalesce(1.0D / ({float(rrf_k)}D + vec_rank), 0.0D)"
        f" + coalesce(1.0D / ({float(rrf_k)}D + text_rank), 0.0D)"
    )
    fused = (
        v.join(t, "_rid", "full_outer")
        .select(
            F.col("_rid").alias(doc_id_col),
            "vec_rank",
            "text_rank",
            F.expr(rrf).alias("_rrf"),
        )
    )
    return (
        fused.orderBy(F.round(F.col("_rrf"), 6).desc(), F.col(doc_id_col))
        .limit(k)
        .select(
            doc_id_col,
            "vec_rank",
            "text_rank",
            F.round(F.col("_rrf"), 6).alias("rrf_score"),
        )
    )


def mmr_rerank(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 5,
    k_cand: int = 20,
    lam: float = 0.7,
    beta: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell-Goldstein 1998):
    greedily build a k-item result where each pick maximizes
    lam * sim(query, d) - beta * max_{s in selected} sim(d, s) — relevance
    minus redundancy, the standard diversity re-rank on top of ANN
    retrieval. ``beta`` is passed explicitly (not computed as 1 - lam) so
    both engines use the same exact literal.

    Scale shape: the DISTRIBUTED work is the corpus-wide top-k_cand scan
    (constant-folded query literal, whole-stage codegen, take-ordered) and
    the k_cand² pairwise cosine self-join — both bounded by k_cand, not
    the corpus. The greedy itself is inherently sequential (each pick
    conditions on the previous), so it runs driver-side over the collected
    k_cand² sim matrix — bounded, like the OPQ eigendecomposition. All
    sims are rounded to 6 dp BEFORE the greedy so the selection compares
    identical doubles on every engine; scores use the same literal
    arithmetic (lam*simq - beta*maxsim) as the SQL oracle.
    """
    cand = cosine_topk(embeddings, query_vec, k=k_cand, id_col=id_col,
                       vec_col=vec_col)
    c = (
        cand.join(embeddings.select(id_col, vec_col), id_col)
        .select(
            F.col(id_col).alias("cid"),
            F.round("cosine_sim", 6).alias("simq"),
            _as_double(F.col(vec_col)).alias("emb"),
        )
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(b, F.col("a.cid") != F.col("b.cid")).select(
        F.col("a.cid").alias("ai"),
        F.col("b.cid").alias("bi"),
        F.round(cosine(F.col("a.emb"), F.col("b.emb")), 6).alias("sim"),
    )
    simq = {r["cid"]: r["simq"] for r in c.select("cid", "simq").collect()}
    sim = {(r["ai"], r["bi"]): r["sim"] for r in pairs.collect()}

    remaining = set(simq)
    # first pick: pure relevance, ties to the smaller id
    first = max(remaining, key=lambda d: (simq[d], -_id_key(d)))
    sel = [(1, first, simq[first])]
    remaining.discard(first)
    while remaining and len(sel) < k:
        best = None
        for d in remaining:
            redun = max(sim[(d, s)] for _, s, _ in sel)
            score = lam * simq[d] - beta * redun
            if best is None or (score, -_id_key(d)) > (best[1], -_id_key(best[0])):
                best = (d, score)
        sel.append((len(sel) + 1, best[0], best[1]))
        remaining.discard(best[0])

    spark = embeddings.sparkSession
    out = spark.createDataFrame(
        [(r, int(v), float(s)) for r, v, s in sel],
        f"sel_rank int, {id_col} long, score_raw double",
    )
    return out.select(
        "sel_rank",
        id_col,
        F.round(F.col("score_raw") + F.lit(1e-9), 5).alias("mmr_score"),
    )


def _id_key(v):
    """Sort key for candidate ids (int ids sort numerically)."""
    return int(v)


def dim_stats(
    embeddings: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension statistics of an embedding column + the corpus's
    effective dimension: for each dim, mean and population variance; on
    every row, eff_dim = (Σ var)² / Σ var² — the participation ratio of
    the per-dimension variance spectrum. eff_dim << d flags collapsed /
    anisotropic embeddings (a known failure mode that silently wrecks
    cosine ANN recall), without needing an eigendecomposition.

    Scale shape: posexplode → ONE (dim)-keyed exchange with map-side
    partial agg to d rows; the participation ratio is a window over that
    d-row table. Float sums over the corpus are order-sensitive (the
    vectors are floats, not cents) — rounded + nudged like every vec op.
    """
    from pyspark.sql import Window

    t = embeddings.select(
        F.posexplode(_as_double(F.col(vec_col)))
    ).withColumnRenamed("pos", "dim_idx").withColumnRenamed("col", "x")
    g = t.groupBy("dim_idx").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nn = F.col("n_vecs").cast("double")
    mean = F.col("sx") / nn
    var = F.col("sxx") / nn - (F.col("sx") / nn) * (F.col("sx") / nn)
    g = g.withColumn("var_raw", var)
    wall = Window.partitionBy()  # d rows only — never corpus volume
    sv = F.sum("var_raw").over(wall)
    svv = F.sum(F.col("var_raw") * F.col("var_raw")).over(wall)
    return g.select(
        "dim_idx",
        "n_vecs",
        (F.round(mean + F.lit(1e-9), 6) + F.lit(0.0)).alias("dim_mean"),
        F.round(F.col("var_raw") + F.lit(1e-9), 6).alias("dim_var"),
        F.round(sv * sv / svv + F.lit(1e-9), 4).alias("eff_dim"),
    )


def ann_recall_eval(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN self-evaluation: recall@k of the LSH-pruned top-k against the
    brute-force cosine top-k on the same query — the measurement every
    index deployment needs before trusting the pruned path (and the
    number the multi-probe knob is tuned against).

    Both rankings are deterministic (cosine desc, id tie-break), so the
    hit count is exact; output is ONE row (k, n_lsh, n_hit, recall).
    Shape: two bounded take-ordered scans + a k-row join — the eval
    costs two queries, never a corpus-sized structure.
    """
    base = embeddings.where(F.col(id_col) != 0)
    brute = cosine_topk(
        base, query_vec, k=k, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("bid"))
    lsh = lsh_topk(
        base, query_vec, k=k, n_bits=n_bits, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("lid"))
    j = brute.join(lsh, brute["bid"] == lsh["lid"], "left").agg(
        F.sum(F.col("lid").isNotNull().cast("long")).alias("n_hit")
    )
    nl = lsh.agg(F.count("*").cast("long").alias("n_lsh"))
    return (
        j.crossJoin(F.broadcast(nl))
        .select(
            F.lit(k).cast("int").alias("k"),
            "n_lsh",
            "n_hit",
            F.round(
                F.col("n_hit").cast("double") / F.lit(float(k))
                + F.lit(1e-9),
                4,
            ).alias("recall"),
        )
    )
