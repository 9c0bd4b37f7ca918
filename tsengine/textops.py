"""Text-corpus operators for large-scale training-data pipelines.

No reference-repo analog (rewemo is numeric-only); these are the
document-side siblings of the signal packs: stateless, whole-column,
Catalyst-native wherever possible so the 100 TB path never leaves the JVM.

Design rules:
- Hashing is md5-based (`F.md5`) so every operator has a bit-identical
  ANSI-SQL oracle (DuckDB ``md5``) — xxhash64/murmur are faster but
  engine-specific, and dedup correctness auditing needs replayability.
  A 60-bit integer is carved from the first 15 hex chars (fits int64).
- Everything shuffles on the smallest viable key: dedup shuffles on the
  digest (uniform by construction — no skew), LSH shuffles on (band,
  bucket) which salts mega-clusters across bands.
- MinHash/LSH/SimHash are pure Column expressions (transform/aggregate
  over token arrays) — no Python in the hot path at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, Window as W
from pyspark.sql import functions as F

TOKEN_RE = r"\s+"


def bucket_cap(
    bands: DataFrame,
    part_cols: list[str],
    max_bucket: int,
    observation: Observation | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Apply a per-bucket row cap and ACCOUNT for what it drops — the
    engine's own "no silent caps" rule. Returns (kept, dropped_metrics)
    where dropped_metrics is a 1-row DataFrame
    (n_buckets_dropped, n_rows_dropped); a non-zero count is the
    recall-loss signal a production run must see.

    Cost: the DataFrame metrics are a second lazy plan over the same
    banded input, so consuming THEM re-runs the banding scan + count
    window. For the free path pass an ``Observation``: it is attached
    upstream of the cap filter, so the SAME action that consumes ``kept``
    yields ``observation.get`` = {n_rows_dropped, n_buckets_dropped}
    with zero extra jobs (n_buckets via Σ 1/_bc over dropped rows — each
    overfull bucket contributes _bc · (1/_bc) = 1 exactly, rounded to
    kill fp dust; ``observe`` cannot run COUNT DISTINCT).

    Caveat: if the consuming query collapses to an empty relation BEFORE
    scanning the observed branch (AQE empty-relation propagation when the
    cap drops everything), the observation never fires and ``.get``
    raises — fall back to the metrics DataFrame for that degenerate
    case."""
    cnt = F.count("*").over(W.partitionBy(*part_cols))
    with_c = bands.withColumn("_bc", cnt)
    if observation is not None:
        over = F.col("_bc") > max_bucket
        with_c = with_c.observe(
            observation,
            F.round(
                F.coalesce(
                    F.sum(
                        F.when(over, F.lit(1.0) / F.col("_bc")).otherwise(F.lit(0.0))
                    ),
                    F.lit(0.0),
                )
            ).cast("long").alias("n_buckets_dropped"),
            F.coalesce(
                F.sum(F.when(over, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
            ).cast("long").alias("n_rows_dropped"),
        )
    kept = with_c.where(F.col("_bc") <= max_bucket).drop("_bc")
    dropped = with_c.where(F.col("_bc") > max_bucket).agg(
        F.count_distinct(*[F.col(c) for c in part_cols]).alias("n_buckets_dropped"),
        F.count("*").alias("n_rows_dropped"),
    )
    return kept, dropped

# 60-bit hash of a string column via md5 (oracle: ('0x'||substr(md5(x),1,15))::bigint)
def _h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty strings dropped (a text of only
    whitespace yields an empty array, matching the SQL oracle's
    list_filter)."""
    return F.filter(F.split(F.trim(text), TOKEN_RE), lambda t: t != "")


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with the
    canonical (min id) representative and the duplicate count.

    Scale note: the only shuffle is keyed by the digest — uniformly
    distributed, so no skew regardless of corpus duplication structure;
    map-side partial agg compacts before the exchange."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def drop_exact_dups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep only the canonical representative per distinct text."""
    keep = exact_dedup_groups(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


def drop_near_dups(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Apply a near-dup pair list (doc_a < doc_b from any of the pairers:
    LSH, simhash, n-gram Jaccard, embedding near-dup) as a dedup policy:
    drop every document that appears as the HIGHER id of some pair — the
    standard greedy keep-lowest rule used by corpus dedup pipelines.

    One anti-join keyed by doc id (uniform). Note the deliberate semantics
    on chains a—b—c: b and c are both dropped even though b (the only
    retained neighbor of c) is itself removed — over-dropping is the safe
    direction for training data; for chain-exact grouping use
    ``dedup_components`` and keep one representative per component."""
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


def dedup_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Transitive near-dup grouping: connected components over the pair
    graph via iterative min-label propagation — the exact policy
    ``drop_near_dups`` deliberately approximates. Returns (doc_id,
    component) where component = the smallest doc id reachable through
    any chain of pairs; keep one representative per component for
    chain-exact dedup.

    Shape: a driver-side loop of (join neighbor labels → min), each
    iteration ONE job and one shuffle keyed by doc id; converges in
    O(graph diameter) rounds (near-dup clusters are shallow). The
    changed-label check rides the same job via ``df.observe`` — no
    second comparison join/count per round. Per the engine's "no silent
    caps" rule, a chain deeper than ``max_iter`` raises instead of
    returning partially-propagated labels. The returned DataFrame is
    localCheckpoint-materialized (lineage truncated, ≤ |doc_ids| rows)
    and every per-round cache is unpersisted before returning — a
    long-running session accumulates nothing."""
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
        .persist()
    )
    converged = False
    for _ in range(max_iter):
        nbr = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        obs = Observation()
        new = (
            labels.join(nbr, "id", "left")
            .withColumn(
                "_new",
                F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))),
            )
            .observe(
                obs,
                F.coalesce(
                    F.sum(F.when(F.col("_new") < F.col("comp"), 1).otherwise(0)),
                    F.lit(0),
                ).cast("long").alias("changed"),
            )
            .select("id", F.col("_new").alias("comp"))
            .persist()
        )
        new.count()  # one job: fills the cache AND the observed metric
        labels.unpersist()
        labels = new
        if obs.get["changed"] == 0:
            converged = True
            break
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"dedup_components: min-label propagation did not converge in "
            f"{max_iter} rounds (a dup chain with graph diameter > "
            f"{max_iter} exists); raise max_iter"
        )
    out = labels.select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    ).localCheckpoint(eager=True)
    labels.unpersist()
    return out


# --------------------------------------------------------------------------
# MinHash + LSH near-dedup
# --------------------------------------------------------------------------

def minhash_signature(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 0,
) -> DataFrame:
    """k-permutation MinHash over distinct whitespace tokens, or over word
    n-gram shingles when ``shingle_n`` ≥ 2 (the right feature set for
    near-dup detection on small-vocabulary corpora — single tokens are too
    common and every document collides).

    Permutation i = md5(feature || ':' || i); the signature column
    ``sig_i`` is the min 60-bit value. Pure Column exprs (transform +
    array_min): JVM-side, codegen'd, zero Python."""
    if shingle_n >= 2:
        toks = shingles(F.col(text_col), shingle_n)
    else:
        toks = F.array_distinct(tokens(F.col(text_col)))

    # Perf note: per-permutation transform+array_min HOFs are INTERPRETED
    # (measured 15 s for k=4 over 50 K docs where the md5 work itself is a
    # fraction of that); explode to one row per (doc, feature) and take k
    # codegen'd MIN aggregates instead — same md5 count, tight generated
    # loop. Partial aggregation collapses map-side (a doc's features are
    # colocated in its scan partition), so the exchange carries one row
    # per doc. Requires ``id_col`` to be row-unique (corpus invariant).
    # A feature-less doc (empty array or NULL text) explodes to one NULL
    # feature row -> every min over it is NULL, matching array_min on an
    # empty/NULL transform result.
    # pre-repartition on the id for the same reason as ``simhash``: the
    # aggregate's exchange moves before the md5-heavy explode, so the
    # hashing parallelizes even off a single-row-group scan
    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    base = docs.repartition(n_part, id_col).select(
        id_col, F.explode_outer(toks).alias("_t")
    )
    mins = [
        F.min(_h60(F.concat(F.col("_t"), F.lit(f":{i}")))).alias(f"sig_{i}")
        for i in range(k)
    ]
    return base.groupBy(id_col).agg(*mins)


def lsh_candidate_pairs(
    sigs: DataFrame,
    k: int = 8,
    band_size: int = 2,
    id_col: str = "doc_id",
    max_bucket: int | None = None,
    return_dropped: bool = False,
    observation: Observation | None = None,
) -> DataFrame:
    """Band the signature (k/band_size bands of band_size rows), bucket-join
    within bands, emit candidate pairs (a<b) with the signature-estimated
    Jaccard (fraction of equal signature slots).

    Shuffle key = (band_idx, bucket): near-duplicate mega-clusters split
    across bands instead of one hot key.

    Documents with NULL signatures (no tokens/shingles) are dropped before
    banding: a NULL slot never equi-joins in SQL, and without the filter
    concat_ws would silently collapse every empty document into ONE bucket —
    an all-pairs quadratic hot key at corpus scale.

    ``max_bucket`` is the 100 TB safety valve: buckets holding more rows are
    dropped entirely (a bucket of B rows costs B² comparisons; a near-dup
    mega-cluster is still found via its other bands or is trivially exact-dup
    material). None = no cap (the oracle-checkable default). With
    ``return_dropped=True`` the result is (pairs, dropped_metrics) where
    dropped_metrics counts capped buckets/rows — caps are never silent.
    Pass ``observation`` to receive the same drop counts from the SAME
    action that consumes the pairs (zero extra jobs; see ``bucket_cap``)."""
    n_bands = k // band_size
    # materialize the signature table once: the banded self-join's two
    # sides carry different projections, so Catalyst plans two separate
    # subtrees and the (md5-heavy) signature computation would run TWICE
    # — measured as the whole second half of the operator's wall time
    sigs = (
        sigs.where(F.col("sig_0").isNotNull()).localCheckpoint(eager=True)
    )
    bands = sigs.select(
        id_col,
        *[F.col(f"sig_{i}") for i in range(k)],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                "_",
                                *[
                                    F.col(f"sig_{b * band_size + j}").cast("string")
                                    for j in range(band_size)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, *[f"sig_{i}" for i in range(k)], "band.band_idx", "band.bucket")

    dropped = None
    bands_b = bands
    if max_bucket is not None:
        # observe only the LEFT side of the self-join: one CollectMetrics
        # node per query (Spark rejects/duplicates a same-named metrics
        # node appearing in both join branches); the left scan sees every
        # banded row, so the drop counts are complete.
        bands, dropped = bucket_cap(
            bands, ["band_idx", "bucket"], max_bucket, observation=observation
        )
        bands_b, _ = bucket_cap(bands_b, ["band_idx", "bucket"], max_bucket)

    left = bands.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"a_sig_{i}") for i in range(k)],
        "band_idx",
        "bucket",
    )
    right = bands_b.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"b_sig_{i}") for i in range(k)],
        "band_idx",
        "bucket",
    )
    eq_slots = sum(
        F.when(F.col(f"a_sig_{i}") == F.col(f"b_sig_{i}"), 1).otherwise(0)
        for i in range(k)
    )
    joined = left.join(right, ["band_idx", "bucket"]).where(
        F.col("doc_a") < F.col("doc_b")
    )
    if max_bucket is None:
        # multi-band matches dedup WITHOUT a distinct() exchange over the
        # candidate volume: keep a pair only in its FIRST matching band —
        # for the row from band b, every band i < b must have at least one
        # unequal slot. Scan-speed predicate on the slot columns both sides
        # already carry. (Unsafe under a bucket cap: the first matching
        # band's bucket may be dropped while a later band's survives, so
        # the capped path keeps the distinct().)
        # Assumes no md5 collision: the join matches on md5(bucket) while
        # this predicate checks raw slots, so a pair whose EARLIER band
        # collides in md5 (bucket equal, slots unequal) would be emitted
        # both there and at its true matching band — a duplicate the old
        # distinct() collapsed. P(collision) ≈ n²/2^129 per band:
        # negligible against any realistic corpus.
        cond = F.lit(True)
        for i in range(n_bands - 1):
            band_eq_i = F.lit(True)
            for j in range(band_size):
                s = i * band_size + j
                band_eq_i = band_eq_i & (
                    F.col(f"a_sig_{s}") == F.col(f"b_sig_{s}")
                )
            cond = cond & (~(F.col("band_idx") > i) | ~band_eq_i)
        pairs = joined.where(cond).select(
            "doc_a", "doc_b", (eq_slots / F.lit(float(k))).alias("est_jaccard")
        )
    else:
        pairs = (
            joined.select(
                "doc_a", "doc_b",
                (eq_slots / F.lit(float(k))).alias("est_jaccard"),
            )
            .distinct()
        )
    if return_dropped:
        if dropped is None:  # no cap → nothing can be dropped
            dropped = sigs.sparkSession.createDataFrame(
                [(0, 0)], "n_buckets_dropped long, n_rows_dropped long"
            )
        return pairs, dropped
    return pairs


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash(
    docs: DataFrame, bits: int = 64, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """bits-wide SimHash over distinct tokens: bit j is 1 iff the majority
    of token hashes have bit j set (ties → 1, since vote uses >= 0).

    Expressed as one aggregate over the token array per bit — all Column
    exprs. Bits 0-59 come from the first 15 hex chars of the token md5,
    bits 60-63 from the next segment — every simhash bit carries real
    hash signal at the full width (a single 60-bit carve would leave the
    top bits of a 64-wide hash constant-zero). Default 64 = production
    width = the hard maximum: the hash packs into ONE long, and shift
    amounts ≥ 64 wrap mod 64 on the JVM (silent corruption, not an
    error), so wider hashes would need a second column. The oracle
    builds the identical value from the same md5 segments."""
    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64], got {bits}")
    toks = F.array_distinct(tokens(F.col(text_col)))

    # Perf note: per-bit F.aggregate HOF lambdas over the token array are
    # INTERPRETED (no codegen) — measured ~0.12 s/bit over 50 K short docs,
    # i.e. the 64-bit hash cost ~9 s where the md5 work itself is ~1 s.
    # Explode to one row per (doc, token hash) and take 64 codegen'd
    # bit-sums in a hash aggregate instead: the partial aggregation
    # collapses map-side (each doc's tokens are colocated in its scan
    # partition), so the exchange carries one 65-column row per doc.
    # Requires ``id_col`` to be row-unique (true for every corpus table
    # here; minhash/LSH make the same assumption).
    # votes_j = Σ(±1) = 2·ones_j − n, so bit_j = 1 ⟺ 2·ones_j ≥ n.
    # NULL text must keep the legacy encoding (simhash=0, n_tokens=−1 via
    # F.size(NULL)); a token-less non-NULL text aggregates to votes=0 →
    # all-ones hash, n_tokens=0 — explode_outer keeps both doc rows alive.
    # hash-repartition by the id BEFORE the explode: the final aggregate
    # needs this exact exchange anyway (same key, same partition count →
    # Catalyst inserts no second one), and placing it first moves the
    # md5-heavy explode work AFTER the exchange — spread over every core
    # even when the input parquet is a single row group (row groups are
    # unsplittable, so split-size tuning alone cannot parallelize a
    # small-file scan stage)
    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    base = docs.repartition(n_part, id_col).select(
        F.col(id_col).alias(id_col),
        F.col(text_col).isNull().alias("_isnull"),
        F.explode_outer(toks).alias("_t"),
    )
    h1 = _h60(F.col("_t"))
    cols = [F.col(id_col), F.col("_isnull"), h1.alias("_h1")]
    if bits > 60:  # second md5 segment only when bits 60-63 are used
        cols.append(
            F.conv(F.substring(F.md5(F.col("_t")), 16, 15), 16, 10)
            .cast("long")
            .alias("_h2")
        )
    per_tok = base.select(*cols)
    ones = []
    for j in range(bits):
        src, b = ("_h1", j) if j < 60 else ("_h2", j - 60)
        ones.append(
            F.sum(
                F.shiftright(F.col(src), b).bitwiseAND(F.lit(1).cast("long"))
            ).alias(f"_o{j}")
        )
    agg = per_tok.groupBy(id_col).agg(
        F.max("_isnull").alias("_isnull"),
        F.count("_h1").alias("_n"),
        *ones,
    )
    acc = F.lit(0).cast("long")
    for j in range(bits):
        bit = (
            F.when(
                F.coalesce(F.col(f"_o{j}"), F.lit(0)) * 2 >= F.col("_n"),
                F.lit(1).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
        )
        acc = acc + F.shiftleft(bit, j)
    return agg.select(
        id_col,
        F.when(F.col("_isnull"), F.lit(0).cast("long")).otherwise(acc).alias("simhash"),
        F.when(F.col("_isnull"), F.lit(-1))
        .otherwise(F.col("_n"))
        .cast("int")
        .alias("n_tokens"),
    )


def hamming_neighbors(
    sim: DataFrame,
    max_dist: int = 3,
    bits: int = 64,
    id_col: str = "doc_id",
    max_bucket: int | None = None,
    return_dropped: bool = False,
    observation: Observation | None = None,
) -> DataFrame:
    """Pairs within Hamming distance ≤ max_dist of each other's simhash —
    EXACT result via pigeonhole banding, never an all-pairs join.

    Pigeonhole: split the ``bits``-wide hash into ``max_dist + 1`` disjoint
    bands. Two hashes within Hamming distance ≤ max_dist differ in at most
    max_dist bit positions, so at least one band is bit-identical — an
    equi-join on (band_idx, band_bits) finds every qualifying pair, and the
    exact-distance filter afterwards removes band-collision false positives.
    The shuffle is keyed by (band_idx, band_bits): candidate volume is
    Σ(bucket²) instead of n², and ``max_bucket`` (rows per band bucket)
    bounds the worst bucket at corpus scale (dropped buckets trade recall on
    mega-clusters, which exact dedup already catches). Identical output to
    the brute-force pair join (multi-band matches dedup via distinct).

    Uncapped path: the band self-join runs over DISTINCT simhash VALUES,
    not doc rows, and doc pairs are expanded back afterwards ("decide with
    small rows, move big rows once"). Real corpora repeat hashes heavily
    (template/boilerplate docs: measured 50 K docs -> 5.5 K distinct
    16-bit values at sf1.0), so candidate volume drops by the duplication
    factor SQUARED while the output is row-identical. The capped path
    keeps row-level banding: ``max_bucket`` counts DOC rows per bucket,
    which a value-level join cannot reproduce."""
    if max_bucket is None:
        return _hamming_neighbors_by_value(
            sim, max_dist, bits, id_col, return_dropped
        )
    n_bands = max_dist + 1
    edges = [round(i * bits / n_bands) for i in range(n_bands + 1)]
    band_structs = []
    for b in range(n_bands):
        width = edges[b + 1] - edges[b]
        mask = F.lit((1 << width) - 1).cast("long")
        band_structs.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col("simhash"), edges[b]).bitwiseAND(mask).alias("band_bits"),
            )
        )
    bands = sim.select(
        F.col(id_col).alias("_id"),
        F.col("simhash").alias("_h"),
        F.explode(F.array(*band_structs)).alias("bd"),
    ).select("_id", "_h", "bd.band_idx", "bd.band_bits")

    # observe only one self-join side — see lsh_candidate_pairs
    bands, dropped = bucket_cap(
        bands, ["band_idx", "band_bits"], max_bucket, observation=observation
    )
    bands_b, _ = bucket_cap(
        sim.select(
            F.col(id_col).alias("_id"),
            F.col("simhash").alias("_h"),
            F.explode(F.array(*band_structs)).alias("bd"),
        ).select("_id", "_h", "bd.band_idx", "bd.band_bits"),
        ["band_idx", "band_bits"],
        max_bucket,
    )

    a = bands.select(
        F.col("_id").alias("doc_a"), F.col("_h").alias("h_a"), "band_idx", "band_bits"
    )
    b = bands_b.select(
        F.col("_id").alias("doc_b"), F.col("_h").alias("h_b"), "band_idx", "band_bits"
    )
    dist = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("long")
    joined = a.join(b, ["band_idx", "band_bits"]).where(
        F.col("doc_a") < F.col("doc_b")
    )
    # multi-band matches dedup via distinct: a first-matching-band
    # predicate is unsafe under the cap (the first matching band's bucket
    # may be dropped while a later band's survives)
    pairs = (
        joined.select("doc_a", "doc_b", dist.alias("hamming"))
        .where(F.col("hamming") <= max_dist)
        .distinct()
    )
    if return_dropped:
        return pairs, dropped
    return pairs


# broadcast the expansion side only when its EXACT materialized row count
# is known to fit comfortably (2M rows x 16B ≈ 32 MB framed) — at corpus
# scale the doc table exceeds this and the joins fall back to the
# planner's choice (shuffled join with AQE skew splitting)
_EXPAND_BCAST_MAX_ROWS = 2_000_000


def _hamming_neighbors_by_value(
    sim: DataFrame, max_dist: int, bits: int, id_col: str, return_dropped: bool
) -> DataFrame:
    """Uncapped hamming_neighbors via distinct-VALUE banding.

    1. Materialize the tiny (id, simhash) projection once
       (``localCheckpoint`` — the hash is consumed by four plan branches
       and would otherwise recompute its md5 transform per branch).
    2. Pigeonhole band self-join over DISTINCT simhash values only, with
       the first-matching-band predicate deduping multi-band value
       matches at scan speed.
    3. Expand value pairs back to doc pairs: two equi-joins against the
       materialized projection (broadcast when provably small), plus the
       same-value doc self-join (hamming 0). Each unordered doc pair
       appears exactly once: cross pairs come from exactly one ordered
       value pair, same-value pairs from the id_a < id_b self-join.

    The explicit round-robin ``repartition`` before the expansion joins
    is load-bearing: the value-pair table is a few MB, AQE coalesces its
    exchange to ~1 partition, and the (possibly 100x larger) expansion
    would otherwise run single-threaded. Round-robin also spreads hot
    hash values (a 5K-doc template cluster) across all tasks instead of
    hashing them to one."""
    n_bands = max_dist + 1
    edges = [round(i * bits / n_bands) for i in range(n_bands + 1)]
    ids = (
        sim.select(F.col(id_col).alias("_id"), F.col("simhash").alias("_h"))
        .where(F.col("simhash").isNotNull())
        .localCheckpoint(eager=True)
    )
    n_ids = ids.count()  # exact, free: the checkpoint is materialized
    npart = int(sim.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    bc = F.broadcast if n_ids <= _EXPAND_BCAST_MAX_ROWS else (lambda d: d)

    uniq = ids.select("_h").distinct()
    band_structs = []
    for b in range(n_bands):
        width = edges[b + 1] - edges[b]
        mask = F.lit((1 << width) - 1).cast("long")
        band_structs.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col("_h"), edges[b]).bitwiseAND(mask).alias("band_bits"),
            )
        )
    bands = uniq.select(
        "_h", F.explode(F.array(*band_structs)).alias("bd")
    ).select("_h", "bd.band_idx", "bd.band_bits")
    # broadcast one side of the band self-join and round-robin the probe
    # side: simhash band values are heavily clustered (correlated bits),
    # so the keyed shuffle join funnels the hottest bucket's candidate
    # emission into one task; a broadcast build + round-robin probe
    # spreads the same emissions evenly over every core
    a = bands.select(
        F.col("_h").alias("h_a"), "band_idx", "band_bits"
    ).repartition(npart)
    b = bands.select(F.col("_h").alias("h_b"), "band_idx", "band_bits")
    joined = a.join(bc(b), ["band_idx", "band_bits"]).where(
        F.col("h_a") < F.col("h_b")
    )
    # emit each value pair only from its FIRST matching band (scan-speed
    # bitwise predicate — no distinct() exchange over the candidates)
    cond = F.lit(True)
    for i in range(n_bands - 1):
        w = edges[i + 1] - edges[i]
        m = F.lit((1 << w) - 1).cast("long")
        band_eq_i = (
            F.shiftright(F.col("h_a"), edges[i]).bitwiseAND(m)
            == F.shiftright(F.col("h_b"), edges[i]).bitwiseAND(m)
        )
        cond = cond & (~(F.col("band_idx") > i) | ~band_eq_i)
    dist = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("long")
    # Fold same-value pairs (hamming 0) into the value-pair table as
    # (h, h) diagonal rows so the whole doc expansion is ONE fused join
    # chain: a Union of two expanded branches was measured 15-20x slower
    # than the branches themselves — Union sits between each branch's
    # WholeStageCodegen span and the partial count, materializing every
    # output row as an UnsafeRow, while the single fused chain streams.
    # The repartition uses 8x the usual shuffle-partition count: per-row
    # expansion fanout spans orders of magnitude (mult(h_a)·mult(h_b) per
    # value pair), so finer round-robin granularity bounds the straggler
    # tail, and the shuffle moves only the few-MB value-pair table. The
    # eager checkpoint truncates the plan so the expansion stage starts
    # from the materialized table with exact size stats.
    vpairs = (
        joined.where(cond)
        .select("h_a", "h_b", dist.alias("hamming"))
        .where(F.col("hamming") <= max_dist)
        .unionByName(
            uniq.select(
                F.col("_h").alias("h_a"),
                F.col("_h").alias("h_b"),
                F.lit(0).cast("long").alias("hamming"),
            )
        )
        .repartition(npart * 8)
        .localCheckpoint(eager=True)
    )
    pairs = (
        vpairs.join(
            bc(ids.select(F.col("_id").alias("id_x"), F.col("_h").alias("h_a"))),
            "h_a",
        )
        .join(
            bc(ids.select(F.col("_id").alias("id_y"), F.col("_h").alias("h_b"))),
            "h_b",
        )
        # diagonal rows expand to both orders plus self-matches: keep
        # id_x < id_y exactly once; cross rows (h_a < h_b strictly) keep
        # every match, reordered by doc id
        .where((F.col("h_a") != F.col("h_b")) | (F.col("id_x") < F.col("id_y")))
        .select(
            F.least("id_x", "id_y").alias("doc_a"),
            F.greatest("id_x", "id_y").alias("doc_b"),
            "hamming",
        )
    )
    if return_dropped:  # no cap → nothing can be dropped
        dropped = sim.sparkSession.createDataFrame(
            [(0, 0)], "n_buckets_dropped long, n_rows_dropped long"
        )
        return pairs, dropped
    return pairs


# --------------------------------------------------------------------------
# n-gram Jaccard
# --------------------------------------------------------------------------

def shingles(text: Column, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingle array (distinct by default; pass
    ``distinct=False`` to keep multiplicities — repetition metrics need
    the raw counts). Documents shorter than n tokens yield an empty
    array.

    Perf note — the let-binding trick: the token array is wrapped in a
    1-element array and re-entered through ``transform`` so the lambda
    VARIABLE binds the materialized value. Referencing the raw ``tokens()``
    expression inside the shingle lambda would re-tokenize the document on
    EVERY ``element_at`` call (Catalyst's subexpression elimination stops at
    lambda boundaries) — measured 8× slower on the bench corpus."""
    t = tokens(text)

    def build(toks: Column) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
        return F.when(
            F.size(toks) >= n,
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    out = F.element_at(F.transform(F.array(t), build), 1)
    return F.array_distinct(out) if distinct else out


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    block_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Pairwise n-gram Jaccard within a blocking key.

    Plan shape: explode shingles → self-join on (block, shingle) →
    count(distinct shingle) per pair = |∩|; |∪| = |A|+|B|−|∩|. The join is
    keyed by the shingle digest: uniform, and blocking bounds the
    candidate set (at 100 TB block on LSH buckets instead of a metadata
    column — same plan)."""
    sh = docs.select(
        F.col(id_col),
        F.col(block_col).alias("_blk"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    ).select(id_col, "_blk", F.md5("shingle").alias("sh"))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col(id_col).alias("doc_a"), "_blk", "sh")
    b = sh.select(F.col(id_col).alias("doc_b"), "_blk", "sh")
    inter = (
        a.join(b, ["_blk", "sh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") > min_jaccard)
    )


def ngram_jaccard_lsh(
    docs: DataFrame,
    n: int = 3,
    k: int = 8,
    band_size: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_jaccard: float = 0.0,
    max_bucket: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard restricted to MinHash-LSH candidate pairs — the
    production composition of the two stages (`ngram_jaccard_pairs`'s
    docstring promise): no metadata blocking key needed, candidate volume
    bounded by the LSH bands, and the exact score computed only where a
    near-dup is plausible.

    Plan: sigs → banded candidate pairs → join each side's exploded
    shingles through the pair list → count intersections → |∪| from sizes.
    Shuffles are keyed by doc_id / shingle digest (uniform)."""
    sigs = minhash_signature(docs, k=k, shingle_n=n, text_col=text_col, id_col=id_col)
    cand = lsh_candidate_pairs(
        sigs, k=k, band_size=band_size, id_col=id_col, max_bucket=max_bucket
    ).select("doc_a", "doc_b")

    sh = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    ).select(id_col, F.md5("shingle").alias("sh"))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col(id_col).alias("doc_a"), "sh")
    b = sh.select(F.col(id_col).alias("doc_b"), "sh")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "sh"])  # equi-join on (doc, shingle): hash join,
        # intersection rows only — never |A|x|B| per pair
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") > min_jaccard)
    )


# --------------------------------------------------------------------------
# language ID / quality / token stats / fingerprint
# --------------------------------------------------------------------------

# marker-word lists per language (function words — high-frequency, short,
# language-distinctive; ~20 per language keeps the Column expression small
# while being far past the toy-5 threshold where common loanwords dominate)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "was",
           "for", "on", "with", "as", "his", "they", "at", "be", "this", "have"],
    "fr": ["le", "la", "et", "les", "des", "une", "dans", "est", "pour", "qui",
           "pas", "sur", "avec", "son", "aux", "ce", "cette", "mais", "nous", "vous"],
    "es": ["el", "los", "las", "que", "una", "por", "con", "para", "del", "se",
           "su", "al", "lo", "como", "más", "pero", "sus", "está", "entre", "cuando"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "eine", "auf",
           "für", "den", "dem", "sich", "auch", "werden", "aus", "bei", "nach", "wird"],
    "zh": ["de", "shi", "bu", "wo", "ni", "ta", "men", "zhe", "na", "hen",
           "dou", "mei", "hao", "yao", "hui", "shuo", "kan", "lai", "qu", "zai"],
}


def _stop_hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """n-gram-free marker-word language heuristic: argmax of stopword hit
    counts per language, ties broken by language code order, 'und'
    (undetermined) when no marker hits."""
    toks = tokens(F.col(text_col))
    out = docs.select(id_col, toks.alias("_t"))
    langs = sorted(STOPWORDS)
    for lg in langs:
        out = out.withColumn(f"hits_{lg}", _stop_hits(F.col("_t"), STOPWORDS[lg]))
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier lang wins ties → apply last wins reversed
        pred = F.when((F.col(f"hits_{lg}") == best) & (best > 0), F.lit(lg)).otherwise(pred)
    return out.select(
        id_col, *[f"hits_{lg}" for lg in langs], pred.alias("pred_lang")
    )


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics (whitespace tokenizer)."""
    toks = tokens(F.col(text_col))
    return docs.select(
        id_col,
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
    )


SYMBOL_RE = "[^A-Za-z0-9 \\t\\n]"


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score ∈ [0,1] (the classic
    pre-training filter battery — length, repetition, fluency, symbol
    noise, word shape):
    - len_score:     saturating length ratio  min(n_chars/500, 1)
    - uniq_ratio:    distinct/total tokens (repetition penalty)
    - stop_ratio:    english stopword fraction (fluency proxy)
    - symbol_ratio:  non-alphanumeric-char fraction (markup/noise proxy)
    - mean_word_len: Σ token length / n_tokens (gibberish/URL detector)
    score = 0.3·len + 0.3·uniq + 0.2·min(stop·5, 1) + 0.2·(1 − min(symbol·4, 1))"""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    uniq = F.size(F.array_distinct(toks))
    stop = _stop_hits(toks, STOPWORDS["en"])
    n_chars = F.length(text_col)
    n_sym = n_chars - F.length(F.regexp_replace(F.col(text_col), SYMBOL_RE, ""))
    tok_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda a, x: a + x
    )
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    uniq_ratio = F.when(n_tok > 0, uniq / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop / n_tok).otherwise(F.lit(0.0))
    symbol_ratio = F.when(n_chars > 0, n_sym / n_chars).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_tok > 0, tok_chars / n_tok).otherwise(F.lit(0.0))
    score = (
        F.lit(0.3) * len_score
        + F.lit(0.3) * uniq_ratio
        + F.lit(0.2) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(symbol_ratio * 4, F.lit(1.0)))
    )
    return docs.select(
        id_col,
        len_score.alias("len_score"),
        uniq_ratio.alias("uniq_ratio"),
        stop_ratio.alias("stop_ratio"),
        symbol_ratio.alias("symbol_ratio"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality"),
    )


def fingerprint(docs: DataFrame, window: int = 4, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Winnowing-style document fingerprint: min token-window hash per
    sliding window, document fingerprint = min over windows (robust to
    local edits; the full winnowing set is the same expression without
    the outer min)."""
    sh = shingles(F.col(text_col), window)
    fp = F.array_min(F.transform(sh, _h60))
    return docs.select(id_col, fp.alias("fingerprint"))


def bm25_terms(
    docs: DataFrame,
    top_t: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``top_t`` BM25-scored terms per document (Robertson/Sparck
    Jones Okapi BM25 — the classic probabilistic relevance function) —
    the keyword-extraction / salience operator of the text-analysis
    battery; no reference analog (rewemo has no text).

        idf(t)  = ln(1 + (N − df_t + 0.5) / (df_t + 0.5))
        score   = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Scale shape: explode → tf groupBy keyed (doc, term) — the only
    raw-volume shuffle — then df/dl reaggregations of the ALREADY
    aggregated tf table (term- resp. doc-keyed, each ≥10× smaller), a
    term-keyed join (AQE broadcasts it when the vocabulary is small) and
    a scalar corpus-stats broadcast. Top-t is a per-doc rank window over
    the scored tf table, never over raw tokens.

    Determinism: tf/df/dl/N are exact integers; avgdl = Σdl / N divides
    two exact integers, so every engine sees identical doubles through
    the one formula (association order mirrored verbatim in the SQL
    oracle); equal-score ties (same tf, df, dl) break by term. Scores
    round to 6 dp at the edge."""
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = tok.groupBy(id_col, "term").agg(F.count("*").cast("long").alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    dft = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    stats = docs.agg(F.count("*").cast("long").alias("n_docs")).crossJoin(
        tf.agg(F.sum("tf").cast("long").alias("total_tokens"))
    )
    sc = (
        tf.join(dft, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * (F.col("dl") / avgdl)
    )
    score = idf * ((F.col("tf") * F.lit(float(k1) + 1.0)) / denom)
    w = W.partitionBy(id_col).orderBy(F.desc("_score"), F.col("term"))
    return (
        sc.withColumn("_score", score)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_t)
        .select(
            id_col, "rank", "term",
            F.round(F.col("_score"), 6).alias("score"), "tf", "df",
        )
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 document retrieval for a fixed query-term set: per-document
    score = Σ over matched query terms of the Okapi term score (same
    idf/tf formula as ``bm25_terms``), ranked by (6-dp-rounded score
    desc, ``id_col``) — the cross-engine determinism rule, since the
    per-term association order of the Σ differs between engines at ulp
    level.

    Scale shape: the (doc, term) tf groupBy is the only raw-volume
    shuffle (shared with ``bm25_terms``); the query-term filter lands
    immediately after it, so df/join/score run on the ~|query| fraction
    of the tf table, while dl and corpus stats (exact integers) come
    from the unfiltered aggregates. Top-k is one orderBy-limit
    (map-side partial top-k)."""
    qt = [str(t) for t in query_terms]
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf_all = tok.groupBy(id_col, "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dl = tf_all.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    stats = docs.agg(F.count("*").cast("long").alias("n_docs")).crossJoin(
        tf_all.agg(F.sum("tf").cast("long").alias("total_tokens"))
    )
    tf = tf_all.where(F.col("term").isin(qt))
    dft = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    sc = (
        tf.join(dft, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    avgdl = (
        F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * (F.col("dl") / avgdl)
    )
    term_score = idf * ((F.col("tf") * F.lit(float(k1) + 1.0)) / denom)
    scored = (
        sc.withColumn("_ts", term_score)
        .groupBy(id_col)
        .agg(
            F.sum("_ts").alias("_score"),
            F.count("*").cast("long").alias("n_terms"),
        )
    )
    return (
        scored.withColumn("_r", F.round(F.col("_score"), 6))
        .orderBy(F.col("_r").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            F.row_number()
            .over(
                W.orderBy(F.col("_r").desc(), F.col(id_col).asc())
            )
            .cast("long")
            .alias("rank"),
            F.col("_r").alias("score"),
            "n_terms",
        )
    )


# --------------------------------------------------------------------------
# Training-data pipeline operators: split / pack / decontaminate / repetition
# --------------------------------------------------------------------------

def train_split(
    docs: DataFrame,
    fractions: tuple[tuple[str, float], ...] = (
        ("train", 0.9), ("val", 0.05), ("test", 0.05)
    ),
    salt: str = "v1",
    n_buckets: int = 10_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic hash split into train/val/test (the canonical
    training-corpus partitioner). Each doc lands in a bucket via the
    md5-carved 60-bit hash of ``id:salt`` mod ``n_buckets``; cumulative
    fraction boundaries over the bucket axis assign the split. Properties
    a corpus pipeline needs and random() cannot give:

    - **stable**: the same (id, salt) maps to the same split across runs,
      engines, cluster sizes, and row order — re-ingesting a shard never
      migrates a document between train and test;
    - **salt-versioned**: changing ``salt`` draws a fresh independent
      split without touching data;
    - **embarrassingly parallel**: pure rowwise Column expr — no shuffle,
      no state, survives 100 TB trivially.

    Fraction boundaries are computed on the integer bucket axis
    (``round(n_buckets·cumfrac)``) so the split is exact-integer
    arithmetic, oracle-replayable bit-for-bit."""
    bucket = (
        _h60(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
        % F.lit(n_buckets)
    )
    names = [n for n, _ in fractions]
    cuts: list[int] = []
    acc = 0.0
    for _, frac in fractions[:-1]:
        acc += frac
        cuts.append(int(round(n_buckets * acc)))
    split = F.lit(names[-1])
    for name, cut in reversed(list(zip(names[:-1], cuts))):
        split = F.when(F.col("_bucket") < cut, F.lit(name)).otherwise(split)
    return (
        docs.withColumn("_bucket", bucket)
        .withColumn("split", split)
        .withColumnRenamed("_bucket", "bucket")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the standard LLM-pretraining
    batch layout): within each shard, documents are laid out back-to-back
    in ``id`` order on a global token axis and cut every ``budget``
    tokens; each doc is assigned its byte-range on that axis — start
    offset, first/last chunk index, and how many context windows it
    spans. Downstream, (shard, chunk) is the training-example key.

    Scale shape: token counting is rowwise; the only non-local step is
    ONE running-sum window per shard — shards bound window-partition size
    (pick n_shards ≈ cluster parallelism; packing is per-shard
    independent by construction, so more shards = more parallelism with
    zero cross-shard coordination). Exact integer arithmetic throughout.

    Empty docs (0 tokens) occupy no axis space: last_chunk = first_chunk
    and n_chunks = 0."""
    n_tok = F.size(tokens(F.col(text_col))).cast("long")
    d = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        n_tok.alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    d = d.withColumn("offset", off)
    first = F.floor(F.col("offset") / budget).cast("long")
    last = F.when(
        F.col("n_tokens") > 0,
        F.floor((F.col("offset") + F.col("n_tokens") - 1) / budget),
    ).otherwise(first).cast("long")
    return d.select(
        id_col, "shard", "n_tokens", "offset",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        F.when(F.col("n_tokens") > 0, last - first + 1)
        .otherwise(F.lit(0)).cast("long").alias("n_chunks"),
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    min_overlap: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing ≥
    ``min_overlap`` distinct word ``n``-grams with ANY document of the
    (small) benchmark/eval set — the standard n-gram-overlap test-set
    leakage check run before pretraining.

    Scale shape: the benchmark side collapses to a DISTINCT shingle set
    and is broadcast (eval suites are dimension-sized); the corpus side
    explodes shingles and hash-joins locally — the raw 100 TB volume
    never shuffles. Per-doc shingles are already distinct
    (``shingles()``), so the post-join count is exactly the intersection
    size."""
    sh_docs = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("sh")
    )
    bench_set = (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("sh"))
        .distinct()
    )
    overlap = (
        sh_docs.join(F.broadcast(bench_set), "sh")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    return (
        docs.select(id_col)
        .join(overlap, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


def repetition_stats(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram repetition metrics (the Gopher-rules-style
    repetitious-text detector, Rae et al. 2021 §A1.1): the most frequent
    word ``n``-gram, its count, and the fraction of the document's
    characters covered by its occurrences
    (``top_cnt · len(top_gram) / n_chars``). Machine-generated spam and
    boilerplate score high; clean prose stays low.

    Ties on count break by gram string ascending (deterministic).
    Documents with fewer than ``n`` tokens emit top_gram = '' and zero
    metrics. Scale shape: explode → (doc, gram) count — one raw-volume
    shuffle uniform in the gram hash — then a per-doc rank window over
    the ALREADY aggregated count table."""
    grams = docs.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        F.explode(shingles(F.col(text_col), n, distinct=False)).alias("gram"),
    )
    cnt = grams.groupBy(id_col, "n_chars", "gram").agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = W.partitionBy(id_col).orderBy(F.desc("cnt"), F.col("gram"))
    top = cnt.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    rep = F.when(
        F.col("n_chars") > 0,
        F.col("cnt") * F.length("gram") / F.col("n_chars"),
    ).otherwise(F.lit(0.0))
    out = top.select(
        id_col,
        F.col("gram").alias("top_gram"),
        F.col("cnt").alias("top_cnt"),
        F.round(rep, 6).alias("rep_frac"),
    )
    return (
        docs.select(id_col)
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("top_gram"), F.lit("")).alias("top_gram"),
            F.coalesce(F.col("top_cnt"), F.lit(0)).cast("long").alias("top_cnt"),
            F.coalesce(F.col("rep_frac"), F.lit(0.0)).alias("rep_frac"),
        )
    )


# --------------------------------------------------------------------------
# PII detection / scrubbing
# --------------------------------------------------------------------------

# Patterns are written in the Java-regex ∩ RE2 common subset (char classes,
# bounded repetition, \b ASCII word boundary; no lookaround, no backrefs) so
# Spark and the DuckDB oracle compile the SAME automaton. Applied in this
# order; each stage counts matches on the text AS ALREADY MASKED by the
# previous stages, so the counts equal exactly the number of mask tokens
# inserted into clean_text.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("longnum", r"\b\d{9,}\b", "<NUM>"),
)


def pii_scrub(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """PII detection + masking (the redaction pass every training-corpus
    pipeline runs before tokenization): emails, dotted-quad IPv4s, and
    long (≥9-digit) account/phone-like number runs are each counted and
    replaced with a typed mask token. Returns one row per document:
    (id, n_email, n_ipv4, n_longnum, has_pii, clean_text).

    Semantics contract (mirrored verbatim by the SQL oracle): rules apply
    in ``PII_RULES`` order, and each rule counts on the output of the
    previous rule's masking — so Σcounts == number of mask tokens in
    ``clean_text`` and an email's digit run is never double-reported as a
    longnum. Regexes live in the Java∩RE2 subset so both engines match
    identically.

    Scale shape: pure rowwise Column expressions (regexp_count +
    regexp_replace, whole-stage codegen) — zero exchanges, no state, no
    Python; embarrassingly parallel at any corpus size."""
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_RULES:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    total = None
    for name, _, _ in PII_RULES:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return (
        docs.select(F.col(id_col), *counts, cur.alias("clean_text"))
        .select(
            id_col,
            *[f"n_{name}" for name, _, _ in PII_RULES],
            (total > 0).cast("long").alias("has_pii"),
            "clean_text",
        )
    )


# --------------------------------------------------------------------------
# domain-weighted corpus sampling (dataset mixture re-weighting)
# --------------------------------------------------------------------------

def corpus_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "s1",
    n_buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic domain-weighted corpus subsampling — the dataset
    mixture re-weighting step of a pretraining pipeline (downweight bulk
    web, upweight curated sources). Every document draws a stable uniform
    bucket from the md5-carved 60-bit hash of ``id:salt`` mod
    ``n_buckets`` and is kept iff ``bucket < round(rate·n_buckets)`` for
    its domain's rate — so the realized sample is bit-reproducible across
    runs, engines, and cluster sizes (rerunning a failed shard never
    changes the sample), and changing ``salt`` redraws independently.

    Returns ALL rows flagged, not just the survivors: (id, domain,
    bucket, kept, weight) where ``weight = round(1/rate, 6)`` for kept
    rows and 0.0 for dropped ones — the Horvitz-Thompson inverse-rate
    weight downstream unbiased statistics need.

    Scale shape: the rate table is a literal ``create_map`` (domains are
    dimension-sized) — pure rowwise Column exprs, zero exchanges, no
    Python, embarrassingly parallel at any corpus size.

    Rates must lie in (0, 1]: an inclusion probability above 1 is
    unachievable (the row is simply kept, making the 1/rate weight a
    silent undercount) and 0 makes the weight undefined — both raise."""
    for name, r in [*rates.items(), ("default_rate", default_rate)]:
        if not (0.0 < r <= 1.0):
            raise ValueError(
                f"corpus_sample: rate for {name!r} is {r}; inclusion "
                "probabilities must be in (0, 1] for 1/rate weights to "
                "be unbiased"
            )
    cuts = {d: int(round(r * n_buckets)) for d, r in rates.items()}
    cut_map = F.create_map(
        *[F.lit(x) for d in cuts for x in (d, cuts[d])]
    )
    rate_map = F.create_map(
        *[F.lit(x) for d in rates for x in (d, float(rates[d]))]
    )
    bucket = (
        _h60(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
        % F.lit(n_buckets)
    )
    cut = F.coalesce(
        cut_map[F.col(domain_col)],
        F.lit(int(round(default_rate * n_buckets))),
    )
    rate = F.coalesce(rate_map[F.col(domain_col)], F.lit(float(default_rate)))
    kept = bucket < cut
    return docs.select(
        F.col(id_col),
        F.col(domain_col),
        bucket.alias("bucket"),
        kept.cast("long").alias("kept"),
        F.when(kept, F.round(F.lit(1.0) / rate, 6))
        .otherwise(F.lit(0.0))
        .alias("weight"),
    )


# --------------------------------------------------------------------------
# URL canonicalization (web-corpus dedup key)
# --------------------------------------------------------------------------

TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="


def url_canonicalize(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canon_url",
) -> DataFrame:
    """Canonical URL form (the dedup key every web-crawl corpus pipeline
    computes before exact/near dedup — cf. the URL normalizations in RFC
    3986 §6 plus the de-facto crawl rules): lowercase scheme and host,
    strip a leading ``www.``, drop the default port (http:80 / https:443)
    but keep explicit non-default ports, collapse duplicate slashes and
    the trailing slash in the path (root stays ``/``; path CASE is
    preserved — it is significant per the RFC), drop the fragment, drop
    tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
    ``ref``), and sort the surviving parameters bytewise so param order
    can't defeat dedup.

    Pure rowwise Column expressions — regexp extract/replace plus a
    split→filter→array_sort→array_join pipeline for the query string,
    all inside whole-stage codegen; zero exchanges, no Python, so it
    runs at scan speed on a 100 TB crawl. Regexes live in the Java∩RE2
    subset so the SQL oracle matches byte-for-byte.
    """
    u = F.trim(F.col(url_col))
    nofrag = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, "^([A-Za-z][A-Za-z0-9.+-]*)://", 1))
    rest = F.regexp_replace(nofrag, "^[A-Za-z][A-Za-z0-9.+-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]+)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, ":[0-9]+$", ""), "^www\\.", ""
    )
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    portpart = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    pathq = F.regexp_replace(rest, "^[^/?]+", "")
    rawpath = F.regexp_extract(pathq, "^([^?]*)", 1)
    path = F.regexp_replace(rawpath, "/{2,}", "/")
    path = F.regexp_replace(path, "(.)/$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, "\\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        portpart,
        path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )
    return df.withColumn(out_col, canon)


def url_dedup_stats(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonical-URL dedup rollup: one row per canonical URL with the
    duplicate count and the kept representative (lowest id — the same
    keep-first rule as `dedup_exact`). A digest-keyed groupBy with
    map-side partial aggregation; the canonical form is computed at scan
    speed by `url_canonicalize`, so the only exchange is keyed by the
    canonical URL itself."""
    return (
        url_canonicalize(df, url_col=url_col)
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
    )


# --------------------------------------------------------------------------
# inverted index / posting lists (retrieval infrastructure)
# --------------------------------------------------------------------------

def build_postings(
    docs: DataFrame,
    top_p: int = 3,
    min_df: int = 1,
    max_df_frac: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted-index posting heads (the retrieval-infrastructure build
    step): for every eligible term, its df (distinct docs), cf (total
    occurrences), and the first ``top_p`` postings as (doc_id, pos)
    rows ranked by (doc, position). Vocabulary pruning is the classic
    min_df / max_df gate: ultra-rare terms (df < min_df) and
    stopword-like terms (df > max_df_frac·N) are dropped BEFORE the
    posting sort — which is also what makes the plan skew-safe: the
    per-term rank window never sees the heavy stopword keys, so no
    term's shuffle partition is unbounded.

    Scale shape: one (term)-keyed partial-agg groupBy for df/cf, a
    term-keyed semi-join of the token stream against the pruned
    vocabulary (AQE broadcasts it when small), then the rank window over
    bounded per-term groups. Raw text explodes once; positions are
    exact token ordinals so both engines rank identically (no float
    anywhere)."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    )
    n_docs = docs.select(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    stats = (
        tok.groupBy("term")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.count(F.lit(1)).cast("long").alias("cf"),
        )
        .crossJoin(F.broadcast(n_docs))
        .where(
            (F.col("df") >= F.lit(int(min_df)))
            & (F.col("df") <= F.col("n_docs") * F.lit(float(max_df_frac)))
        )
        .drop("n_docs")
    )
    ranked = tok.join(stats, "term").withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("term").orderBy("doc_id", "pos")
        ),
    )
    return ranked.where(F.col("rank") <= int(top_p)).select(
        "term", "df", "cf",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
    )


# --------------------------------------------------------------------------
# RAG / embedding-prep document chunking
# --------------------------------------------------------------------------

def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunking (the RAG / embedding-prep
    split every retrieval pipeline runs before vectorizing): each
    document yields windows of ``chunk_tokens`` tokens advancing by
    ``chunk_tokens − overlap``, the last window keeping its tail
    remainder (never an empty chunk; a short document yields exactly
    one). Emits (doc, chunk_idx, n_chunks, start_tok, n_tok,
    chunk_text) — start offsets are exact token ordinals so downstream
    spans map back to the source.

    Scale shape: pure rowwise Column exprs — tokenize once, explode a
    ``sequence`` of window starts, slice + rejoin per window (higher-
    order array functions, whole-stage codegen, zero exchanges, no
    Python). Output rows ≈ input tokens / stride — embarrassingly
    parallel at any corpus size."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = int(chunk_tokens - overlap)
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # window starts: 0, stride, 2·stride, … while start + overlap < n
    # (i.e. the window adds ≥1 new token); an empty doc yields start 0
    # with an empty chunk filtered below — short docs yield exactly one.
    last = F.greatest(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("long"),
        F.lit(0).cast("long"),
    )
    starts = F.sequence(F.lit(0).cast("long"), last)
    base = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        n.cast("long").alias("_n"),
        (last + 1).cast("long").alias("n_chunks"),
        F.explode(starts).alias("_w"),
    ).where(F.col("_n") > 0)
    start_tok = (F.col("_w") * stride).cast("long")
    piece = F.slice(
        F.col("_toks"), start_tok + 1, F.lit(int(chunk_tokens))
    )
    return base.select(
        id_col,
        F.col("_w").cast("long").alias("chunk_idx"),
        "n_chunks",
        start_tok.alias("start_tok"),
        F.size(piece).cast("long").alias("n_tok"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def hash_embed(
    docs: DataFrame,
    dim: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-hashing document embedding (the hashing trick —
    Weinberger, Dasgupta, Langford, Smola & Attenberg, ICML 2009): each
    token lands in bucket ``h60(token) % dim`` with sign ±1 drawn from an
    independent hash bit (bit 20 — disjoint from the bucket's low bits),
    per-dim signed counts are L2-normalized. The embed step of a training
    pipeline when no model is available: deterministic, vocabularyless,
    and — unlike a learned encoder — exactly reproducible in ANSI SQL,
    so the driver can hash-verify it like any other operator.

    Output is LONG form, non-zero-support rows only: (id, dim_idx,
    raw signed count, normalized val). Documents whose signs fully
    cancel (norm 0) emit nothing — "cannot characterize", same semantic
    as burstiness. raw is integer-exact; norm² = Σ raw² is integer-exact
    too, so the single sqrt + divide are the only float ops and both
    engines compute them on identical operands.

    Shape for 100 TB: explode → ONE token-volume exchange (partial agg
    on (id, bucket) — at most ``dim`` rows per doc survive), then the
    doc-level norm is a second agg-sized exchange. No UDF, no driver."""
    from pyspark.sql import Window

    t = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    )
    h = _h60(F.col("_tok"))
    sign = F.when(F.shiftright(h, 20) % 2 == 0, 1).otherwise(-1)
    agg = t.groupBy(
        id_col, (h % F.lit(dim)).cast("long").alias("dim_idx")
    ).agg(F.sum(sign).cast("long").alias("raw"))
    n2 = F.sum(F.col("raw") * F.col("raw")).over(
        Window.partitionBy(id_col)
    )
    return (
        agg.withColumn("_n2", n2)
        .where(F.col("_n2") > 0)
        .select(
            id_col,
            "dim_idx",
            "raw",
            F.round(
                F.col("raw") / F.sqrt(F.col("_n2").cast("double"))
                + F.lit(5e-10),
                6,
            ).alias("val"),
        )
    )


# --------------------------------------------------------------------------
# corpus-scale vocabulary laws: Heaps growth, Zipf rank-frequency
# --------------------------------------------------------------------------

_OLS_SLOPE = "(k * sxy - sx * sy) / (k * sxx - sx * sx)"
_OLS_INTERCEPT = "(sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx)) * sx) / k"


def heaps_law(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heaps'-law fit over the corpus: how fast does the vocabulary grow
    with corpus size? V(N) ≈ K * N^beta, fit as OLS of ln V on ln N over
    one checkpoint per document in stable ``id_col`` order. beta ≈ 0.5
    is natural text; beta → 1 flags near-random token soup (bad OCR,
    hashes), beta → 0 flags template spam — the corpus-level twin of the
    per-doc quality score.

    Scale shape: NO quadratic "distinct so far" scan. Each token type
    contributes exactly one row at its FIRST document (min doc id per
    token — one token-volume exchange with map-side partial agg), so
    V(N) is a cumulative sum over per-doc first-seen counts and N is a
    cumulative sum over per-doc token counts — two tiny window passes
    over |docs| rows. Counts are integer-exact; only the final ln/OLS is
    float, rounded like every regression in this engine.
    """
    from pyspark.sql import Window

    t = docs.select(
        F.col(id_col).alias("_doc"), F.explode(tokens(F.col(text_col))).alias("_tok")
    )
    per_doc = t.groupBy("_doc").agg(F.count("*").cast("long").alias("n_toks"))
    first_seen = (
        t.groupBy("_tok")
        .agg(F.min("_doc").alias("_doc"))
        .groupBy("_doc")
        .agg(F.count("*").cast("long").alias("n_new"))
    )
    wo = Window.orderBy("_doc").rowsBetween(Window.unboundedPreceding, 0)
    pts = (
        per_doc.join(first_seen, "_doc", "left")
        .fillna({"n_new": 0})
        .withColumn("cum_n", F.sum("n_toks").over(wo))
        .withColumn("cum_v", F.sum("n_new").over(wo))
        .where((F.col("cum_n") > 0) & (F.col("cum_v") > 0))
        .select(
            F.log(F.col("cum_n").cast("double")).alias("lx"),
            F.log(F.col("cum_v").cast("double")).alias("ly"),
        )
    )
    fit = pts.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    return fit.where(F.col("k") >= 2).select(
        F.col("k").cast("long").alias("n_points"),
        F.round(F.expr(_OLS_SLOPE), 5).alias("heaps_beta"),
        F.round(F.exp(F.expr(_OLS_INTERCEPT)), 4).alias("heaps_k"),
    )


def zipf_slope(
    docs: DataFrame,
    text_col: str = "text",
    min_freq: int = 2,
    top_k: int = 10000,
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus term distribution:
    freq(rank) ≈ C * rank^slope, fit as OLS of ln freq on ln rank with a
    deterministic rank (frequency desc, term asc — integer-exact, no
    float tie ambiguity). Natural language sits near slope ≈ -1;
    machine-generated or deduplicated-to-death corpora drift away. Terms
    below ``min_freq`` are dropped (the hapax tail is noise for the fit)
    and the fit uses the deterministic top-``top_k`` ranks (freq desc,
    term asc) — the standard head-of-the-distribution fit.

    Scale shape: ONE token-volume exchange to term counts (map-side
    partial agg), then ORDER BY + LIMIT top_k is a distributed
    take-ordered (per-partition top-k, merged on the driver-side sort),
    so the only single-partition window runs over <= top_k rows — never
    the full vocabulary. Output is one row.
    """
    from pyspark.sql import Window

    tf = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("_tok"))
        .groupBy("_tok")
        .agg(F.count("*").cast("long").alias("freq"))
        .where(F.col("freq") >= min_freq)
        .orderBy(F.col("freq").desc(), F.col("_tok").asc())
        .limit(top_k)
    )
    wr = Window.orderBy(F.col("freq").desc(), F.col("_tok").asc())
    pts = tf.withColumn("rank", F.row_number().over(wr)).select(
        F.log(F.col("rank").cast("double")).alias("lx"),
        F.log(F.col("freq").cast("double")).alias("ly"),
    )
    fit = pts.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    return fit.where(F.col("k") >= 2).select(
        F.col("k").cast("long").alias("n_terms"),
        F.round(F.expr(_OLS_SLOPE), 5).alias("zipf_slope"),
        F.round(F.expr(_OLS_INTERCEPT), 5).alias("zipf_intercept"),
    )


def js_divergence_by_source(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Jensen-Shannon divergence of each source's term distribution from
    the whole-corpus distribution — the text-side drift detector (the
    sibling of the PSI drift op on series): a source whose vocabulary
    usage diverges from the corpus scores high; JSD is symmetric and
    bounded by ln 2.

    Absent-term handling without a full outer join: for terms the source
    never uses, p=0 and the JSD contribution reduces to 0.5*ln2*q, so
    the absent-term mass is 0.5*ln2*(1 - sum of corpus probability the
    source DOES cover) — only present (source, term) rows are ever
    materialized.

    Scale shape: ONE token-volume exchange to (source, term) counts
    (map-side partial agg); corpus totals are window sums over the
    |sources|*|vocab| count table; the JSD is a per-source sum over that
    table. Counts are exact integers; the ln-sum is rounded like every
    entropy in this engine.
    """
    from pyspark.sql import Window

    t = docs.select(
        F.col(source_col).alias("src"),
        F.explode(tokens(F.col(text_col))).alias("_tok"),
    )
    st = t.groupBy("src", "_tok").agg(
        F.count("*").cast("long").alias("n_st")
    )
    wt = Window.partitionBy("_tok")
    ws = Window.partitionBy("src")
    # corpus total as a broadcast 1-row dim (the bm25 corpus-stats idiom)
    # instead of an unpartitioned window that would single-partition the
    # (source, term) table at scale
    n_all_df = st.agg(F.sum("n_st").alias("n_all"))
    st = (
        st.withColumn("n_t", F.sum("n_st").over(wt))
        .withColumn("n_s", F.sum("n_st").over(ws))
        .crossJoin(F.broadcast(n_all_df))
    )
    p = F.col("n_st").cast("double") / F.col("n_s").cast("double")
    q = F.col("n_t").cast("double") / F.col("n_all").cast("double")
    m = (p + q) / F.lit(2.0)
    term = F.lit(0.5) * p * F.log(p / m) + F.lit(0.5) * q * F.log(q / m)
    g = st.groupBy("src").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.max("n_s").alias("n_tokens"),
        F.sum(term).alias("jsd_present"),
        F.sum(q).alias("q_covered"),
    )
    ln2 = 0.6931471805599453
    jsd = F.col("jsd_present") + F.lit(0.5) * F.lit(ln2) * (
        F.lit(1.0) - F.col("q_covered")
    )
    return g.select(
        F.col("src").alias("source"),
        "n_terms",
        "n_tokens",
        F.round(jsd + F.lit(1e-9), 5).alias("jsd"),
        F.round(jsd / F.lit(ln2) + F.lit(1e-9), 5).alias("jsd_norm"),
    )


def bigram_cross_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_bigrams: int = 2,
) -> DataFrame:
    """Per-document bigram cross-entropy against the corpus's own add-1
    smoothed bigram model — the perplexity-filtering step of a training
    -data pipeline (CCNet-style): documents whose word transitions
    surprise the corpus model (gibberish, boilerplate soup, wrong
    language) score high and get filtered.

    xent(doc) = -mean over the doc's bigrams of ln p(v|u), with
    p(v|u) = (c(u,v) + 1) / (c(u) + |V|) — all counts exact BIGINTs, so
    every probability divides identical integers on any engine; the only
    float accumulation is the per-doc ln-sum (round + nudge).

    Scale shape: bigrams are ROW-LOCAL — adjacent elements of each doc's
    token array paired inside one projection (the lead-window shuffle of
    the exploded token stream this used to pay carried strictly more
    bytes than the corpus itself); ONE doc-keyed exchange of the raw
    docs both parallelizes the build and leaves the per-doc scoring
    groupBy co-partitioned (no second doc exchange), ONE (u,v)-keyed
    exchange counts bigrams (map-side partial agg), the unigram side
    reuses the same counts (sum over v), |V| rides a broadcast 1-row
    dim; scoring joins each doc bigram to its corpus count (tiny build
    side — AQE broadcasts it).
    """
    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ta = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).repartition(n_part, id_col)
    bg = ta.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(slice(_toks, 1, greatest(size(_toks) - 1, 0)),"
                " (t, i) -> struct(t AS u, _toks[i + 1] AS v))"
            )
        ).alias("_b"),
    ).select(id_col, "_b.u", "_b.v")
    c2 = bg.groupBy("u", "v").agg(F.count("*").cast("long").alias("c_uv"))
    c1 = c2.groupBy("u").agg(F.sum("c_uv").alias("c_u"))
    vocab = ta.select(F.explode("_toks").alias("tok")).agg(
        F.countDistinct("tok").cast("long").alias("v_size")
    )
    scored = (
        bg.join(c2, ["u", "v"])
        .join(c1, "u")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "lp",
            F.log(
                (F.col("c_uv") + 1).cast("double")
                / (F.col("c_u") + F.col("v_size")).cast("double")
            ),
        )
    )
    g = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("lp").alias("lp_sum"),
    )
    nn = F.col("n_bigrams").cast("double")
    return g.where(F.col("n_bigrams") >= min_bigrams).select(
        id_col,
        "n_bigrams",
        F.round(-F.col("lp_sum") / nn + F.lit(1e-9), 5).alias("xent"),
        F.round(
            F.exp(-F.col("lp_sum") / nn) + F.lit(1e-9), 4
        ).alias("ppl"),
    )


def source_vocab_overlap(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    min_vocab: int = 2,
) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources: |V_a ∩ V_b| /
    |V_a ∪ V_b| over each source's distinct token set — the
    dedup-planning map (sources that share most of their vocabulary are
    the first place cross-source near-duplicates hide) and the
    corpus-mixing diagnostic next to the JSD drift score.

    Counts are exact BIGINTs: intersections come from ONE token-keyed
    self-join of the deduped (source, token) table (co-partitioned by
    token), unions from |A| + |B| - |A∩B|. Output is |sources|² rows.
    """
    st = (
        docs.select(
            F.col(source_col).alias("src"),
            F.explode(tokens(F.col(text_col))).alias("_tok"),
        )
        .distinct()
    )
    sizes = st.groupBy("src").agg(F.count("*").cast("long").alias("v_size"))
    a, b = st.alias("a"), st.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a._tok") == F.col("b._tok"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(F.col("a.src").alias("src_a"), F.col("b.src").alias("src_b"))
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    sa = sizes.select(
        F.col("src").alias("src_a"), F.col("v_size").alias("v_a")
    )
    sb = sizes.select(
        F.col("src").alias("src_b"), F.col("v_size").alias("v_b")
    )
    g = inter.join(sa, "src_a").join(sb, "src_b")
    union = F.col("v_a") + F.col("v_b") - F.col("n_inter")
    return g.where(
        (F.col("v_a") >= min_vocab) & (F.col("v_b") >= min_vocab)
    ).select(
        "src_a",
        "src_b",
        "v_a",
        "v_b",
        "n_inter",
        F.round(
            F.col("n_inter").cast("double") / union.cast("double")
            + F.lit(1e-9),
            6,
        ).alias("jaccard"),
    )
