"""textops unit tests against hand-computed / pure-pandas oracles."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tsengine import textops

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "a"),
    (1, "the quick brown fox jumps over the lazy dog", "a"),   # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog", "a"),   # near dup
    (3, "spark rolls series up into tiers quickly today", "b"),
    (4, "el la los de que hola mundo", "b"),
    (5, "one", "b"),                                            # < 3 tokens
    (6, "  spaced   out   tokens  ", "b"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_exact_dedup(docs, spark):
    g = textops.exact_dedup_groups(docs).toPandas().set_index("text_hash")
    h = hashlib.md5(DOCS[0][1].encode()).hexdigest()
    assert g.loc[h, "dup_count"] == 2
    assert g.loc[h, "keep_id"] == 0
    kept = textops.drop_exact_dups(docs).toPandas()
    assert len(kept) == len(DOCS) - 1
    assert 1 not in set(kept["doc_id"])


def test_tokens_handles_whitespace(docs):
    t = textops.token_stats(docs).toPandas().set_index("doc_id")
    assert t.loc[6, "n_tokens"] == 3
    assert t.loc[5, "n_tokens"] == 1
    assert t.loc[0, "n_tokens"] == 9
    assert t.loc[0, "n_uniq_tokens"] == 8  # 'the' twice


def test_minhash_identical_docs_equal_sigs(docs):
    s = textops.minhash_signature(docs, k=4).toPandas().set_index("doc_id")
    for i in range(4):
        assert s.loc[0, f"sig_{i}"] == s.loc[1, f"sig_{i}"]
    # oracle: sig_0 of doc 0 = min md5-60bit of 'tok:0' over distinct tokens
    toks = set(DOCS[0][1].split())
    assert s.loc[0, "sig_0"] == min(_h60(t + ":0") for t in toks)


def test_minhash_shingles(docs):
    s = textops.minhash_signature(docs, k=2, shingle_n=3).toPandas().set_index("doc_id")
    toks = DOCS[0][1].split()
    shs = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    assert s.loc[0, "sig_0"] == min(_h60(sh + ":0") for sh in shs)
    import pandas as pd

    assert pd.isna(s.loc[5, "sig_0"])  # doc with <3 tokens has no shingles


def test_lsh_finds_exact_and_near_dups(docs):
    sigs = textops.minhash_signature(docs, k=8)
    pairs = textops.lsh_candidate_pairs(sigs, k=8, band_size=2).toPandas()
    pairset = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 1) in pairset  # exact dup always collides in every band
    row = pairs[(pairs["doc_a"] == 0) & (pairs["doc_b"] == 1)]
    assert float(row["est_jaccard"].iloc[0]) == 1.0


def test_simhash_properties(docs):
    s = textops.simhash(docs, bits=16).toPandas().set_index("doc_id")
    assert s.loc[0, "simhash"] == s.loc[1, "simhash"]
    assert 0 <= s.loc[0, "simhash"] < 2**16
    # near-dup docs should be close in hamming
    h0, h2 = int(s.loc[0, "simhash"]), int(s.loc[2, "simhash"])
    assert bin(h0 ^ h2).count("1") <= 8


def test_hamming_neighbors(docs):
    sim = textops.simhash(docs, bits=16)
    n = textops.hamming_neighbors(sim, max_dist=0, bits=16).toPandas()
    assert {(0, 1)} <= {(a, b) for a, b in zip(n["doc_a"], n["doc_b"])}


def test_hamming_neighbors_banded_equals_bruteforce(spark):
    """Pigeonhole banding must return EXACTLY the brute-force pair set."""
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu"]
    rows = []
    for i in range(48):
        # overlapping word subsets → a realistic spread of hamming distances
        txt = " ".join(words[j] for j in range(12) if (i >> (j % 6)) & 1 or j % 3 == i % 3)
        rows.append((i, txt or "empty", "x"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sim = textops.simhash(docs, bits=16)
    hashes = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    for md in (1, 3, 5):
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in textops.hamming_neighbors(sim, max_dist=md, bits=16).collect()
        }
        want = set()
        ids = sorted(hashes)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                d = bin(hashes[ids[ai]] ^ hashes[ids[bi]]).count("1")
                if d <= md:
                    want.add((ids[ai], ids[bi], d))
        assert got == want, f"max_dist={md}: banded != brute force"


def test_hamming_neighbors_bucket_cap(spark):
    """max_bucket drops oversized band buckets instead of exploding them."""
    rows = [(i, "same same same text", "x") for i in range(20)]
    rows.append((99, "utterly different words entirely", "x"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sim = textops.simhash(docs, bits=16)
    capped = textops.hamming_neighbors(sim, max_dist=3, bits=16, max_bucket=5).toPandas()
    # the 20-identical cluster (190 pairs) is dropped by the cap
    assert len(capped) == 0
    uncapped = textops.hamming_neighbors(sim, max_dist=3, bits=16).toPandas()
    assert len(uncapped) == 190


def test_lsh_pairs_null_sig_docs_excluded(spark):
    """Docs with no shingles (NULL sigs) must not form a degenerate bucket."""
    rows = [(0, "one", "x"), (1, "two", "x"), (2, "thr", "x"),
            (3, "a much longer doc with plenty of words inside it", "x")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sigs = textops.minhash_signature(docs, k=4, shingle_n=3)
    pairs = textops.lsh_candidate_pairs(sigs, k=4, band_size=2).toPandas()
    assert len(pairs) == 0  # the three <3-token docs never pair up


def test_ngram_jaccard(docs):
    p = textops.ngram_jaccard_pairs(docs, n=3, block_col="source").toPandas()
    d = {(a, b): j for a, b, j in zip(p["doc_a"], p["doc_b"], p["jaccard"])}
    assert d[(0, 1)] == 1.0
    # doc 0 vs 2: 7 shingles each, oracle intersection
    t0, t2 = DOCS[0][1].split(), DOCS[2][1].split()
    s0 = {" ".join(t0[i : i + 3]) for i in range(len(t0) - 2)}
    s2 = {" ".join(t2[i : i + 3]) for i in range(len(t2) - 2)}
    expect = len(s0 & s2) / len(s0 | s2)
    assert abs(d[(0, 2)] - expect) < 1e-12
    # cross-block pairs must not appear
    assert all(not (a in (0, 1, 2) and b == 3) for a, b in d)


def test_lang_id(docs):
    li = textops.lang_id(docs).toPandas().set_index("doc_id")
    assert li.loc[0, "pred_lang"] == "en"
    assert li.loc[4, "pred_lang"] == "es"
    assert li.loc[3, "pred_lang"] == "und"


def test_quality_score_bounds(docs):
    qd = textops.quality_score(docs).toPandas()
    assert ((qd["quality"] >= 0) & (qd["quality"] <= 1)).all()
    # doc 0: 9 tokens, 8 uniq, 2 'the' stopwords
    r = qd.set_index("doc_id").loc[0]
    assert abs(r["uniq_ratio"] - 8 / 9) < 1e-12
    assert abs(r["stop_ratio"] - 2 / 9) < 1e-12


def test_fingerprint_stable_under_identity(docs):
    fp = textops.fingerprint(docs, window=4).toPandas().set_index("doc_id")
    assert fp.loc[0, "fingerprint"] == fp.loc[1, "fingerprint"]
    toks = DOCS[0][1].split()
    shs = {" ".join(toks[i : i + 4]) for i in range(len(toks) - 3)}
    assert fp.loc[0, "fingerprint"] == min(_h60(s) for s in shs)


def test_ngram_jaccard_lsh_composition(docs):
    """Exact-dup pair survives the LSH-candidate restriction with jaccard 1;
    every emitted pair's score equals the unrestricted exact computation."""
    p = textops.ngram_jaccard_lsh(docs, n=3, k=8, band_size=2).toPandas()
    d = {(a, b): j for a, b, j in zip(p["doc_a"], p["doc_b"], p["jaccard"])}
    assert d[(0, 1)] == 1.0
    full = textops.ngram_jaccard_pairs(docs, n=3, block_col="source").toPandas()
    fd = {(a, b): j for a, b, j in zip(full["doc_a"], full["doc_b"], full["jaccard"])}
    for pair, j in d.items():
        if pair in fd:  # same-block pairs must agree exactly
            assert abs(j - fd[pair]) < 1e-12


def test_simhash_64bit_banded_equals_bruteforce(spark):
    """Production 64-bit width: second md5 segment feeds bits 60-63, and
    pigeonhole banding still returns exactly the brute-force pair set."""
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu"]
    rows = []
    for i in range(40):
        txt = " ".join(words[j] for j in range(12) if (i >> (j % 6)) & 1 or j % 4 == i % 4)
        rows.append((i, txt or "empty", "x"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sim = textops.simhash(docs, bits=64)
    hashes = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    # two's-complement 64-bit: negatives allowed, value fits in int64
    assert all(-(2**63) <= h < 2**63 for h in hashes.values())
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in textops.hamming_neighbors(sim, max_dist=5, bits=64).collect()
    }
    want = set()
    ids = sorted(hashes)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            d = bin((hashes[ids[ai]] ^ hashes[ids[bi]]) & (2**64 - 1)).count("1")
            if d <= 5:
                want.add((ids[ai], ids[bi], d))
    assert got == want


def test_bucket_cap_dropped_metrics(spark):
    """Caps are never silent: the dropped-metrics row must count the hot
    bucket and its rows for both LSH pairing and simhash banding."""
    rows = [(i, "same same same text", "x") for i in range(20)]
    rows.append((99, "utterly different words entirely", "x"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    sim = textops.simhash(docs, bits=16)
    pairs, dropped = textops.hamming_neighbors(
        sim, max_dist=3, bits=16, max_bucket=5, return_dropped=True
    )
    m = dropped.collect()[0]
    # the 20-identical cluster occupies all 4 bands' buckets (20 rows each;
    # the outlier doc may collide into a cluster bucket in some bands)
    assert m["n_buckets_dropped"] == 4
    assert 80 <= m["n_rows_dropped"] <= 84
    assert pairs.count() == 0

    sigs = textops.minhash_signature(docs, k=4, shingle_n=2)
    lsh_pairs, lsh_dropped = textops.lsh_candidate_pairs(
        sigs, k=4, band_size=2, max_bucket=5, return_dropped=True
    )
    lm = lsh_dropped.collect()[0]
    assert lm["n_buckets_dropped"] == 2  # 2 bands, one hot bucket each
    assert lm["n_rows_dropped"] == 40
    assert lsh_pairs.count() == 0

    # no cap → explicit zero metrics, not a missing signal
    _, none_dropped = textops.hamming_neighbors(
        sim, max_dist=3, bits=16, return_dropped=True
    )
    nm = none_dropped.collect()[0]
    assert nm["n_buckets_dropped"] == 0 and nm["n_rows_dropped"] == 0


def test_bucket_cap_observed_metrics_free(spark):
    """The Observation path yields the same dropped metrics as the
    DataFrame path, DURING the kept-side action — no second banding
    pass."""
    from pyspark.sql import Observation

    rows = [(i, "b1" if i < 7 else ("b2" if i < 10 else f"u{i}")) for i in range(14)]
    bands = spark.createDataFrame(rows, "doc_id long, bucket string")
    obs = Observation()
    kept, dropped_df = textops.bucket_cap(bands, ["bucket"], 3, observation=obs)
    kept_rows = kept.count()  # the ONE action; metrics ride along
    assert kept_rows == 7  # b2 (3 rows, at the cap) + 4 singletons survive
    got = obs.get
    want = dropped_df.collect()[0]
    assert got["n_buckets_dropped"] == want["n_buckets_dropped"] == 1
    assert got["n_rows_dropped"] == want["n_rows_dropped"] == 7

    # nothing over the cap → explicit zeros from the observation too
    obs2 = Observation()
    kept2, _ = textops.bucket_cap(bands, ["bucket"], 100, observation=obs2)
    assert kept2.count() == 14
    assert obs2.get["n_buckets_dropped"] == 0
    assert obs2.get["n_rows_dropped"] == 0


def test_pairer_observed_metrics_passthrough(spark):
    """Both pair generators forward ``observation`` to their bucket cap:
    consuming the pairs fills the drop metrics in the same action, and
    the numbers equal the DataFrame-path metrics.

    The corpus keeps one surviving near-dup pair alongside the capped
    mega-cluster: if the cap emptied the ENTIRE result, AQE's
    empty-relation propagation would skip the observed branch and the
    metric would never fire (documented bucket_cap caveat — the metrics
    DataFrame is the fallback for that degenerate case)."""
    from pyspark.sql import Observation

    rows = [(i, "same same same text", "x") for i in range(20)]
    rows += [
        (100, "alpha beta gamma delta epsilon zeta", "x"),
        (101, "alpha beta gamma delta epsilon zetb", "x"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    sim = textops.simhash(docs, bits=16)
    obs = Observation()
    pairs, dropped = textops.hamming_neighbors(
        sim, max_dist=3, bits=16, max_bucket=5,
        return_dropped=True, observation=obs,
    )
    assert pairs.count() == 1  # the one action; (100, 101) survives
    want = dropped.collect()[0]
    assert obs.get["n_buckets_dropped"] == want["n_buckets_dropped"] == 4
    assert obs.get["n_rows_dropped"] == want["n_rows_dropped"]

    sigs = textops.minhash_signature(docs, k=4, shingle_n=2)
    obs2 = Observation()
    lsh_pairs, lsh_dropped = textops.lsh_candidate_pairs(
        sigs, k=4, band_size=2, max_bucket=5,
        return_dropped=True, observation=obs2,
    )
    assert lsh_pairs.count() == 1
    lw = lsh_dropped.collect()[0]
    assert obs2.get["n_buckets_dropped"] == lw["n_buckets_dropped"] == 2
    assert obs2.get["n_rows_dropped"] == lw["n_rows_dropped"] == 40


def test_dedup_components_nonconvergence_raises(spark):
    """A chain deeper than max_iter must raise (no silently-partial
    labels), and a convergent run under the same cap must not."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        textops.dedup_components(chain, max_iter=2)
    comp = {r["doc_id"]: r["component"]
            for r in textops.dedup_components(chain, max_iter=10).collect()}
    assert set(comp.values()) == {0}


def test_drop_near_dups_greedy_policy(spark):
    """doc_b of every pair is dropped; chain a-b-c drops both b and c."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}", "x") for i in range(5)],
        "doc_id long, text string, source string",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2)], "doc_a long, doc_b long"
    )
    kept = sorted(r["doc_id"] for r in textops.drop_near_dups(docs, pairs).collect())
    assert kept == [0, 3, 4]


def test_dedup_components_transitive(spark):
    """Chains group transitively to the smallest id; disjoint clusters
    keep separate labels; isolated docs never appear."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (5, 6)], "doc_a long, doc_b long"
    )
    comp = {r["doc_id"]: r["component"]
            for r in textops.dedup_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_bm25_ranks_rare_distinctive_term_first(spark):
    # "zebra" appears only in doc 1 (rare -> high idf); "common" is in
    # every doc (df = N -> idf = ln(1 + 0.5/(N+0.5)) ~ 0) and must rank
    # below it despite equal tf
    docs = spark.createDataFrame(
        [
            (1, "common zebra zebra common alpha"),
            (2, "common beta beta"),
            (3, "common gamma"),
        ],
        "doc_id long, text string",
    )
    from tsengine.textops import bm25_terms

    out = bm25_terms(docs, top_t=2)
    top = {
        r["doc_id"]: r["term"]
        for r in out.where(F.col("rank") == 1).collect()
    }
    assert top[1] == "zebra"
    assert top[2] == "beta"
    assert top[3] == "gamma"
    # scores positive for rare terms, and every doc returns <= top_t rows
    rows = out.collect()
    assert all(r["score"] > 0 for r in rows if r["term"] != "common")
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_doc.values())


def test_train_split_deterministic_and_exhaustive(docs):
    out = textops.train_split(docs.select("doc_id")).toPandas().set_index("doc_id")
    # oracle: bucket = md5-60bit of "id:v1" % 10000; boundaries 9000/9500
    for i, _, _ in DOCS:
        b = _h60(f"{i}:v1") % 10000
        assert out.loc[i, "bucket"] == b
        want = "train" if b < 9000 else ("val" if b < 9500 else "test")
        assert out.loc[i, "split"] == want
    # stability: a second invocation with the same salt is identical
    again = textops.train_split(docs.select("doc_id")).toPandas().set_index("doc_id")
    assert (out["split"] == again["split"]).all()
    # a different salt draws a different (independent) split
    other = textops.train_split(docs.select("doc_id"), salt="v2").toPandas()
    assert (other.set_index("doc_id")["bucket"] != out["bucket"]).any()


def test_pack_sequences_concat_and_chunk(spark):
    rows = [(0, "a " * 10), (4, "b " * 50), (8, "c " * 70), (12, ""), (16, "d " * 3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        textops.pack_sequences(docs, budget=64, n_shards=4)
        .toPandas().set_index("doc_id").sort_index()
    )
    # all ids ≡ 0 mod 4 → one shard, laid out in id order: 10,50,70,0,3
    assert (out["shard"] == 0).all()
    assert out.loc[0, "offset"] == 0 and out.loc[0, "n_chunks"] == 1
    assert out.loc[4, "offset"] == 10
    # doc 4 spans tokens [10, 59] → chunk 0 only
    assert out.loc[4, "first_chunk"] == 0 and out.loc[4, "last_chunk"] == 0
    # doc 8 spans [60, 129] → chunks 0..2 (boundary at 64 and 128)
    assert out.loc[8, "first_chunk"] == 0
    assert out.loc[8, "last_chunk"] == 2
    assert out.loc[8, "n_chunks"] == 3
    # empty doc occupies no axis space
    assert out.loc[12, "n_tokens"] == 0 and out.loc[12, "n_chunks"] == 0
    assert out.loc[12, "offset"] == 130 and out.loc[16, "offset"] == 130


def test_contamination_flags_ngram_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon leaked verbatim run"),  # 2 shared 4-grams
            (1, "alpha beta gamma changed delta epsilon zeta eta"),     # 1 shared ("beta gamma"? no: 4-grams)
            (2, "totally unrelated words here none shared at all"),
        ],
        "doc_id long, text string",
    )
    out = textops.contamination(docs, bench, n=4, min_overlap=2).toPandas().set_index("doc_id")
    # doc 0 shares "alpha beta gamma delta" and "beta gamma delta epsilon"
    assert out.loc[0, "n_overlap"] == 2 and bool(out.loc[0, "contaminated"])
    # doc 1's only benchmark 4-gram is "delta epsilon zeta eta"? bench has
    # "gamma delta epsilon zeta" — doc 1 has "delta epsilon zeta eta" (not in
    # bench) and "changed delta epsilon zeta"(no) → exactly 1: "alpha beta gamma changed"? no.
    assert out.loc[1, "n_overlap"] < 2 and not bool(out.loc[1, "contaminated"])
    assert out.loc[2, "n_overlap"] == 0 and not bool(out.loc[2, "contaminated"])


def test_repetition_stats_top_gram(spark):
    docs = spark.createDataFrame(
        [
            (0, "spam ham spam ham spam ham"),   # "spam ham" ×3, "ham spam" ×2
            (1, "all words unique in this doc"),
            (2, "one"),                           # < 2 tokens
        ],
        "doc_id long, text string",
    )
    out = textops.repetition_stats(docs, n=2).toPandas().set_index("doc_id")
    assert out.loc[0, "top_gram"] == "spam ham" and out.loc[0, "top_cnt"] == 3
    n_chars = len("spam ham spam ham spam ham")
    assert abs(out.loc[0, "rep_frac"] - round(3 * len("spam ham") / n_chars, 6)) < 1e-9
    # unique doc: every 2-gram count 1, tie broken by gram string asc
    assert out.loc[1, "top_cnt"] == 1
    assert out.loc[1, "top_gram"] == "all words"
    # sub-n doc: empty gram, zero metrics
    assert out.loc[2, "top_gram"] == "" and out.loc[2, "top_cnt"] == 0
    assert out.loc[2, "rep_frac"] == 0.0


def test_pii_scrub_masks_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail a.b+c@ex-1.org and b@x.io, ip 10.0.0.1, acct 123456789"),
            (1, "clean prose with short 12345 number and version 1.2.3"),
            (2, "123456789@bank.example digits belong to the email"),
        ],
        "doc_id long, text string",
    )
    out = textops.pii_scrub(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "n_email"] == 2
    assert out.loc[0, "n_ipv4"] == 1
    assert out.loc[0, "n_longnum"] == 1
    assert out.loc[0, "has_pii"] == 1
    assert out.loc[0, "clean_text"] == "mail <EMAIL> and <EMAIL>, ip <IP>, acct <NUM>"
    # clean doc: nothing matches (5 digits < 9; 1.2.3 is not a dotted quad)
    assert out.loc[1, "has_pii"] == 0
    assert out.loc[1, "clean_text"] == docs.collect()[1]["text"]
    # sequential semantics: the email eats its own digit run — the 9-digit
    # local part is NOT double-reported as a longnum
    assert out.loc[2, "n_email"] == 1
    assert out.loc[2, "n_longnum"] == 0
    assert out.loc[2, "clean_text"] == "<EMAIL> digits belong to the email"


def test_pii_scrub_mask_token_invariant(docs):
    # Σcounts == number of mask tokens present in clean_text, per contract
    import re

    out = textops.pii_scrub(docs).toPandas()
    for _, r in out.iterrows():
        n_masks = len(re.findall(r"<EMAIL>|<IP>|<NUM>", r["clean_text"]))
        assert r["n_email"] + r["n_ipv4"] + r["n_longnum"] == n_masks


def test_corpus_sample_rates_and_weights(spark):
    docs = spark.createDataFrame(
        [(i, "web" if i % 2 == 0 else "books") for i in range(2000)],
        "doc_id long, source string",
    )
    out = textops.corpus_sample(
        docs, {"web": 0.1, "books": 1.0}, default_rate=0.5
    ).toPandas()
    web = out[out.source == "web"]
    books = out[out.source == "books"]
    # rate 1.0 keeps everything; weight exactly 1
    assert books.kept.all() and (books.weight == 1.0).all()
    # rate 0.1 keeps ~10% (hash-uniform; wide tolerance on 1000 docs)
    frac = web.kept.mean()
    assert 0.05 < frac < 0.16
    assert (web.loc[web.kept == 1, "weight"] == 10.0).all()
    assert (web.loc[web.kept == 0, "weight"] == 0.0).all()
    # decisions are the pure hash rule — bit-stable across invocations
    again = textops.corpus_sample(
        docs, {"web": 0.1, "books": 1.0}, default_rate=0.5
    ).toPandas()
    assert (out.sort_values("doc_id").kept.values
            == again.sort_values("doc_id").kept.values).all()
    # unknown domain falls back to default_rate's cut
    extra = spark.createDataFrame([(9999, "unknown")], "doc_id long, source string")
    row = textops.corpus_sample(
        extra, {"web": 0.1}, default_rate=1.0
    ).collect()[0]
    assert row["kept"] == 1 and row["weight"] == 1.0


def test_corpus_sample_rejects_out_of_range_rates(spark):
    import pytest as _pytest
    docs = spark.createDataFrame([(1, "web")], "doc_id long, source string")
    for bad in ({"web": 2.0}, {"web": 0.0}, {"web": -0.5}):
        with _pytest.raises(ValueError):
            textops.corpus_sample(docs, bad)
    with _pytest.raises(ValueError):
        textops.corpus_sample(docs, {"web": 0.5}, default_rate=0.0)


# ------------------------------------------------------ URL canonical ---

def test_url_canonicalize_rules(spark):
    cases = [
        # (raw, expected canonical)
        ("HTTP://WWW.Example.COM:80/a//b/?b=2&a=1#frag",
         "http://example.com/a/b?a=1&b=2"),
        ("https://Example.com:443/", "https://example.com/"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/?utm_source=a&utm_campaign=b",
         "http://example.com/"),
        ("http://example.com/p?ref=x&z=9&fbclid=abc&gclid=1&a=2",
         "http://example.com/p?a=2&z=9"),
        # path case is significant and preserved
        ("http://example.com/CaseSensitive/Path",
         "http://example.com/CaseSensitive/Path"),
        # trailing slash collapses, root does not
        ("http://example.com/a/", "http://example.com/a"),
        ("http://example.com///", "http://example.com/"),
        # empty params dropped, survivors byte-sorted
        ("http://example.com/p?&b=1&&a=2&", "http://example.com/p?a=2&b=1"),
    ]
    df = spark.createDataFrame(
        [(i, r) for i, (r, _) in enumerate(cases)], "doc_id long, url string"
    )
    got = {
        r["doc_id"]: r["canon_url"]
        for r in textops.url_canonicalize(df).collect()
    }
    for i, (raw, want) in enumerate(cases):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_url_dedup_stats_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [
            (3, "http://www.Example.com/a?b=2&a=1"),
            (7, "HTTP://example.COM:80/a/?a=1&b=2#x"),
            (5, "https://other.org/q"),
        ],
        "doc_id long, url string",
    )
    got = {r["canon_url"]: r for r in textops.url_dedup_stats(df).collect()}
    assert got["http://example.com/a?a=1&b=2"]["n_dups"] == 2
    assert got["http://example.com/a?a=1&b=2"]["keep_id"] == 3
    assert got["https://other.org/q"]["n_dups"] == 1


# ------------------------------------------------------ inverted index ---

def test_build_postings_ranks_and_gates(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana apple cherry"),
            (3, "banana banana durian"),
            (4, "unique"),
        ],
        "doc_id long, text string",
    )
    got = textops.build_postings(docs, top_p=2, min_df=2,
                                 max_df_frac=0.6).collect()
    by_term = {}
    for r in got:
        by_term.setdefault(r["term"], []).append(r)
    # banana df=3 > 0.6*4=2.4 -> stopword-pruned; unique/cherry/durian
    # df=1 < min_df -> pruned; apple df=2 survives
    assert set(by_term) == {"apple"}
    rows = sorted(by_term["apple"], key=lambda r: r["rank"])
    # top-2 of apple's 3 postings, (doc, pos)-ranked; cf counts all 3
    assert [(r["rank"], r["doc_id"], r["pos"]) for r in rows] == [
        (1, 1, 0), (2, 1, 2)]
    assert rows[0]["df"] == 2 and rows[0]["cf"] == 3


# ---------------------------------------------------------- doc chunking ---

def test_chunk_documents_windows_and_tail(spark):
    # 11 tokens, chunk=4, overlap=1 -> stride 3, last = ceil(7/3) = 3
    text = " ".join(f"t{i}" for i in range(11))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(textops.chunk_documents(docs, chunk_tokens=4,
                                         overlap=1).collect(),
                 key=lambda r: r["chunk_idx"])
    assert [r["start_tok"] for r in got] == [0, 3, 6, 9]
    assert [r["n_tok"] for r in got] == [4, 4, 4, 2]   # tail remainder
    assert got[0]["chunk_text"] == "t0 t1 t2 t3"
    assert got[1]["chunk_text"] == "t3 t4 t5 t6"       # 1-token overlap
    assert got[3]["chunk_text"] == "t9 t10"
    assert all(r["n_chunks"] == 4 for r in got)


def test_chunk_documents_short_doc_single_chunk(spark):
    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, "")],
        "doc_id long, text string")
    got = textops.chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
    rows = [r for r in got if r["doc_id"] == 1]
    assert len(rows) == 1 and rows[0]["n_tok"] == 3
    assert rows[0]["chunk_text"] == "only three tokens"
    assert not [r for r in got if r["doc_id"] == 2]  # empty doc -> no chunks


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        textops.chunk_documents(docs, chunk_tokens=4, overlap=4)


# ---------------------------------------------------------------------------
# Feature-hashing embedding
# ---------------------------------------------------------------------------


def test_hash_embed_unit_norm_and_determinism(spark):
    import numpy as np
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "alpha beta gamma delta epsilon",
                    "alpha alpha alpha",
                    "one two three four five six seven eight nine ten",
                ],
            }
        )
    )
    out = textops.hash_embed(docs, dim=16).toPandas()
    for did, g in out.groupby("doc_id"):
        assert abs(np.sqrt((g["val"] ** 2).sum()) - 1.0) < 1e-5
    # repeated token: one support row, |val| = 1
    d2 = out[out["doc_id"] == 2]
    assert len(d2) == 1 and abs(abs(d2["val"].iloc[0]) - 1.0) < 1e-9
    assert abs(int(d2["raw"].iloc[0])) == 3
    # deterministic across calls
    again = textops.hash_embed(docs, dim=16).toPandas()
    a = out.sort_values(["doc_id", "dim_idx"]).reset_index(drop=True)
    b = again.sort_values(["doc_id", "dim_idx"]).reset_index(drop=True)
    assert a.equals(b)


def test_hash_embed_similar_docs_closer(spark):
    import numpy as np
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox leaps over the lazy dog",
                    "completely unrelated words about spark engines",
                ],
            }
        )
    )
    out = textops.hash_embed(docs, dim=16).toPandas()

    def vec(did):
        v = np.zeros(16)
        g = out[out["doc_id"] == did]
        v[g["dim_idx"].to_numpy()] = g["val"].to_numpy()
        return v

    v1, v2, v3 = vec(1), vec(2), vec(3)
    assert v1 @ v2 > v1 @ v3
