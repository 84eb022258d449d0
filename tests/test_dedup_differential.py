"""Differential correctness for the MinHash→LSH→Jaccard pipeline
(functions/dedup.py): a pure-Python replica of the signature scheme
(one md5 per shingle, rotation-derived seeds, lexicographic hex min,
banded bucket candidates, exact shingle Jaccard) computes the expected
pair set for seeded random corpora with planted near-duplicates; the
Spark pipeline must return exactly that set.  This pins the operator's
END-TO-END contract — the DuckDB oracle pins it on the driver corpus,
this pins it on adversarially-shaped ones (heavy dup clusters, short
docs below the shingle width, disjoint vocabulary)."""

import hashlib
import itertools
import random

import pytest
from pyspark.sql import functions as F

from trafilatura_spark.functions.dedup import near_duplicate_pairs

N_HASHES = 8
BAND_SIZE = 2
K = 3


def _shingles(text: str) -> set:
    words = text.split(" ")
    if len(words) < K:
        return {text}
    return {" ".join(words[i:i + K]) for i in range(len(words) - K + 1)}


def _signature(text: str) -> list:
    digests = [hashlib.md5(s.encode()).hexdigest() for s in _shingles(text)]
    return [min(h[4 * s:] + h[:4 * s] for h in digests)
            for s in range(N_HASHES)]


def _bands(sig: list) -> set:
    return {(i, hashlib.md5("|".join(sig[i * BAND_SIZE:(i + 1) * BAND_SIZE])
                            .encode()).hexdigest())
            for i in range(len(sig) // BAND_SIZE)}


def _expected_pairs(docs: dict, threshold: float) -> set:
    sigs = {d: _signature(t) for d, t in docs.items()}
    bands = {d: _bands(s) for d, s in sigs.items()}
    out = set()
    # the operator orders pairs by STRING id (sort_array over a string
    # column), so the replica must too
    for a, b in itertools.combinations(sorted(docs, key=str), 2):
        if not (bands[a] & bands[b]):
            continue
        sa, sb = _shingles(docs[a]), _shingles(docs[b])
        j = round(len(sa & sb) / len(sa | sb), 6)
        if j >= threshold:
            out.add((str(a), str(b), j))
    return out


def _corpus(seed: int) -> dict:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(60)]
    docs = {}
    doc_id = 0
    for _ in range(12):
        base = [rng.choice(vocab) for _ in range(rng.randint(1, 30))]
        docs[doc_id] = " ".join(base)
        doc_id += 1
        # planted near-dups: perturb 0-3 positions of the base
        for _ in range(rng.randint(0, 2)):
            mut = list(base)
            for _ in range(rng.randint(0, 3)):
                if mut:
                    mut[rng.randrange(len(mut))] = rng.choice(vocab)
            docs[doc_id] = " ".join(mut)
            doc_id += 1
    return docs


@pytest.mark.parametrize("seed,threshold", [(1, 0.5), (2, 0.5), (3, 0.8)])
def test_lsh_pipeline_matches_bruteforce(spark, seed, threshold):
    docs = _corpus(seed)
    df = spark.createDataFrame(
        [(str(d), t) for d, t in docs.items()], "doc_id string, text string")
    got = {(r["id_a"], r["id_b"], r["jaccard"])
           for r in near_duplicate_pairs(df, n_hashes=N_HASHES,
                                         band_size=BAND_SIZE, k=K,
                                         threshold=threshold).collect()}
    want = _expected_pairs(docs, threshold)
    assert got == want, (got ^ want)


@pytest.mark.parametrize("seed,threshold", [(1, 0.5), (3, 0.8)])
def test_incremental_matches_full_run_restricted(spark, seed, threshold):
    """near_duplicate_pairs_incremental contract: exactly the full-run
    pairs that touch at least one new doc, same jaccard values — without
    re-signaturing the corpus.  Even ids play the existing corpus, odd
    ids the new batch (planted mutants follow their base consecutively,
    so most planted pairs CROSS the corpus/batch boundary)."""
    from trafilatura_spark.functions.dedup import (
        minhash_signatures, near_duplicate_pairs_incremental)

    docs = _corpus(seed)
    old = {d: t for d, t in docs.items() if d % 2 == 0}
    new = {d: t for d, t in docs.items() if d % 2 == 1}
    new_ids = {str(d) for d in new}
    want = {(a, b, j) for a, b, j in _expected_pairs(docs, threshold)
            if a in new_ids or b in new_ids}

    df_old = spark.createDataFrame(
        [(str(d), t) for d, t in old.items()], "doc_id string, text string")
    df_new = spark.createDataFrame(
        [(str(d), t) for d, t in new.items()], "doc_id string, text string")
    sigs = minhash_signatures(df_old, n_hashes=N_HASHES, k=K)
    got = {(r["id_a"], r["id_b"], r["jaccard"])
           for r in near_duplicate_pairs_incremental(
               df_new, df_old, sigs, n_hashes=N_HASHES,
               band_size=BAND_SIZE, k=K, threshold=threshold).collect()}
    assert got == want, (got ^ want)


def test_incremental_bucket_cap_matches_full(spark):
    """With max_bucket_size set, the incremental path must apply the cap
    to the FULL bucket (corpus + new members), i.e. match the capped
    full run restricted to new-touching pairs — Spark-vs-Spark
    differential (the Python replica does not model bucket caps)."""
    from trafilatura_spark.functions.dedup import (
        minhash_signatures, near_duplicate_pairs_incremental)

    docs = _corpus(2)
    df_all = spark.createDataFrame(
        [(str(d), t) for d, t in docs.items()], "doc_id string, text string")
    new_ids = {str(d) for d in docs if d % 2 == 1}
    full = {(r["id_a"], r["id_b"], r["jaccard"])
            for r in near_duplicate_pairs(
                df_all, n_hashes=N_HASHES, band_size=BAND_SIZE, k=K,
                threshold=0.3, max_bucket_size=3).collect()}
    want = {(a, b, j) for a, b, j in full
            if a in new_ids or b in new_ids}

    df_old = df_all.filter(~df_all["doc_id"].isin(new_ids))
    df_new = df_all.filter(df_all["doc_id"].isin(new_ids))
    sigs = minhash_signatures(df_old, n_hashes=N_HASHES, k=K)
    got = {(r["id_a"], r["id_b"], r["jaccard"])
           for r in near_duplicate_pairs_incremental(
               df_new, df_old, sigs, n_hashes=N_HASHES,
               band_size=BAND_SIZE, k=K, threshold=0.3,
               max_bucket_size=3).collect()}
    assert got == want, (got ^ want)


def test_incremental_empty_corpus_equals_full_run(spark):
    """Bootstrap case: against an empty store, the incremental path IS
    the full run (every pair touches a new doc)."""
    from trafilatura_spark.functions.dedup import (
        minhash_signatures, near_duplicate_pairs_incremental)

    docs = _corpus(1)
    df_new = spark.createDataFrame(
        [(str(d), t) for d, t in docs.items()], "doc_id string, text string")
    df_old = spark.createDataFrame([], "doc_id string, text string")
    got = {(r["id_a"], r["id_b"], r["jaccard"])
           for r in near_duplicate_pairs_incremental(
               df_new, df_old, minhash_signatures(df_old, n_hashes=N_HASHES,
                                                  k=K),
               n_hashes=N_HASHES, band_size=BAND_SIZE, k=K,
               threshold=0.5).collect()}
    assert got == _expected_pairs(docs, 0.5)


def test_repetition_stats_match_python_reference(spark):
    """repetition_stats (functions/textstats.py) differential: the
    sorted-run top-token fraction and non-overlapping n-gram duplicate
    fraction must equal a naive Counter-based Python reference on
    seeded random texts, including edge shapes (single token, all-same
    tokens, empty-ish strings, token count below the segment width)."""
    from collections import Counter

    from trafilatura_spark.functions.textstats import repetition_stats

    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = ["x", "aa", "aa aa aa aa", "aa bb", "aa bb aa bb aa"]
    texts += [" ".join(rng.choice(vocab)
                       for _ in range(rng.randint(1, 40)))
              for _ in range(60)]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["top_token_frac"], r["dup_ngram_frac"])
           for r in repetition_stats(df, ngram=2).collect()}

    for i, t in rows:
        toks = t.split(" ")
        n = len(toks)
        top = round(max(Counter(toks).values()) / n, 6)
        nseg = n // 2
        if nseg == 0:
            dup = 0.0
        else:
            segs = [" ".join(toks[j * 2:j * 2 + 2]) for j in range(nseg)]
            dup = round(1.0 - len(set(segs)) / nseg, 6)
        assert got[i] == (top, dup), (i, t, got[i], (top, dup))


def test_resolve_clusters_components_and_survivors(spark):
    """Pairs -> connected components -> canonical survivor: a chain
    (worst case for min-label propagation: convergence takes diameter
    rounds, not 1), a separate triangle clique, an isolated pair, and a
    doc in no pair (absent from the output by contract — unpaired docs
    need no survivor pick)."""
    from trafilatura_spark.functions.dedup import resolve_clusters

    pairs = spark.createDataFrame(
        [  # chain 1-2-3-4-5 (pairs only adjacent)
            (1, 2), (2, 3), (3, 4), (4, 5),
            # clique 10-11-12
            (10, 11), (11, 12), (10, 12),
            # isolated pair
            (20, 21),
        ], "id_a long, id_b long")
    got = {r["doc_id"]: (r["cluster_id"], r["is_survivor"])
           for r in resolve_clusters(pairs).collect()}
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False), 4: (1, False),
        5: (1, False),
        10: (10, True), 11: (10, False), 12: (10, False),
        20: (20, True), 21: (20, False),
    }
    # one survivor per cluster, survivor id == cluster id
    clusters = {}
    for doc, (cl, surv) in got.items():
        clusters.setdefault(cl, []).append(surv)
    assert all(sum(s) == 1 for s in clusters.values())


def test_resolve_clusters_max_iter_bounds_chains(spark):
    """max_iter caps the rounds: a 6-chain under max_iter=2 must still
    return (possibly unconverged labels), proving the loop is bounded;
    with the default budget the same chain converges exactly."""
    from trafilatura_spark.functions.dedup import resolve_clusters

    import warnings

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], "id_a long, id_b long")
    with pytest.warns(RuntimeWarning, match="max_iter"):
        bounded = resolve_clusters(chain, max_iter=2).collect()
    assert len(bounded) == 7  # every vertex labeled, loop terminated
    # a converged run must NOT warn: split clusters are the only
    # warning condition, not mere chain shape
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        full = {r["doc_id"]: r["cluster_id"]
                for r in resolve_clusters(chain).collect()}
    assert full == {i: 1 for i in range(1, 8)}


def test_simhash_banded_pairs_match_bruteforce(spark, sf_dir):
    """Pigeonhole banding is LOSSLESS at the radius (Manku et al.'s
    guarantee): banded-candidates + exact-hamming verify must equal the
    brute-force all-pairs hamming filter — at a radius dividing 32
    evenly (3 -> 4x8-bit bands), at radius 0 (one 32-bit band), and at
    a non-dividing radius (6 -> bands of 5,5,5,5,4,4,4 bits)."""
    from trafilatura_spark.functions.dedup import (
        hamming32, simhash32_table, simhash_near_duplicate_pairs)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    fps = simhash32_table(docs)
    a = fps.select(F.col("doc_id").alias("id_a"),
                   F.col("fp_simhash").alias("fa"))
    b = fps.select(F.col("doc_id").alias("id_b"),
                   F.col("fp_simhash").alias("fb"))
    all_pairs = (a.crossJoin(b).filter("id_a < id_b")
                 .select("id_a", "id_b",
                         hamming32(F.col("fa"), F.col("fb")).alias("h")))
    for mh in (0, 3, 6):
        got = {(r["id_a"], r["id_b"], r["hamming"])
               for r in simhash_near_duplicate_pairs(
                   docs, max_hamming=mh).collect()}
        brute = {(r["id_a"], r["id_b"], r["h"])
                 for r in all_pairs.filter(F.col("h") <= mh).collect()}
        assert got == brute, mh
        assert got, mh  # non-vacuous: every radius has at least one pair


# --------------------------------------------------------------------------
# Benchmark decontamination (normalized token n-gram overlap vs an eval set)


def _decontam_frames(spark):
    docs = spark.createDataFrame(
        [
            # shares the eval 8-gram verbatim (case/punct differ: the
            # normalizer must see through both)
            (1, "Prefix words here; The QUICK brown fox, jumps over the lazy dog!! suffix"),
            # clean document
            (2, "completely unrelated content about spark partitions and shuffles etc"),
            # repeats the contaminated phrase twice -> matched_ngrams
            # counts doc-side occurrences
            (3, "the quick brown fox jumps over the lazy dog and again "
                "the quick brown fox jumps over the lazy dog"),
            # short doc (< n tokens): whole-text fallback, matches the
            # short eval entry exactly
            (4, "Tiny-Eval Fragment"),
            # short doc that matches nothing
            (5, "tiny other"),
        ],
        "doc_id long, text string")
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "tiny eval fragment")],
        "eval_id long, eval_text string")
    return docs, eval_df


def test_contamination_matches_exact_set(spark):
    from trafilatura_spark.functions.dedup import contamination_matches
    docs, eval_df = _decontam_frames(spark)
    got = {(r.doc_id, r.eval_id): r.matched_ngrams
           for r in contamination_matches(docs, eval_df, n=8).collect()}
    # eval 100 has 9 tokens -> 2 distinct 8-grams; doc 1 contains both
    # ("the quick...lazy" and "quick...dog"); doc 3 contains each twice
    # plus the bridging grams "...dog and again the..." which are NOT in
    # the eval set
    assert got == {(1, 100): 2, (3, 100): 4, (4, 101): 1}


def test_decontaminate_removes_only_contaminated(spark):
    from trafilatura_spark.functions.dedup import decontaminate
    docs, eval_df = _decontam_frames(spark)
    kept = sorted(r.doc_id
                  for r in decontaminate(docs, eval_df, n=8).collect())
    assert kept == [2, 5]


def test_contamination_plan_broadcasts_eval_side(spark):
    """Scale shape: the eval n-gram side must be a broadcast hash join
    (no doc-side shuffle before the match)."""
    from trafilatura_spark.functions.dedup import contamination_matches
    docs, eval_df = _decontam_frames(spark)
    plan = contamination_matches(docs, eval_df, n=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_contamination_empty_normalization_never_glues(spark):
    """Documents with no ASCII alphanumerics normalize to "" — they must
    NOT match an eval entry that also normalizes to "" (previously the
    shared empty n-gram marked every such doc contaminated)."""
    from trafilatura_spark.functions.dedup import (contamination_matches,
                                                   decontaminate)
    docs = spark.createDataFrame(
        [(1, "这是一个完全中文的文档没有任何拉丁字母"),
         (2, "!!! ??? *** ---"),
         (3, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string")
    eval_df = spark.createDataFrame(
        [(100, "。。。标点符号"),   # also normalizes to ""
         (101, "the quick brown fox jumps over the lazy dog")],
        "eval_id long, eval_text string")
    got = {(r.doc_id, r.eval_id)
           for r in contamination_matches(docs, eval_df, n=8).collect()}
    assert got == {(3, 101)}
    kept = sorted(r.doc_id
                  for r in decontaminate(docs, eval_df, n=8).collect())
    assert kept == [1, 2]


def test_lsh_bands_validates_band_size(spark):
    from trafilatura_spark.functions.dedup import (lsh_bands,
                                                   minhash_signatures)
    sigs = minhash_signatures(spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string"))
    with pytest.raises(ValueError, match="band_size"):
        lsh_bands(sigs, band_size=0)
    # band wider than the 8-hash signature: NO bands (posexplode drops
    # the row) — previously sequence(0, -1) descended and emitted a
    # bogus empty-slice band identical for every doc
    assert lsh_bands(sigs, band_size=16).count() == 0
    # normal banding unchanged: 8 hashes / 2 = 4 bands
    assert lsh_bands(sigs, band_size=2).count() == 4
