"""Reproduces BENCH.md "Incremental dedup: 100k batch vs a 1M-doc
signature store": the continuous-ingestion serving shape — a persisted
:func:`minhash_signatures` store is built ONCE over the 1M-doc corpus,
then a 100k-doc batch (every 10th doc a near-dup of a corpus doc,
word-Jaccard ~0.81) is deduplicated against it with
``near_duplicate_pairs_incremental``, and the SAME pair set is computed
the expensive way (full ``near_duplicate_pairs`` over corpus ∪ batch,
restricted to batch-touching pairs) for an exact-equality check plus
the wall-clock comparison.  Ground truth is exact by construction:
injected cross pairs bridge the +2M id offset.

Usage: PYTHONPATH=. python scripts/scale_dedup_incremental_1m.py
"""
import json
import time

from pyspark.sql import functions as F

from trafilatura_spark.functions.dedup import (
    minhash_signatures, near_duplicate_pairs,
    near_duplicate_pairs_incremental)
from trafilatura_spark.job import make_session

N, B = 1_000_000, 100_000
OFF = 2_000_000


def main() -> None:
    spark = make_session(master="local[32]")
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    vocab = F.array(*[F.lit(f"w{i:03d}") for i in range(1000)])

    def words_for(idcol):
        return F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda i: F.element_at(
                vocab, (F.pmod(F.xxhash64(idcol * 100 + i),
                               F.lit(1000)) + 1).cast("int")))

    corpus = (spark.range(N).select(F.col("id").alias("doc_id"))
              .withColumn("text", F.array_join(words_for(F.col("doc_id")),
                                               " "))
              .select("doc_id", "text")
              .repartition(64, F.xxhash64("doc_id")).persist())
    n_corpus = corpus.count()

    # batch: fresh 40-word docs under ids OFF..OFF+B; every 10th re-rolls
    # the last 4 words of corpus doc (id - OFF) -> word-Jaccard ~0.81
    src = F.col("doc_id") - OFF
    batch = (spark.range(B).select((F.col("id") + OFF).alias("doc_id"))
             .withColumn("text", F.when(
                 src % 10 == 0,
                 F.concat(F.array_join(F.slice(words_for(src), 1, 36), " "),
                          F.lit(" wy1 wy2 wy3 wy4")))
                 .otherwise(F.array_join(words_for(F.col("doc_id")), " ")))
             .select("doc_id", "text")
             .repartition(16, F.xxhash64("doc_id")).persist())
    n_batch = batch.count()

    # one-time store build (amortized across every future batch)
    t0 = time.time()
    sigs = minhash_signatures(corpus).persist()
    sigs.count()
    t_store = time.time() - t0

    kw = dict(n_hashes=8, band_size=2, k=3, threshold=0.5,
              max_bucket_size=64)
    t1 = time.time()
    inc = near_duplicate_pairs_incremental(batch, corpus, sigs,
                                           **kw).persist()
    n_inc = inc.count()
    t_inc = time.time() - t1

    # the expensive way: full run over corpus ∪ batch, restricted to
    # batch-touching pairs — the exact set the incremental path promises
    t2 = time.time()
    full = (near_duplicate_pairs(corpus.unionByName(batch), **kw)
            .filter((F.col("id_a") >= OFF) | (F.col("id_b") >= OFF))
            .persist())
    n_full = full.count()
    t_full = time.time() - t2

    mismatches = (inc.exceptAll(full).count()
                  + full.exceptAll(inc).count())
    injected = B // 10
    recovered = inc.filter((F.col("id_b") - F.col("id_a")) == OFF).count()
    print(json.dumps({
        "corpus_docs": n_corpus, "batch_docs": n_batch,
        "store_build_sec": round(t_store, 1),
        "incremental_sec": round(t_inc, 1),
        "full_run_sec": round(t_full, 1),
        "speedup_vs_full": round(t_full / t_inc, 2),
        "pairs_incremental": n_inc, "pairs_full_restricted": n_full,
        "pair_set_mismatches": mismatches,
        "recall": round(recovered / injected, 4),
        "false_positive_pairs": n_inc - recovered}))
    spark.stop()


if __name__ == "__main__":
    main()
