"""Reproduces BENCH.md "Corpus dedup at 1M docs": minhash -> LSH ->
exact-Jaccard verify -> connected components -> survivor pick over
1,000,000 deterministic 40-word documents plus 100,000 injected
near-dups (every 10th doc re-rolled in its last 4 words, word-level
Jaccard ~0.77).  Ground truth is exact by construction: recall =
recovered / 100,000, and any pair not bridging the +10M id offset is a
false positive.

Usage: PYTHONPATH=. python scripts/scale_dedup_1m.py
"""
import json
import time

from pyspark.sql import functions as F

from trafilatura_spark.functions.dedup import (near_duplicate_pairs,
                                               resolve_clusters)
from trafilatura_spark.job import make_session

N = 1_000_000


def main() -> None:
    spark = make_session(master="local[32]")
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    vocab = F.array(*[F.lit(f"w{i:03d}") for i in range(1000)])
    base = (spark.range(N).select(F.col("id").alias("doc_id"))
            .withColumn("words", F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.element_at(
                    vocab, (F.pmod(F.xxhash64(F.col("doc_id") * 100 + i),
                                   F.lit(1000)) + 1).cast("int"))))
            .withColumn("text", F.array_join("words", " "))
            .select("doc_id", "text"))
    dups = (base.filter(F.col("doc_id") % 10 == 0)
            .withColumn("doc_id", F.col("doc_id") + 10_000_000)
            .withColumn("text", F.concat(
                F.array_join(F.slice(F.split("text", " "), 1, 36), " "),
                F.lit(" wx1 wx2 wx3 wx4"))))
    docs = (base.unionByName(dups)
            .repartition(64, F.xxhash64("doc_id")).persist())
    n_docs = docs.count()

    t0 = time.time()
    pairs = near_duplicate_pairs(docs, n_hashes=8, band_size=2, k=3,
                                 threshold=0.5,
                                 max_bucket_size=64).persist()
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    t1 = time.time()
    clusters = resolve_clusters(pairs)
    n_clustered = clusters.count()
    n_survivors = clusters.filter("is_survivor").count()
    t_clusters = time.time() - t1

    injected = docs.filter(F.col("doc_id") >= 10_000_000).count()
    recovered = pairs.filter(
        (F.col("id_b") - F.col("id_a")) == 10_000_000).count()
    print(json.dumps({
        "docs": n_docs, "pairs": n_pairs,
        "pairs_sec": round(t_pairs, 1),
        "docs_per_sec": round(n_docs / t_pairs),
        "clusters_sec": round(t_clusters, 1),
        "clustered_docs": n_clustered, "survivors": n_survivors,
        "recall": round(recovered / injected, 4),
        "false_positive_pairs": n_pairs - recovered}))
    spark.stop()


if __name__ == "__main__":
    main()
