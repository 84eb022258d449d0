"""Reproduces BENCH.md "ANN at 1M vectors": trained-IVF top-k over
1,000,000 cluster-structured 64-dim embeddings (64 hash-derived centers
+ 0.3-amplitude noise; true neighbors are within-cluster), comparing
the precomputed-index serving path (ivf_topk(cells=...)) against
brute-force cosine for recall@10 and speedup.

Usage: PYTHONPATH=. python scripts/scale_ann_1m.py
"""
import json
import time

from pyspark.sql import functions as F

from trafilatura_spark.functions.similarity import (cosine_topk,
                                                    ivf_assign, ivf_topk,
                                                    train_ivf_centroids)
from trafilatura_spark.job import make_session

N, DIM, CENTERS = 1_000_000, 64, 64


def main() -> None:
    spark = make_session(master="local[32]")
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    def u(seed_col):
        # deterministic uniform [-1, 1)
        return (F.pmod(F.xxhash64(seed_col), F.lit(2000)) - 1000) / 1000.0

    emb = (spark.range(N).select(F.col("id").alias("vec_id"))
           .withColumn("c", (F.col("vec_id") % CENTERS))
           .withColumn("embedding", F.transform(
               F.sequence(F.lit(1), F.lit(DIM)),
               lambda j: (u(F.col("c") * 97 + j * 131)
                          + u(F.col("vec_id") * 67 + j) * F.lit(0.3))
               .cast("float")))
           .select("vec_id", "embedding")
           .repartition(64, F.xxhash64("vec_id")).persist())
    emb.count()

    t0 = time.time()
    cents = train_ivf_centroids(emb, n_cells=CENTERS, n_iter=3).persist()
    cents.count()
    t_train = time.time() - t0
    t1 = time.time()
    index = ivf_assign(emb, cents).persist()
    index.count()
    t_assign = time.time() - t1

    queries = emb.filter(F.col("vec_id") % 10_000 == 0).persist()
    nq = queries.count()
    t2 = time.time()
    ivf = ivf_topk(emb, queries, k=10, n_probe=8, centroids=cents,
                   cells=index).persist()
    n_ivf = ivf.count()
    t_ivf = time.time() - t2
    t3 = time.time()
    brute = cosine_topk(emb, queries, k=10).persist()
    n_brute = brute.count()
    t_brute = time.time() - t3
    hits = (ivf.select("query_id", "neighbor_id")
            .join(brute.select("query_id", "neighbor_id"),
                  ["query_id", "neighbor_id"]).count())
    print(json.dumps({
        "vectors": N, "dim": DIM, "queries": nq,
        "train_sec": round(t_train, 1), "assign_sec": round(t_assign, 1),
        "ivf_query_sec": round(t_ivf, 1), "brute_sec": round(t_brute, 1),
        "recall_at_10": round(hits / n_brute, 4),
        "speedup_vs_brute": round(t_brute / t_ivf, 2),
        "ivf_rows": n_ivf}))
    spark.stop()


if __name__ == "__main__":
    main()
