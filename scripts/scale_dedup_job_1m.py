"""Reproduces BENCH.md "Job-mode corpus dedup at 1M docs": the full
`--mode dedup` CLI surface (read parquet -> minhash/LSH/verify ->
resolve_clusters -> survivor anti-join -> deduped parquet + audit
report) over the same 1.1M-doc ground-truth corpus as
scale_dedup_1m.py (1,000,000 deterministic 40-word docs + 100,000
injected near-dups at +10M id offset, word-Jaccard ~0.77).

Ground truth on the OUTPUT, not the pairs: with keep=min-id every
recovered dup cluster's survivor is the base doc (< 10M), so every
removed id must be >= 10M (zero base docs lost) and removed/100,000 is
the end-to-end recall.

Usage: PYTHONPATH=. python scripts/scale_dedup_job_1m.py
"""
import json
import time

import duckdb
from pyspark.sql import functions as F

from trafilatura_spark.job import main as job_main, make_session

N = 1_000_000
IN, OUT, REP = "/tmp/dedup_job_1m_in", "/tmp/dedup_job_1m_out", \
    "/tmp/dedup_job_1m_report"


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
    (base.unionByName(dups).repartition(64, F.xxhash64("doc_id"))
     .write.mode("overwrite").parquet(IN))

    t0 = time.time()
    rc = job_main(["--mode", "dedup", "--input", IN, "--output", OUT,
                   "--dedup-report", REP, "--dedup-strategy", "minhash",
                   "--dedup-max-bucket-size", "64"])
    wall = time.time() - t0
    assert rc == 0

    kept, kept_ids = duckdb.sql(
        f"select count(*), count(distinct doc_id) "
        f"from read_parquet('{OUT}/*.parquet')").fetchone()
    removed, removed_base = duckdb.sql(
        f"select count(*), sum(cast(doc_id < 10000000 as int)) "
        f"from read_parquet('{REP}/*.parquet') "
        f"where not is_survivor").fetchone()
    print(json.dumps({
        "docs_in": N + N // 10, "kept": kept, "kept_distinct": kept_ids,
        "removed": removed,
        "base_docs_lost": int(removed_base or 0),
        "recall": round(removed / (N // 10), 4),
        "job_wall_sec": round(wall, 1),
        "docs_per_sec": round((N + N // 10) / wall),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
