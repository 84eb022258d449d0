"""Batch crawl-frontier expansion (spider.dart analog).

The reference's focused crawler (spider.dart:529-571) is a sequential
BFS loop over per-domain queues.  The batch re-expression: the link
graph lives in a table ``edges(src, dst)`` (produced by extraction with
``links=True`` — every ``ref`` span is an edge); frontier expansion is
iterative DataFrame algebra:

    frontier_{k+1} = distinct(dst of edges joined on frontier_k) ANTI-JOIN visited

Each hop is one shuffle join; ``visited`` stays a DataFrame (checkpointed
every few hops to cut lineage).  At web scale this is the standard
map-reduce BFS; robots/language gates become row filters on the edge
table before expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def edges_from_extraction(extracted: DataFrame) -> DataFrame:
    """(src=doc url, dst=ref target) link graph from extraction output
    with links enabled."""
    return (
        extracted
        .select(F.col("meta.url").alias("src"), F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "ref")
        .select("src", F.col("s.media_ref").alias("dst"))
        .filter(F.col("dst") != "")
    )


def bfs_frontier(edges: DataFrame, seeds: DataFrame, max_hops: int = 3,
                 checkpoint_every: int = 2) -> DataFrame:
    """Iterative BFS: returns (url, hop) for every reached node.

    ``seeds``: one column ``url``.  ``edges``: (src, dst).  Lineage is cut
    with localCheckpoint every ``checkpoint_every`` hops so deep crawls
    don't build unbounded plans.
    """
    visited = seeds.select("url", F.lit(0).alias("hop"))
    frontier = visited.select("url")
    for hop in range(1, max_hops + 1):
        nxt = (
            edges.join(frontier.withColumnRenamed("url", "src"), "src")
            .select(F.col("dst").alias("url")).distinct()
            .join(visited.select("url"), "url", "left_anti")
        )
        nxt = nxt.withColumn("hop", F.lit(hop))
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt.select("url")
        if hop % checkpoint_every == 0:
            visited = visited.localCheckpoint()
            frontier = frontier.localCheckpoint()
    return visited


def per_domain_quota(urls: DataFrame, url_col: str = "url",
                     quota: int = 10) -> DataFrame:
    """Politeness quota: keep at most ``quota`` URLs per host (the batch
    analog of the reference's per-domain round-robin,
    cli_utils.dart:379-406)."""
    from pyspark.sql import Window
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    w = Window.partitionBy(host).orderBy(F.col(url_col))
    return (urls.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= quota).drop("_rn"))
