#!/usr/bin/env python
"""Regenerate PLANS.md: captured physical plans of the key pipelines."""

import contextlib
import io
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from trafilatura_spark.job import make_session  # noqa: E402
from trafilatura_spark.operators.pipeline import extract_documents  # noqa: E402
from trafilatura_spark.settings import Options  # noqa: E402
from trafilatura_spark.sources.corpus import synthesize_documents_df  # noqa: E402

SF = "/root/testdata/sf0.01"

# Sections whose heading is immediately followed by this marker are
# hand-condensed/annotated plans (e.g. the incremental-dedup serving
# shape) that explain("formatted") cannot produce; regen carries them
# over verbatim instead of dropping them.
MANUAL_MARK = "<!-- manual: kept verbatim by regen_plans.py -->"


def manual_sections(path: pathlib.Path) -> list[str]:
    if not path.exists():
        return []
    blocks, cur = [], None
    for line in path.read_text().splitlines():
        if line.startswith("## "):
            if cur is not None:
                blocks.append("\n".join(cur).rstrip())
            cur = [line]
        elif cur is not None:
            cur.append(line)
    if cur is not None:
        blocks.append("\n".join(cur).rstrip())
    return [b for b in blocks if b.splitlines()[1:2] == [MANUAL_MARK]]


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = make_session(master="local[8]")
    sections = []

    docs = synthesize_documents_df(spark, SF)
    opts = Options(fast=True, comments=False, with_metadata=True,
                   min_extracted_size=5, min_output_size=1)
    ex = extract_documents(docs, opts)
    sections.append(("Extraction (scan → synthesize → extract): ONE narrow "
                     "stage, no Exchange", plan_of(ex)))
    sections.append(("Post-extraction filter+projection (column pruning over "
                     "the map output)",
                     plan_of(ex.filter(F.col("status") == "ok")
                             .select("doc_id", "len_text"))))

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    from trafilatura_spark.functions.similarity import cosine_topk
    tk = cosine_topk(emb, emb.filter(F.col("vec_id") % 50 == 0), k=5)
    sections.append(("Cosine top-k: query side broadcast "
                     "(BroadcastNestedLoopJoin), single window", plan_of(tk)))

    base = spark.read.parquet(f"{SF}/documents.parquet")
    sections.append(("Parquet scan with predicate pushdown + column pruning "
                     "(PushedFilters/ReadSchema)",
                     plan_of(base.filter(F.col("n_chars") > 300)
                             .select("doc_id", "text"))))

    from trafilatura_spark.functions.dedup import simhash32_table
    sections.append(("Relational simhash: one hash-aggregate shuffle, "
                     "map-side partial aggregation",
                     plan_of(simhash32_table(base.select("doc_id", "text")))))

    from trafilatura_spark.sources.crawl import resolve_links
    pages = spark.createDataFrame(
        [("https://a.test/x/", '<a href="/p">l</a>')],
        "url string, html string")
    sections.append(("Crawl link resolution: pure JVM (regexp explode + "
                     "parse_url), no Python eval",
                     plan_of(resolve_links(pages))))

    # captured from the SAME call path as the oracle query so the
    # committed plan matches what the driver measures
    import __spark_entry__ as entrymod
    nd = entrymod.queries()["dedup_minhash"](spark, SF)
    sections.append((
        "MinHash→LSH→Jaccard: ZERO-shuffle signatures "
        "(array_min over in-row digest array), groupBy-bucket "
        "pair explode (no self-join recompute), broadcast "
        "candidate verify",
        "Captured from `queries()['dedup_minhash']` at sf0.01. The "
        "signature stage\nis a pure Project over the scan — the earlier "
        "explode + 8-way min-aggregate\nform paid one full shingle "
        "shuffle (map-side combined, but still one\nhash-aggregate probe "
        "per shingle; for char shinglers ~1 shingle/char that\ndominated "
        "the pipeline). Shuffles at production defaults: (a) band-bucket\n"
        "groupBy, (b) candidate-pair distinct, (c) final verified-pair "
        "distinct.\nThe two extra Exchanges below are the opt-in "
        "`n_partitions`\nrepartition used ONLY at bench scale where the "
        "parquet scan yields fewer\nsplits than cores; production scans "
        "already carry thousands of partitions\nand skip it "
        "(near_duplicate_pairs(n_partitions=None), the default).\n"
        "Null-text / empty-shingle docs are filtered before signing — a "
        "shared null\nband would otherwise be one corpus-wide quadratic "
        "hot bucket.",
        plan_of(nd)))

    from trafilatura_spark.functions.similarity import embedding_near_dup_pairs
    nd_emb = embedding_near_dup_pairs(emb.select("vec_id", "embedding"),
                                      threshold=0.99, n_tables=4, n_bits=8)
    sections.append(("Embedding near-dup: hyperplane-LSH bucket self-join, "
                     "cosine verify on candidate pairs only (never "
                     "all-pairs), AQE skew-join eligible for hub buckets",
                     plan_of(nd_emb)))

    import pandas as pd

    from trafilatura_spark.sources.pdf import build_pdf, pdf_spans_df

    def gen(it):
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype(str),
                "pdf": [build_pdf(int(d), t)
                        for d, t in zip(pdf["doc_id"], pdf["text"])]})

    pdfs = base.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id string, pdf binary")
    sections.append(("PDF parse (binary → spans): two narrow Arrow-batched "
                     "stages, no Exchange — same contract as the HTML "
                     "extraction stage", plan_of(pdf_spans_df(pdfs))))

    from trafilatura_spark.functions.multimodal import (media_table,
                                                        with_real_payloads)
    from trafilatura_spark.functions.resize import resize_images
    media_plan = resize_images(with_real_payloads(media_table(docs)))
    sections.append(("Multimodal decode→resize: span explode + two "
                     "Arrow-batched stages, no Exchange (media parallelism "
                     "inherits the scan; payload attach is the production "
                     "blob-store join seam)", plan_of(media_plan)))

    from trafilatura_spark.functions.textstats import lang_id
    lf = (lang_id(ex.withColumn(
        "_t", F.array_join(F.transform("spans", lambda s: s["text"]), " ")),
        text_col="_t", out_col="_pl")
        .filter((F.col("status") != "ok") | (F.col("_pl") == "en"))
        .drop("_t", "_pl"))
    sections.append(("Post-extraction language filter (--lang-filter): "
                     "JVM column expressions appended to the extraction "
                     "stage — no extra shuffle, no Python eval",
                     plan_of(lf)))

    out = pathlib.Path(__file__).resolve().parent.parent / "PLANS.md"
    kept = manual_sections(out)
    with out.open("w") as f:
        f.write(
            "# PLANS — captured physical plans of the key pipelines\n\n"
            "Generated by `scripts/regen_plans.py` (Spark local mode, "
            "sf0.01).  These\nare the plans the engine is designed to "
            "produce; the properties called\nout in each heading are "
            "asserted by tests where load-bearing\n"
            "(tests/test_spark_pipeline.py).\n\n")
        for section in sections:
            if len(section) == 3:
                title, prose, plan = section
                f.write(f"## {title}\n\n{prose}\n\n"
                        f"```\n{plan.strip()}\n```\n\n")
            else:
                title, plan = section
                f.write(f"## {title}\n\n```\n{plan.strip()}\n```\n\n")
        for block in kept:
            f.write(block + "\n\n")
    print(f"wrote {out} ({len(kept)} manual sections kept)")
    spark.stop()


if __name__ == "__main__":
    main()
