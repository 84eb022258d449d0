"""Deterministic interleaved text+media corpus synthesizer.

The north rule's input is an Iceberg table
``documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
(BASELINE.json ``input_hint``).  No such corpus exists in the sandbox, so
this module derives one *deterministically* from the driver-generated
``documents.parquet`` (doc_id, text, lang, source, n_chars): each row's
``text`` becomes the known-by-construction article content wrapped in a
site template with nav/sidebar/footer boilerplate and ``doc_id % 3``
interleaved media spans.  Because the construction is a pure function of
(doc_id, text, lang, source), the *expected* extraction output is
expressible in ANSI SQL over the original table — which is exactly what
the driver's DuckDB oracle needs (FIXTURES.md §4).

Templates rotate through the reference's candidate-selection tiers
(/root/reference/lib/src/xpaths.dart:87-187): class ``post-content``
(tier 1), bare ``<article>`` (tier 2), ``<main>`` (tier 5), class
``entry-content`` (tier 1), so every synthesized corpus exercises the
whole cascade.

Ground-truth contract (mirrored by the SQL in ``__spark_entry__.py``):

    words = split(text, ' ');  n = len(words)
    head  = words[0:3]                      -> span 0: kind='head'
    rest  = words[3:];  h = (len(rest)+1)//2
    para1 = rest[0:h]                       -> span 1: kind='p'
    m     = doc_id % 3 images               -> spans 2..m+1: kind='graphic',
                                               text='figure {i}', media_ref='m-{doc_id}-{i}'
    para2 = rest[h:]                        -> span m+2: kind='p'

and ``' '.join(non-graphic span texts) == text`` (round-trip identity).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input span schema (BASELINE.json input_hint).
INPUT_SPAN_TYPE = T.StructType([
    T.StructField("kind", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("offset", T.IntegerType(), False),
])

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(INPUT_SPAN_TYPE), False),
])

# Rotating site templates, keyed by doc_id % 4 (selector tiers, see module doc).
_CONTAINERS = [
    ('<div class="post-content">', "</div>"),
    ("<article>", "</article>"),
    ("<main>", "</main>"),
    ('<div class="entry-content">', "</div>"),
]

_NAV = (
    '<nav class="nav-menu"><ul>'
    '<li><a href="/">home</a></li><li><a href="/news">news</a></li>'
    '<li><a href="/archive">archive</a></li><li><a href="/about">about</a></li>'
    "</ul></nav>"
)

_SIDEBAR = (
    '<div class="sidebar"><h3>related</h3>'
    '<a href="/r/1">one</a> <a href="/r/2">two</a> <a href="/r/3">three</a> '
    '<a href="/r/4">four</a> <a href="/r/5">five</a></div>'
)

_FOOTER = (
    "<footer><p>copyright example news network all rights reserved "
    "imprint privacy terms contact</p></footer>"
)


def doc_parts(doc_id: int, text: str) -> tuple[str, str, str, int]:
    """(head, para1, para2, n_media) — THE ground-truth contract."""
    words = text.split(" ")
    head = " ".join(words[:3])
    rest = words[3:]
    h = (len(rest) + 1) // 2
    para1 = " ".join(rest[:h])
    para2 = " ".join(rest[h:])
    return head, para1, para2, doc_id % 3


def _head_section(doc_id: int, lang: str, source: str) -> str:
    return (
        f'<head><title>{source} | doc {doc_id}</title>'
        f'<meta name="author" content="author {doc_id % 7}"/>'
        f'<meta property="og:title" content="doc {doc_id} title"/>'
        f'<meta property="og:site_name" content="{source}"/>'
        f'<meta property="og:locale" content="{lang}"/>'
        f'<meta property="article:published_time" '
        f'content="2024-{doc_id % 12 + 1:02d}-{doc_id % 28 + 1:02d}T08:30:00Z"/>'
        f'<meta property="og:description" content="synthetic article {doc_id}"/>'
        f'<link rel="canonical" href="https://{source}.example.com/posts/{doc_id}"/>'
        "</head>"
    )


def gate_payload(length: int) -> str:
    """Deterministic word-ish text of EXACTLY ``length`` chars (no
    trailing space — trim would change the length): 'gate ' repeated,
    closed by 'gates' or a 'g'-run remainder word."""
    if length % 5 == 0:
        return "gate " * (length // 5 - 1) + "gates"
    return "gate " * (length // 5) + "g" * (length % 5)


# boundary-value probes for the STOCK size gates (settings.dart /
# settings.py: min_extracted_size=250, min_output_size=200), one class
# per doc_id % 8 — see build_input_spans(template="gates")
GATE_PLAIN_LENGTHS = (124, 125, 249, 250, 251)   # single-<p> page payload
GATE_JSONLD_LENGTHS = (199, 200, 201)            # JSON-LD articleBody


def comment_items(doc_id: int, text: str) -> list[str]:
    """doc_id % 2 + 1 deterministic comment texts built from the tail words."""
    tail = " ".join(text.split(" ")[-4:])
    return [f"comment {i} of doc {doc_id} says {tail}"
            for i in range(doc_id % 2 + 1)]


def _comments_section(doc_id: int, text: str) -> str:
    items = "".join(
        f"<li><p>{t}</p></li>" for t in comment_items(doc_id, text)
    )
    return f'<div class="comments"><ol class="commentlist">{items}</ol></div>'


def build_input_spans(doc_id: int, text: str, lang: str, source: str,
                      with_comments: bool = False,
                      template: str = "article",
                      boiler_repeat: int = 1) -> list[dict]:
    """One document's interleaved input spans.

    ``template='article'`` — full site page (selector-tier container).
    ``template='bare'``    — paragraphs in an anonymous div: exercises the
    wild-text / baseline recovery paths (main_extractor.dart:399-437,
    baseline.dart:90-109).
    ``boiler_repeat`` — repeats the nav/sidebar boilerplate blocks to
    scale page weight toward realistic sizes (benchmarks); the expected
    extraction output is unchanged (boilerplate is pruned).
    """
    head, para1, para2, n_media = doc_parts(doc_id, text)
    spans: list[dict] = []

    def html(chunk: str) -> None:
        spans.append({"kind": "html", "text": chunk, "media_ref": "",
                      "offset": len(spans)})

    def media(ref: str, markup: str) -> None:
        spans.append({"kind": "media", "text": "", "media_ref": ref,
                      "offset": len(spans)})
        html(markup)

    if template in ("fallback_readability", "fallback_justext"):
        # Pages that defeat the main cascade so compare_extraction
        # (external.dart:36-115) decides the outcome — used by the
        # fast=False oracle families.  Content lives in a table cell
        # (own_p == 0 in the main extraction); for the readability tier a
        # tiny second cell makes len_algo != len_text so the own_p branch
        # fires; for the justext tier a <time> marker in the cell poisons
        # the readability output (sanitized-tag check, external.dart:93)
        # and routes to the justext rescue.  Deterministic for docs with
        # >= 15 words (shorter docs legitimately route differently —
        # callers filter).
        body_text = f"{para1} {para2}"
        if template == "fallback_justext":
            cellpart = (f"<tr><td>{body_text} "
                        f'<time datetime="2024-01-01">tick</time></td></tr>')
        else:
            cellpart = (f"<tr><td>{body_text}</td></tr>"
                        "<tr><td>ad box</td></tr>")
        html(
            f'<!DOCTYPE html><html lang="{lang}">{_head_section(doc_id, lang, source)}'
            f'<body>{_NAV}<div id="page"><table>{cellpart}</table></div>'
            f"{_FOOTER}</body></html>"
        )
        return spans

    if template == "gates":
        # boundary-value family for the STOCK size gates, exact to ±1
        # char (no eligibility carve-outs).  doc_id % 8 selects the class:
        #   r<5  — single <p> of exactly GATE_PLAIN_LENGTHS[r] chars:
        #          L>=250 single-copy main; 125<=L<250 wild-text
        #          duplication (2L>=250) main; L=124 -> 2L=248 -> baseline
        #          -> under min_output_size -> empty
        #   r>=5 — tiny visible <p> + JSON-LD articleBody of exactly
        #          GATE_JSONLD_LENGTHS[r-5] chars: baseline tier-1 route,
        #          ok iff M >= min_output_size (200)
        r = doc_id % 8
        if r < len(GATE_PLAIN_LENGTHS):
            p = gate_payload(GATE_PLAIN_LENGTHS[r])
            html(
                f'<!DOCTYPE html><html lang="{lang}">{_head_section(doc_id, lang, source)}'
                f'<body>{_NAV}<div class="post-content"><p>{p}</p></div>'
                f"{_FOOTER}</body></html>"
            )
        else:
            body = gate_payload(GATE_JSONLD_LENGTHS[r - len(GATE_PLAIN_LENGTHS)])
            html(
                f'<!DOCTYPE html><html lang="{lang}">{_head_section(doc_id, lang, source)}'
                f'<body>{_NAV}'
                f'<script type="application/ld+json">'
                f'{{"@type": "Article", "articleBody": "{body}"}}</script>'
                f'<div class="post-content"><p>gate note</p></div>'
                f"{_FOOTER}</body></html>"
            )
        return spans

    if template == "dedupopt":
        # option-matrix family (dedup=True, deduplication.dart:335-349
        # duplicateTest): the same >min_duplcheck_size paragraph appears
        # 5 times; count-before-increment keeps the first
        # max_repetitions+1 (=3) occurrences and drops the rest
        dup = (f"dup{doc_id} " * 25).strip()
        html(
            f'<!DOCTYPE html><html lang="{lang}">{_head_section(doc_id, lang, source)}'
            f'<body>{_NAV}<div class="post-content"><h1>{head}</h1>'
            + f"<p>{dup}</p>" * 5
            + f"<p>{para2}</p></div>{_FOOTER}</body></html>"
        )
        return spans

    if template == "nometa":
        # option-matrix family (onlyWithMetadata, core.dart:163-199):
        # odd docs carry a bare <title> head — a title is still
        # recoverable but date and canonical URL are not, so the
        # only_with_metadata gate must reject them; even docs keep the
        # full metadata head and pass
        if doc_id % 2 == 1:
            head_sec = f"<head><title>doc {doc_id} title</title></head>"
        else:
            head_sec = _head_section(doc_id, lang, source)
        html(
            f'<!DOCTYPE html><html lang="{lang}">{head_sec}'
            f'<body>{_NAV}<div class="post-content"><h1>{head}</h1>'
            f"<p>{para1}</p><p>{para2}</p></div>{_FOOTER}</body></html>"
        )
        return spans

    if template == "treesize":
        # option-matrix family (maxTreeSize, core.dart:285-296): doc_id%3
        # rotates output-tree shapes around max_tree_size=10 —
        #   r0: h1 + 2 plain <p>                  ->  3 elems, pass
        #   r1: h1 + 2 <p> each with 2 <b>        -> 11 elems, pass only
        #       after the strip-hi second chance  ->  3
        #   r2: h1 + 12 <p> each with 1 <b>       -> 25 elems, still 13
        #       after strip-hi                    -> rejected
        r = doc_id % 3
        if r == 0:
            body = f"<p>{para1}</p><p>{para2}</p>"
        elif r == 1:
            body = "".join(
                f"<p><b>bold{j}</b> marker <b>extra{j}</b> "
                f"branch {j} of tree {doc_id} keeps growing steadily</p>"
                for j in range(2))
        else:
            body = "".join(
                f"<p><b>bold{j}</b> "
                f"branch {j} of tree {doc_id} keeps growing steadily</p>"
                for j in range(12))
        html(
            f'<!DOCTYPE html><html lang="{lang}">{_head_section(doc_id, lang, source)}'
            f'<body>{_NAV}<div class="post-content"><h1>{head}</h1>'
            f"{body}</div>{_FOOTER}</body></html>"
        )
        return spans

    if template == "links":
        # option-matrix family (links=True): para1 carries one inline
        # anchor; expected span text appends ' [more {id}](https://r.
        # example.com/{id})' when links are kept, plain ' more {id}'
        # when stripped (htmlprocessing convertTags ref handling)
        op, cl = _CONTAINERS[doc_id % 4]
        html(
            f'<!DOCTYPE html><html lang="{lang}">{_head_section(doc_id, lang, source)}'
            f"<body>{_NAV}{op}<h1>{head}</h1>"
            f'<p>{para1} <a href="https://r.example.com/{doc_id}">'
            f"more {doc_id}</a></p>"
            f"<p>{para2}</p>{cl}{_FOOTER}</body></html>"
        )
        return spans

    if template == "formatting":
        # option-matrix family (formatting=True): para1's first word is
        # bold; expected span text '**w1** rest' with formatting on,
        # 'w1 rest' off; the h1 head gains the '# ' marker
        w1, _, rest1 = para1.partition(" ")
        op, cl = _CONTAINERS[doc_id % 4]
        html(
            f'<!DOCTYPE html><html lang="{lang}">{_head_section(doc_id, lang, source)}'
            f"<body>{_NAV}{op}<h1>{head}</h1>"
            f"<p><b>{w1}</b> {rest1}</p>"
            f"<p>{para2}</p>{cl}{_FOOTER}</body></html>"
        )
        return spans

    if template == "prunex":
        # option-matrix family (pruneXpath, core.dart:232-244 + upstream
        # trafilatura's prune_xpath XPath dialect via dom.xpath_to_css):
        # a prunable block sits between para1 and para2 whose shape
        # rotates by doc_id % 3 — exact-class, contains()-id and
        # attribute-presence expressions each get exercised.  With the
        # matching prune_patterns the block (and nothing else) vanishes;
        # without them it would surface as an extra 'p' span.
        pt = (f"prunable insert for doc {doc_id} that would otherwise "
              f"join the article body text")
        blocks = (
            f'<div class="recipe-box"><p>{pt}</p></div>',
            f'<div id="extra-note-{doc_id}"><p>{pt}</p></div>',
            f'<div data-zone="rail-{doc_id}"><p>{pt}</p></div>',
        )
        op, cl = _CONTAINERS[doc_id % 4]
        html(
            f'<!DOCTYPE html><html lang="{lang}">{_head_section(doc_id, lang, source)}'
            f"<body>{_NAV}{op}<h1>{head}</h1><p>{para1}</p>"
            f"{blocks[doc_id % 3]}"
            f"<p>{para2}</p>{cl}{_FOOTER}</body></html>"
        )
        return spans

    if template == "tables":
        # option-matrix family (tables, settings.dart includeTables +
        # main_extractor.dart handleTable): a 2×2 table with
        # deterministic cell texts sits between para1 and para2 —
        # tables=True emits the table/row/cell span run at fixed
        # offsets, tables=False cleans the table away entirely
        table = "<table>" + "".join(
            "<tr>" + "".join(f"<td>cell {r}{c} of {doc_id}</td>"
                             for c in range(2)) + "</tr>"
            for r in range(2)) + "</table>"
        op, cl = _CONTAINERS[doc_id % 4]
        html(
            f'<!DOCTYPE html><html lang="{lang}">{_head_section(doc_id, lang, source)}'
            f"<body>{_NAV}{op}<h1>{head}</h1><p>{para1}</p>"
            f"{table}<p>{para2}</p>{cl}{_FOOTER}</body></html>"
        )
        return spans

    if template == "bare":
        html(
            f'<!DOCTYPE html><html lang="{lang}">{_head_section(doc_id, lang, source)}'
            f'<body>{_NAV}<div id="wrap"><p>{para1}</p><p>{para2}</p></div>'
            f"{_FOOTER}</body></html>"
        )
        return spans

    op, cl = _CONTAINERS[doc_id % 4]
    boiler = (_NAV + _SIDEBAR) * boiler_repeat
    html(
        f'<!DOCTYPE html><html lang="{lang}">{_head_section(doc_id, lang, source)}'
        f"<body>{boiler}{op}<h1>{head}</h1><p>{para1}</p>"
    )
    for i in range(n_media):
        ref = f"m-{doc_id}-{i}"
        media(ref, f'<img src="{ref}" alt="figure {i}"/>')
    tail = f"<p>{para2}</p>{cl}"
    if with_comments:
        tail += _comments_section(doc_id, text)
    tail += f"{_FOOTER * boiler_repeat}</body></html>"
    html(tail)
    return spans


def single_html_span(html: str) -> list[tuple]:
    """The one-chunk input-span wrapper for a whole-page HTML string —
    the single source of truth for the (kind, text, media_ref, offset)
    shape used by every raw-HTML ingestion path (html-dir job input,
    crawl driver)."""
    return [("html", html, "", 0)]


def html_to_documents(df, id_col: str = "doc_id", html_col: str = "html"):
    """(id, html-string) frame → documents(doc_id, spans) via one Arrow
    stage, wrapping each page as a single-chunk span list."""

    def to_docs(batches):
        import pandas as pd
        for pdf in batches:
            # str() coercion: DOCUMENTS_SCHEMA's doc_id is StringType —
            # a numeric id column would otherwise fail Arrow conversion
            # at runtime (synthesize_spans_from does the same)
            rows = [(str(i), single_html_span(h))
                    for i, h in zip(pdf[id_col], pdf[html_col])]
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return df.select(id_col, html_col).mapInPandas(to_docs, DOCUMENTS_SCHEMA)


def assemble_html(spans: list[dict]) -> str:
    """Reassemble the document HTML from its input spans (FIXTURES.md §1):
    concatenate in offset order; media spans are markers (empty text)."""
    return "".join(
        s["text"] for s in sorted(spans, key=lambda s: s["offset"])
    )


def expected_output_spans(doc_id: int, text: str,
                          with_comments: bool = False) -> list[dict]:
    """Ground-truth extraction output for an 'article'-template doc."""
    head, para1, para2, n_media = doc_parts(doc_id, text)
    out = [{"kind": "head", "text": head, "media_ref": ""},
           {"kind": "p", "text": para1, "media_ref": ""}]
    for i in range(n_media):
        out.append({"kind": "graphic", "text": f"figure {i}",
                    "media_ref": f"m-{doc_id}-{i}"})
    out.append({"kind": "p", "text": para2, "media_ref": ""})
    if with_comments:
        for t in comment_items(doc_id, text):
            out.append({"kind": "comment", "text": t, "media_ref": ""})
    for i, s in enumerate(out):
        s["offset"] = i
    return out


# -- Spark-side synthesis -----------------------------------------------------

def synthesize_documents_df(spark, sf_dir: str, with_comments: bool = False,
                            template: str = "article", replicate: int = 1,
                            partitions: int | None = None,
                            boiler_repeat: int = 1):
    """Interleaved-spans DataFrame derived from {sf_dir}/documents.parquet.

    ``replicate`` > 1 scales the corpus for benchmarks: copy r gets
    doc_id + r*10_000_000 (deterministic, no external data).  Built with
    ``mapInPandas`` so synthesis itself is Arrow-vectorized and runs
    distributed — at 100 TB the same code path would read the real
    Iceberg table instead.
    """
    base = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text", "lang", "source")

    if replicate > 1:
        from pyspark.sql import functions as F
        copies = spark.range(replicate).select(
            (F.col("id") * 10_000_000).alias("doc_base"))
        base = base.crossJoin(copies).select(
            (F.col("doc_id") + F.col("doc_base")).alias("doc_id"),
            "text", "lang", "source")

    if partitions:
        # spread synthesis (testdata parquet is a single file = 1 partition);
        # doubles as the salted layout so downstream extraction stays narrow
        from pyspark.sql import functions as F
        base = base.repartition(partitions, F.xxhash64("doc_id"))

    return synthesize_spans_from(base, with_comments=with_comments,
                                 template=template,
                                 boiler_repeat=boiler_repeat)


def synthesize_spans_from(base, with_comments: bool = False,
                          template: str = "article",
                          boiler_repeat: int = 1):
    """Interleaved spans from an arbitrary (doc_id, text, lang, source)
    frame (repeated doc_ids allowed — e.g. the segment-dedup corpus).
    The shared Arrow-vectorized synthesis stage behind
    synthesize_documents_df."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, text, lang, source in zip(
                    pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]):
                spans = build_input_spans(
                    int(doc_id), text, lang, source,
                    with_comments=with_comments, template=template,
                    boiler_repeat=boiler_repeat)
                rows.append((str(int(doc_id)),
                             [(s["kind"], s["text"], s["media_ref"],
                               s["offset"]) for s in spans]))
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return base.select("doc_id", "text", "lang", "source") \
        .mapInPandas(gen, DOCUMENTS_SCHEMA)
