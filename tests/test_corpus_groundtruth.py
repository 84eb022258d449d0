"""Known-by-construction corpus: extraction must recover the ground truth
span-for-span for EVERY document in the driver testdata, across all three
templates (FIXTURES.md §4, the north rule's span-sequence-equality gate)."""

import pytest

from trafilatura_spark.core import bare_extraction
from trafilatura_spark.settings import Options
from trafilatura_spark.sources.corpus import (
    assemble_html,
    build_input_spans,
    doc_parts,
    expected_output_spans,
)

RELAXED = dict(min_extracted_size=5, min_output_size=1,
               min_output_comm_size=1, min_extracted_comm_size=1)


def _got(res):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in res.spans]


def _want(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def test_article_template_all_docs(doc_rows):
    # fast=True pins the main cascade: without it, sub-15-word docs can be
    # rerouted through compare_extraction (readability/justext), which is
    # correct reference behavior but not the ground-truth construction.
    opts = Options(fast=True, comments=False, with_metadata=False, **RELAXED)
    bad = []
    for doc_id, text, lang, source in doc_rows:
        html = assemble_html(build_input_spans(doc_id, text, lang, source))
        res = bare_extraction(html, opts, doc_id=str(doc_id))
        if _got(res) != _want(expected_output_spans(doc_id, text)):
            bad.append(doc_id)
    assert not bad, f"span mismatch for {len(bad)} docs, e.g. {bad[:5]}"


def test_comments_template_all_docs(doc_rows):
    opts = Options(fast=True, comments=True, with_metadata=False, **RELAXED)
    bad = []
    for doc_id, text, lang, source in doc_rows:
        html = assemble_html(
            build_input_spans(doc_id, text, lang, source, with_comments=True))
        res = bare_extraction(html, opts, doc_id=str(doc_id))
        if _got(res) != _want(expected_output_spans(doc_id, text, with_comments=True)):
            bad.append(doc_id)
    assert not bad, f"span mismatch for {len(bad)} docs, e.g. {bad[:5]}"


def test_bare_template_all_docs(doc_rows):
    opts = Options(fast=True, comments=False, with_metadata=False, **RELAXED)
    bad = []
    for doc_id, text, lang, source in doc_rows:
        html = assemble_html(
            build_input_spans(doc_id, text, lang, source, template="bare"))
        res = bare_extraction(html, opts, doc_id=str(doc_id))
        _, para1, para2, _ = doc_parts(doc_id, text)
        got = [(s["kind"], s["text"]) for s in res.spans]
        if got != [("p", para1), ("p", para2)]:
            bad.append(doc_id)
    assert not bad, f"span mismatch for {len(bad)} docs, e.g. {bad[:5]}"


def test_roundtrip_identity(doc_rows):
    """' '.join(non-graphic span texts) == original text — the invariant the
    DuckDB oracle checks at scale."""
    opts = Options(fast=True, comments=False, with_metadata=False, **RELAXED)
    for doc_id, text, lang, source in doc_rows[:100]:
        html = assemble_html(build_input_spans(doc_id, text, lang, source))
        res = bare_extraction(html, opts, doc_id=str(doc_id))
        joined = " ".join(s["text"] for s in res.spans if s["kind"] != "graphic")
        assert joined == text


def test_metadata_all_docs(doc_rows):
    from trafilatura_spark.core import load_html
    from trafilatura_spark.operators.metadata import extract_metadata
    for doc_id, text, lang, source in doc_rows[:50]:
        html = assemble_html(build_input_spans(doc_id, text, lang, source))
        meta = extract_metadata(load_html(html))
        assert meta["title"] == f"doc {doc_id} title"
        assert meta["author"] == f"Author {doc_id % 7}"
        assert meta["url"] == f"https://{source}.example.com/posts/{doc_id}"
        assert meta["hostname"] == f"{source}.example.com"
        assert meta["sitename"] == source.title()
        assert meta["description"] == f"synthetic article {doc_id}"


def test_media_refs_survive_in_order(doc_rows):
    opts = Options(fast=True, comments=False, with_metadata=False, **RELAXED)
    for doc_id, text, lang, source in doc_rows[:60]:
        m = doc_id % 3
        html = assemble_html(build_input_spans(doc_id, text, lang, source))
        res = bare_extraction(html, opts, doc_id=str(doc_id))
        refs = [s["media_ref"] for s in res.spans if s["kind"] == "graphic"]
        assert refs == [f"m-{doc_id}-{i}" for i in range(m)]


def test_input_span_offsets_are_dense():
    spans = build_input_spans(7, "a b c d e f g h i j k l", "en", "s")
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    media = [s for s in spans if s["kind"] == "media"]
    assert len(media) == 7 % 3
    assert all(s["text"] == "" for s in media)


try:
    from hypothesis import given, settings as hyp_settings, strategies as st
    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:
    words_strategy = st.lists(
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
                min_size=1, max_size=14),
        min_size=9, max_size=120)

    @given(words_strategy, st.integers(min_value=0, max_value=10**9))
    @hyp_settings(max_examples=150, deadline=None)
    def test_contract_holds_for_arbitrary_words(words, doc_id):
        """The ground-truth contract (doc_parts ↔ extraction output) must
        hold for ANY ≥9-word lowercase-alnum text, not just testdata."""
        text = " ".join(words)
        opts = Options(fast=True, comments=False, with_metadata=False,
                       **RELAXED)
        html = assemble_html(build_input_spans(doc_id, text, "en", "src1"))
        res = bare_extraction(html, opts, doc_id=str(doc_id))
        assert _got(res) == _want(expected_output_spans(doc_id, text)), text
