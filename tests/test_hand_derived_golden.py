"""Hand-derived real-page golden — the independent fidelity sample.

`extract_real_pages` (and the pytest cache manifest behind it) is pinned
by fixtures that scripts/regen_*_golden.py REGENERATE FROM THE PIPELINE
ITSELF, so a silent extraction regression that slips past review could
be "blessed" into the manifest.  This module breaks that loop for a
12-page sample spanning every extraction tier: each expected span list
below is derived IN THIS FILE from the raw page bytes using only the
stdlib (regex tag removal, html.unescape, whitespace collapse) — a
line-by-line transcription of the reference rules that apply to exactly
these pages, citing the Dart source per step.  No trafilatura_spark
extraction code is imported to BUILD an expectation, and no regen
script writes this file; if the engine drifts, these assertions fail
against values it cannot influence.

Page selection (all from /root/reference/test/cache, the reference's own
unit-test corpus): 5 main-tier pages — two straight candidate hits, one
wild-text recovery after a nav false-positive, one wild-text recovery
with no candidate at all, one entity/soft-hyphen stress page; 3 justext
pages covering the three distinct rescue triggers (empty own result,
sanitized-tag veto of a GOOD own result, readability-tree veto); 3
readability pages covering the 2x-length branch and the lenText==0
branch; 1 baseline page (tier-2 <article> text) with comment spans.

Derivation checklist common to all pages (verified against the raw
bytes in each `derive_*`):
 - span kind vocabulary and order come from the emit walk
   (main_extractor.dart:536-610) / the fallback sanitizers;
 - main/justext/baseline span text is whitespace-collapsed
   (trim, utils.dart:352-358 — any unicode whitespace run, including
   NBSP after entity decoding, becomes one space);
 - readability-tier span text is NOT re-collapsed: tags are dropped,
   entities decoded, source whitespace preserved verbatim
   (external.dart:257-314 sanitizes the tree, not the text nodes);
 - entity decoding happens at parse time, so &#8230;/&uuml;/&lt; decode
   exactly once — escaped markup in source text stays literal text.
"""

from __future__ import annotations

import hashlib
import html
import json
import pathlib
import re

import pytest

from trafilatura_spark.core import bare_extraction
from trafilatura_spark.settings import Options
from trafilatura_spark.sources.loading import decode_file

CACHE = pathlib.Path("/root/reference/test/cache")
FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def _read(page: str) -> str:
    return decode_file((CACHE / page).read_bytes())


def between(h: str, a: str, b: str) -> str:
    """Source slice between two unique literal anchors."""
    assert h.count(a) == 1, f"anchor not unique: {a!r}"
    i = h.index(a) + len(a)
    return h[i:h.index(b, i)]


def untag(s: str) -> str:
    """Drop markup, keep character data (what text_content() yields).
    Comments go first — their interior may contain '>'."""
    return re.sub(r"<[^>]*>", "", re.sub(r"<!--.*?-->", "", s, flags=re.S))


def ws(s: str) -> str:
    """trim (utils.dart:352-358): collapse unicode-whitespace runs."""
    return " ".join(s.split())


# --- main tier ---------------------------------------------------------------

def derive_rs_ingenieure(h):
    """Straight tier-5 candidate hit.

    BODY_XPATH fifth expression (xpaths.dart:168-180: class/id/role
    startsWith 'main') selects <div class="main"> — no earlier tier
    matches (no post/article/entry class, no <article>, no exact
    'content').  Inside it: an <img> (graphic: images handled via alt
    text + src, main_extractor.dart handleImage), an <h3> (head), and
    one literal <p>; the empty <div class="second content"> emits
    nothing.  All text is literal UTF-8 in the source (the „“ quotes
    and § included), so the spans are the source runs trim-collapsed.
    """
    img_tag = between(h, '<div class="image_box">', "</div>")
    src = between(img_tag, 'src="', '"')
    alt = between(img_tag, 'alt="', '"')
    head = between(h, "<h3>", "</h3>")
    para = ws(untag(between(h, "<h3>Tragwerksplanung</h3>", "</p>")))
    return "main", [["graphic", ws(alt), src], ["head", ws(head), ""],
                    ["p", para, ""]]


def derive_die_partei(h):
    """Straight tier-5 candidate hit with entity decoding and
    link-density drops.

    <div id=main> (unquoted attribute; tier 5, xpaths.dart:168-180).
    The <h1> and <h2 class=newsheading> become heads (&#8230; decodes
    to …); the newstext <p> is kept (&#8211; decodes to –).  Dropped
    inside the candidate: the date <p class=newsdatum> and the second
    <p> (each contains ONLY a link — 100% link density,
    main_extractor.dart handleParagraphs / linkdensity checks), and the
    prevpost/nextpost divs (link-only likewise).
    """
    h1 = ws(html.unescape(between(h, "id=main><h1>", "</h1>")))
    h2 = ws(html.unescape(between(h, '<h2 class="newsheading">', "</h2>")))
    para = ws(html.unescape(between(h, "class=newstext><p>", "</p>")))
    return "main", [["head", h1, ""], ["head", h2, ""], ["p", para, ""]]


def derive_speicherguide(h):
    """Wild-text recovery after a candidate false positive.

    Tier 5 matches <div id="mainnav"> (id startsWith 'main',
    xpaths.dart:168-180) — a navigation bar whose content the unwanted-
    section prune discards entirely, so own extraction is empty and
    recoverWildText (main_extractor.dart:399-437) scans the backup tree
    for p/quote/code/table.  The page has exactly five <p> elements:
    the article lead survives (below); the two '<p> <br> </p>' are
    whitespace-only (textCharsTest fails); the iframe-only <p> is empty
    after embeds are cleaned away (treeCleaning); the comment-form
    '<p>' is auto-closed empty by the HTML parser (a <div> follows it).
    In the survivor the gallery <a><img></a> prefix is dropped (links
    stripped in the wild scan, images off by default), leaving the
    literal UTF-8 text, trim-collapsed.
    """
    para = ws(untag(between(h, '<div class="detail">', "</p>")))
    return "main", [["p", para, ""]]


def derive_wehranlage(h):
    """Straight tier-1 candidate hit; soft-hyphen / NBSP stress page.

    <div class="entry-content"> matches the FIRST BODY_XPATH class
    list (xpaths.dart:28-43 'entry-content').  Its single child
    <div class="summary"> holds one bare text run: no <p> descendants,
    so potentialTags gains 'div' (main_extractor.dart:548-554) and the
    div emits as one paragraph.  The text keeps its literal U+00AD soft
    hyphens (not whitespace, not collapsed), while &nbsp; decodes to
    U+00A0 WHICH IS unicode whitespace — trim folds it into the
    adjacent space, and the double space after 'sehen,' collapses too.
    """
    para = ws(html.unescape(between(h, '<div class="summary">', "</div>")))
    assert "­" in para  # soft hyphens preserved end-to-end
    return "main", [["p", para, ""]]


def derive_austria(h):
    """Wild-text recovery with NO candidate at all.

    Every BODY_XPATH expression misses (the only class='content' exact
    match sits inside a <form>, which treeCleaning removes first), so
    recoverWildText scans the whole backup tree for <p> elements.  Of
    the page's 18 <p>s only two survive: the rest sit under ancestors
    matching OVERALL_DISCARD / HIDDEN patterns (xpaths.dart:250-339 —
    the cookie banner under 'cookie', contact blocks under 'footer',
    the photo-slider under 'hide-overflow' → 'hide-', the newsletter
    modal under 'newsletter'/'overlay') pruned by
    pruneUnwantedSections before the scan.  Survivor 1 is the intro
    <p>: the inline <a> is stripped (links off), &uuml;-entities
    decode, and the trailing '<br />\\n&nbsp;' trims to nothing.
    Survivor 2 (the copyrightModal <p>) is the page's quirk: its
    markup is HTML-ESCAPED in the source (&lt;a href=&quot;…), so
    after the parser's single entity decode it is literal TEXT and is
    emitted verbatim — markup-looking strings included — with the
    double space after 'Hauptdomains' trim-collapsed.
    """
    p1 = ws(html.unescape(untag(
        "Salzburg liebt" + between(h, "<p>Salzburg liebt", "</p>"))))
    p2_raw = "Die Österreich Werbung" + between(
        h, "<p>Die Österreich Werbung", "</p>")
    assert "<" not in p2_raw  # markup is escaped in source — text, not tags
    p2 = ws(html.unescape(p2_raw))
    assert '<a href="http://www.austria.info"' in p2
    return "main", [["p", p1, ""], ["p", p2, ""]]


# --- justext tier ------------------------------------------------------------

def derive_lanouvellerepublique(h):
    """Justext rescue trigger 1: own result EMPTY.

    No BODY_XPATH candidate yields text (the article body is served by
    Angular at runtime; the static page is chrome), so lenText == 0 and
    lenAlgo == 70 flips to readability (external.dart:65-66), which is
    still under minExtractedSize (250, settings.dart:26) so the justext
    rescue fires (external.dart:93-104) and its non-empty result wins.
    What justext classifies good is the leaked Angular template text —
    two {{…}} interpolation blocks that are plain character data to the
    parser, stopword-dense French.  Expected text = the two div runs
    trim-collapsed (the source wraps them over indented lines).
    """
    p1 = ws(between(h, 'inline-edition-header-status">', "<img"))
    p2 = ws(between(h, 'inline-edition-header-full-name">', "</div>"))
    assert p1.startswith("{{") and p2.startswith("{{")
    return "justext", [["p", p1, ""], ["p", p2, ""]]


def derive_computerbase(h):
    """Justext rescue trigger 2: sanitized-tag veto of a GOOD result.

    Own extraction succeeds (4 paragraphs, 2059 chars) and no length
    branch flips to readability — but the readability TREE contains
    sanitized-tag members (aside/iframe/…, external.dart:20-22), which
    triggers the rescue UNCONDITIONALLY (external.dart:93-94); justext
    returns the same 4 article paragraphs and, 2059 not being > 4x
    their length, REPLACES the own result (external.dart:99-104).  The
    reference's own golden records tier justext for this page — the
    veto-overrides-good-result quirk is pinned behavior.  Expected
    text: the four <p class="p text-width"> blocks in document order,
    inline links stripped, entities decoded, trim-collapsed.
    """
    ps = re.findall(r'<p class="p text-width">(.*?)</p>', h, re.S)
    assert len(ps) == 4
    return "justext", [["p", ws(html.unescape(untag(x))), ""] for x in ps]


def derive_chineselyrics(h):
    """Justext rescue trigger 3: own result empty on <br>-separated copy.

    The tier-1 candidate (<div class='post-body entry-content'>,
    xpaths.dart:28-43) carries the lyrics as BARE text runs separated
    by <br/> — no <p> descendants, and the emit walk produces nothing
    for tail-text, so own extraction is empty; readability (701 chars)
    is taken but its tree holds an <iframe> → justext rescue replaces
    it.  Justext treats each block element as one segment: the whole
    post-body div is ONE paragraph whose text is the <br>-separated
    runs CONCATENATED WITH NO SEPARATOR (a run's own spaces survive —
    note the '…ni ' + 'Repeat Chorus' seam below, and the CJK/pinyin
    seams like '讨不回来Ai').  Title (h3), the post footer line
    ('Posted by' + 'K A' + 'at' + '12:11 PM' runs, trim-collapsed) and
    the comment-form h4 are further good segments; the same h4 is also
    what extractComments (core.dart:259) emits as the comment span.
    """
    title = ws(between(h, "<h3 class='post-title entry-title'>", "</h3>"))
    body_div = between(h, "<div class='post-body entry-content'",
                       '<div id="fb-root">')
    lyrics = body_div[body_div.index("</iframe>") + len("</iframe>"):] \
        .replace("<br />", "").strip()
    assert "ni Repeat Chorus" in lyrics and "讨不回来Ai" in lyrics
    # own-scope text of the footer-line div: its nested
    # div.post-share-buttons is a separate (all-link → boilerplate)
    # segment per this repo's documented justext waiver (SURVEY.md §2.7:
    # containers classify their own text; nested containers are opaque)
    footer = ws(untag(between(
        h, "post-footer-line post-footer-line-1'>",
        "<div class='post-share-buttons")))
    assert footer == "Posted by K A at 12:11 PM"
    h4 = ws(between(h, "<h4 id='comment-post-message'>", "</h4>"))
    return "justext", [["p", title, ""], ["p", lyrics, ""],
                       ["p", footer, ""], ["p", h4, ""],
                       ["comment", h4, ""]]


# --- readability tier --------------------------------------------------------

def derive_blog_python(h):
    """Readability via the 2x-length branch; raw-text preservation.

    Own extraction gets 471 chars, readability 958 — lenAlgo > 2 *
    lenText flips to readability (external.dart:69-70); its tree has no
    sanitized-tag members and 958 ≥ 250, so no justext.  Inside the
    readability output most copy sits in container divs WITH block
    markup (kept as divs, then stripped to body-level text the span
    emitter does not serialize); the one leaf <div> without block
    markup became a <p> (readability_lxml.dart:286-297 'misused divs')
    and is the only emitted span.  Its text is the source run verbatim
    — LEADING NEWLINE INCLUDED — because the readability path never
    re-collapses text (external.dart:257-314 rewrites tags only).
    """
    para = between(h, "<div>\nWe hope you enjoy", "</div>")
    return "readability", [["p", "\nWe hope you enjoy" + para, ""]]


def derive_rnz(h):
    """Readability via the lenText == 0 branch.

    Own extraction is empty (the page is a JS shell; the only copy is
    the dpa teaser <p lang=de> in a nfy-ar template block no BODY_XPATH
    rule matches), so lenText == 0 && lenAlgo > 0 flips to readability
    (external.dart:65-66); 603 ≥ 250 and no sanitized tags → kept.
    The teaser <p> is the article node; its text is literal UTF-8
    («» quotes included) with no markup inside — emitted verbatim.
    """
    para = between(h, "<p lang=de>", "</p>")
    assert "<" not in para and "«" in para
    return "readability", [["p", para, ""]]


def derive_creativecommons(h):
    """Readability, multi-paragraph, whitespace-preserving quirks.

    lenText 196 vs lenAlgo 1371 → 2x branch (external.dart:69-70).
    Spans 1-3 are the three field-item <p>s with inline <a class=ext>
    anchors and '(link is external)' accessibility spans: tags drop,
    TEXT stays — giving the source-faithful seams 'Migration'+'auf' →
    'Migrationauf' and 'Zehnfache' + ' (link is external)' + '.'.
    Span 4 is the Drupal 'submitted' byline div (leaf div → p,
    readability_lxml.dart:286-297): '\\n      Gespeichert von ' +
    username span 'rasos' + ' am 24. Juli 2017 - 18:55    ' — leading
    newline+indent and trailing spaces preserved verbatim (readability
    path, no re-collapse).
    """
    seg = between(h, 'field-type-text-with-summary field-label-hidden">'
                  '<div class="field-items"><div class="field-item even">',
                  "</div>")
    # the block ends with a whitespace-only '<p> </p>' — dropped by the
    # readability text-clean pass (empty after trim), like any blank node
    ps = [x for x in re.findall(r"<p>(.*?)</p>", seg, re.S) if x.strip()]
    assert len(ps) == 3
    spans = [["p", html.unescape(untag(x)), ""] for x in ps]
    assert "Migrationauf" in spans[1][1]
    assert "das Zehnfache (link is external)." in spans[1][1]
    byline = untag(between(h, '<div class="submitted">', "</div>"))
    assert byline.startswith("\n") and byline.endswith("    ")
    spans.append(["p", byline, ""])
    return "readability", spans


# --- baseline tier -----------------------------------------------------------

def derive_telemedicus(h):
    """Baseline tier 2 (<article> text) + separately-extracted comments.

    The tier-1 candidate (<section itemprop="articleBody">,
    xpaths.dart:87-124) carries its copy as bare text between <br>s —
    the emit walk yields only three trailing <head>s, which the
    not-at-the-end pop removes, so own extraction is EMPTY.  Decision
    table: readability gets 209 chars (< 250) and its tree holds
    sanitized-tag members → justext rescue, which finds NOTHING good
    (jtResult false), so the kept result is still under
    minExtractedSize and core.dart:133-138 runs baseline() on the
    dirty backup clone.  No JSON-LD script exists (tier 1 skipped);
    tier 2 (baseline.dart:74-87) takes trim(<article>.text) — there is
    exactly one <article>, with no footer/script/style/aside inside
    for basicCleaning to remove — as ONE <p> span: the whole post
    INCLUDING its share/tag chrome ('Weiterempfehlen Drucken', the
    trailing tag-cloud words), entity-decoded and trim-collapsed.
    Comments ride extractComments (core.dart:259) regardless of tier:
    the first comment candidate (div class 'serendipity_comments',
    'comments' pattern, xpaths.dart:190-202) yields its two non-blank
    text blocks in document order.
    """
    art = between(h, "</header>", "</article>")
    art = art[art.index("<article"):]
    for t in ("<footer", "<script", "<style", "<aside"):
        assert t not in art
    para = ws(html.unescape(untag(art)))
    assert para.startswith("Dienstag, 13. Mai 2014")
    assert para.endswith("Handbuch Internetrecht Rezension")
    return "baseline", [["p", para, ""],
                        ["comment", "Noch keine Kommentare", ""],
                        ["comment", "Kommentar schreiben", ""]]


PAGES = {
    "rs-ingenieure.de.tragwerksplanung.html": derive_rs_ingenieure,
    "die-partei.net.luebeck.html": derive_die_partei,
    "speicherguide.de.schwierige.html": derive_speicherguide,
    "wehranlage-horka.de.887.html": derive_wehranlage,
    "austria.info.radfahren.html": derive_austria,
    "lanouvellerepublique.fr.martin.html": derive_lanouvellerepublique,
    "computerbase.de.htc.html": derive_computerbase,
    "chineselyrics4u.com.zhineng.html": derive_chineselyrics,
    "blog.python.org.html": derive_blog_python,
    "rnz.de.witzel.html": derive_rnz,
    "creativecommons.at.faircoin.html": derive_creativecommons,
    "telemedicus.info.rezension.html": derive_telemedicus,
}


@pytest.mark.parametrize("page", sorted(PAGES))
def test_hand_derived_spans(page):
    h = _read(page)
    want_tier, want_spans = PAGES[page](h)
    res = bare_extraction(h, Options(with_metadata=True), doc_id=page)
    assert res.status == "ok"
    assert res.tier == want_tier
    got = [[s["kind"], s["text"], s["media_ref"]] for s in res.spans]
    assert got == want_spans


@pytest.mark.parametrize("page", sorted(PAGES))
def test_hand_derived_matches_pinned_manifest(page):
    """The anti-circularity payoff: the hand derivation must agree with
    the regen-produced cache manifest — for these 12 pages the manifest
    is now independently validated, so a pipeline regression cannot be
    'blessed' into it unnoticed."""
    golden = json.loads((FIXTURES / "cache_golden.json").read_text())
    _, want_spans = PAGES[page](_read(page))
    payload = json.dumps(want_spans, ensure_ascii=False)
    assert hashlib.md5(payload.encode()).hexdigest() == golden[page]["digest"]
