"""JusText-style paragraph classification fallback.

Re-expression of /root/reference/lib/src/external.dart:143-254.
Stopword-density classification: relationally this is
explode(words) ⋈ stoplist → ratio (SURVEY.md §2.7), executed per
document inside the UDF.
"""

from __future__ import annotations

import re

from ..dom import Node
from ..functions.textutils import trim
from .linkdensity import calculate_link_density

_WS = re.compile(r"\s+")

# external.dart:147-169 — English stoplist
JT_STOPLIST = frozenset("""
a about above after again against all am an and any are aren't as at be because
been before being below between both but by can't cannot could couldn't did
didn't do does doesn't doing don't down during each few for from further had
hadn't has hasn't have haven't having he he'd he'll he's her here here's hers
herself him himself his how how's i i'd i'll i'm i've if in into is isn't it
it's its itself let's me more most mustn't my myself no nor not of off on once
only or other ought our ours ourselves out over own same shan't she she'd
she'll she's should shouldn't so some such than that that's the their theirs
them themselves then there there's these they they'd they'll they're they've
this those through to too under until up very was wasn't we we'd we'll we're
we've were weren't what what's when when's where where's which while who who's
whom why why's with won't would wouldn't you you'd you'll you're you've your
yours yourself yourselves
""".split())


_JT_TAGS = ("p", "div", "li", "td", "th", "item", "cell")
_JT_TAGSET = frozenset(_JT_TAGS)


def _own_scope(elem: Node) -> tuple[str, int]:
    """(own text, link text length) of a container: its ``text`` plus every
    descendant's text/tail reachable without entering a nested container —
    nested containers are opaque (only their tails count; their content is
    classified separately).  This is how text that lives as element *tails*
    (bare ``<div>text<br>text…`` articles) reaches the classifier."""
    parts: list[str] = [elem.text]
    link_len = 0

    def walk(node: Node, in_link: bool) -> None:
        nonlocal link_len
        for ch in node.children:
            if ch.tag in _JT_TAGSET:
                if ch.tail:
                    parts.append(ch.tail)
                    if in_link:
                        link_len += len(ch.tail)
                continue
            is_link = in_link or ch.tag in ("a", "ref")
            if ch.text:
                parts.append(ch.text)
                if is_link:
                    link_len += len(ch.text)
            walk(ch, is_link)
            if ch.tail:
                parts.append(ch.tail)
                if in_link:
                    link_len += len(ch.tail)

    walk(elem, False)
    return "".join(parts), link_len


def classify_paragraphs(tree: Node, stoplist: frozenset = JT_STOPLIST) -> list[tuple[str, bool]]:
    """(text, is_boilerplate) per paragraph-ish element (external.dart:175-196).

    Deviation from the Dart port (documented waiver, SURVEY.md §2.7): the
    reference classifies every container with its *full* subtree text, so a
    good ``<div>`` duplicates the text of its good ``<p>`` children in the
    output (external.dart:179).  Here leaf containers are classified with
    their full text (identical to the reference for them) and non-leaf
    containers with their *own* text only (text + tails outside nested
    containers) — each piece of text is classified exactly once, and
    tail-text articles (``<div>text<br>text…``) are still recovered."""
    out = []
    for elem in tree.iterdesc(*_JT_TAGS):
        if elem.find(*_JT_TAGS) is None:
            text = trim(elem.text_content())
            if not text:
                continue
            link_density = calculate_link_density(elem)
        else:
            raw, link_len = _own_scope(elem)
            text = trim(raw)
            if not text:
                continue
            link_density = link_len / len(raw) if raw else 0.0
        words = _WS.split(text)
        stopword_count = sum(1 for w in words if w.lower() in stoplist)
        is_boilerplate = (
            link_density > 0.4
            or (len(words) < 10 and stopword_count / len(words) < 0.3)
            or len(words) < 3
        )
        out.append((text, is_boilerplate))
    return out


def try_justext(tree: Node) -> Node:
    """external.dart:219-241 — body of non-boilerplate paragraphs."""
    result_body = Node("body")
    try:
        for text, is_boilerplate in classify_paragraphs(tree):
            if is_boilerplate:
                continue
            p = Node("p")
            p.text = text
            result_body.append(p)
    except Exception:
        pass
    return result_body


def justext_rescue(tree: Node, options) -> tuple[Node, str, int]:
    """external.dart:244-254."""
    body = try_justext(tree)
    text = trim(body.text_content())
    return body, text, len(text)
