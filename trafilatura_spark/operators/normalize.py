"""Output-tree normalization passes (xml_utils.dart:65-192).

``stripDoubleTags`` + ``removeEmptyElements`` run on the extracted body
before span emission (the reference applies them in controlXmlOutput,
xml_utils.dart:314-317, mutating ``document.body`` ahead of
serialization; here the span table IS the serialization, so the passes
sit directly before ``emit_spans``).  Real messy pages produce nested
``<p><p>`` and empty elements that the cascade can let through; these
passes are what keeps the final span list normalized.

Node-model note: the reference works on an XML DOM where a removed
element's trailing XmlText node survives in the parent; this module's
lxml-style text/tail model reproduces that by folding tails into the
previous sibling's tail (or the parent's text) on removal.
"""

from __future__ import annotations

from ..dom import Node
from ..functions.textutils import text_chars_test
from .render import render_inline

# xml_utils.dart:44 — parents under which same-tag nesting is legitimate
NESTING_WHITELIST = frozenset({"cell", "figure", "item", "note", "quote"})


def _previous_sibling(element: Node) -> Node | None:
    parent = element.parent
    if parent is None:
        return None
    prev = None
    for child in parent.children:
        if child is element:
            return prev
        prev = child
    return None


def merge_with_parent(element: Node, include_formatting: bool = False) -> None:
    """Fold an element's inline-rendered text into its parent's text flow
    and remove it (xml_utils.dart:111-148 mergeWithParent)."""
    parent = element.parent
    if parent is None:
        return
    full_text = render_inline(element, include_formatting)
    tail = element.tail or ""
    prev = _previous_sibling(element)
    if prev is not None:
        base = prev.tail or ""
        merged = f"{base} {full_text}" if base else f" {full_text}"
        prev.tail = merged + tail
    else:
        base = parent.text or ""
        merged = f"{base} {full_text}" if base else full_text
        parent.text = merged + tail
    parent.children.remove(element)
    element.parent = None


def remove_empty_elements(tree: Node) -> Node:
    """Remove childless elements whose inner text has no word characters
    (xml_utils.dart:151-172; graphic elements and children of <code> are
    kept)."""
    to_remove = [
        elem for elem in tree.iterdesc()
        if not elem.children
        and not text_chars_test(elem.text_content())
        and elem.parent is not None
        and elem.tag != "graphic"
        and elem.parent.tag != "code"
    ]
    for elem in to_remove:
        elem.drop_tree(keep_tail=True)
    return tree


def strip_double_tags(tree: Node, include_formatting: bool = False) -> Node:
    """Prevent nested head/code/p tags (xml_utils.dart:175-192): a
    same-tag descendant is merged into its parent's text flow unless the
    direct parent is a legitimate nesting container."""
    for tag in ("head", "code", "p"):
        for elem in reversed(tree.find_all(tag)):
            for subelem in elem.find_all(tag):
                parent = subelem.parent
                if parent is not None and parent.tag not in NESTING_WHITELIST:
                    merge_with_parent(subelem, include_formatting)
    return tree


def normalize_output_tree(body: Node,
                          include_formatting: bool = False) -> Node:
    """controlXmlOutput's normalization pair in reference order
    (xml_utils.dart:315-316)."""
    strip_double_tags(body, include_formatting)
    remove_empty_elements(body)
    return body
