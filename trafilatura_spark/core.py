"""Per-document extraction lifecycle.

Re-expression of /root/reference/lib/src/core.dart:108-336
(bareExtraction + trafilaturaSequence): load → lang gate → metadata →
clean → convert → comments → main cascade → fallback comparison →
baseline rescue → size gates → span emission.

Error semantics mirror core.dart:333-335: any per-document failure
yields a null result (status='error'), never an exception — on Spark a
task must not die because one document is pathological
(SURVEY.md §4.3.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .dom import Node, get_body, parse_html
from .operators.baseline import baseline
from .operators.cleaning import clean_copy, convert_tags, tree_cleaning
from .operators.deduplication import content_fingerprint
from .operators.fallbacks import compare_extraction
from .operators.main_extractor import extract_comments, extract_content
from .operators.metadata import extract_metadata
from .operators.normalize import normalize_output_tree
from .operators.render import emit_spans, render_txt
from .operators.selectors import select_comment_elements
from .settings import Options
from .watchdog import DocTimeout, check_deadline, clear_budget, doc_budget


@dataclass
class ExtractionResult:
    doc_id: str = ""
    spans: list = field(default_factory=list)
    meta: dict | None = None
    text: str = ""
    comments_text: str = ""
    status: str = "ok"      # ok | empty | error | rejected | timeout
    tier: str = "main"      # main | readability | justext | baseline | none
    len_text: int = 0
    body: Node | None = None           # output-vocabulary tree (for sinks)
    commentsbody: Node | None = None


def load_html(content: str) -> Node | None:
    """Parse + sanity-check (utils.dart:194-235 loadHtml).

    Repairs the faulty-doctype / self-closing ``<html/>`` cases before
    parsing and rejects non-HTML (no 'html' marker and <2 body children).
    """
    if not isinstance(content, str):
        return None
    beginning = content[:50].lower()
    check_flag = "html" not in beginning
    # repairFaultyHtml (utils.dart:170-192)
    if "doctype" in beginning:
        first_nl = content.find("\n")
        head_line = content if first_nl == -1 else content[:first_nl]
        import re as _re
        head_line = _re.sub(r"^< ?! ?DOCTYPE[^>]*/[^<]*>", "", head_line, flags=_re.I)
        content = head_line + (content[first_nl:] if first_nl != -1 else "")
    lines = content.split("\n", 3)
    for i, line in enumerate(lines[:3]):
        if "<html" in line and line.rstrip().endswith("/>"):
            import re as _re
            content = _re.sub(r"(<html[^>]*?)\s*/>", r"\1>", content, count=1, flags=_re.I)
            break
    try:
        tree = parse_html(content)
    except Exception:
        return None
    if check_flag and len(get_body(tree).children) < 2:
        return None
    return tree


def check_html_lang(tree: Node, target: str, strict: bool = False) -> bool:
    """Meta/og-locale/html@lang language gate (utils.dart:417-449).

    The target is normalized to its lowercase primary subtag ('en-US',
    'EN' → 'en') — the document side already extracts two-letter
    lowercase tokens, so an unnormalized target would reject every
    document carrying a language header."""
    import re as _re
    lang_re = _re.compile(r"([a-z]{2})")
    m = lang_re.match(target.lower())
    target = m.group(1) if m else target.lower()
    for want_attr, want_val in (("http-equiv", "content-language"),
                                ("property", "og:locale")):
        elems = [e for e in tree.iterdesc("meta")
                 if e.attrs.get(want_attr, "").lower() == want_val
                 and e.attrs.get("content")]
        if elems:
            for elem in elems:
                langs = lang_re.findall(elem.attrs["content"].lower())
                if target in langs:
                    return True
            return False
    if strict:
        candidates = [tree] if tree.tag == "html" else []
        candidates += [e for e in tree.iterdesc("html")]
        with_lang = [e for e in candidates if e.attrs.get("lang")]
        if with_lang:
            for elem in with_lang:
                langs = lang_re.findall(elem.attrs["lang"].lower())
                if target in langs:
                    return True
            return False
    return True


def _prune_duplicate_elements(bodies: list[Node], options: Options) -> None:
    """Drop span-emitting elements whose rendered text repeats beyond
    ``max_repetitions`` (count tested before increment — the
    duplicateTest semantics, deduplication.dart:335-349).  Walk order and
    the text keys mirror ``emit_spans`` exactly, and one shared counter
    spans body + comments, so the pruned tree yields the same span list
    the old span-level filter produced — but every sink (spans, txt,
    serializations, fingerprint) now sees the same content."""
    from .operators.render import _CONTAINERS, render_inline

    counts: dict[str, int] = {}

    def walk(node: Node) -> None:
        for child in list(node.children):
            kind = child.tag
            if kind in _CONTAINERS or (kind == "quote" and child.children):
                walk(child)
                continue
            if kind == "graphic":
                text = child.attrs.get("alt") or child.attrs.get("title") or ""
            else:
                text = render_inline(child, options.formatting)
            if len(text) > options.min_duplcheck_size:
                seen = counts.get(text, 0) + 1
                counts[text] = seen
                if seen - 1 > options.max_repetitions:
                    child.drop_tree(keep_tail=False)

    for body in bodies:
        walk(body)


def trafilatura_sequence(converted_tree: Node, cleaned_backup: Node,
                         raw_body_fn, options: Options,
                         backup_factory=None) -> tuple[Node, str, int, str]:
    """Main cascade with fallbacks (core.dart:108-142).

    ``raw_body_fn`` supplies a PRISTINE, freely-mutable body tree on
    each call (the reference passes copies of the raw body to
    compareExtraction/baseline); suppliers let the fast path skip the
    per-document defensive copy entirely and pay only on rescue."""
    postbody, temp_text, len_text = extract_content(converted_tree, options,
                                                    backup_factory)
    tier = "main"
    check_deadline()  # tier boundary: main → fallback comparison
    if not options.fast:
        # cleaned_backup is consumed here (it has no later reader), so it
        # is passed without a defensive copy
        postbody, temp_text, len_text, tier = compare_extraction(
            cleaned_backup, raw_body_fn, postbody, temp_text,
            len_text, options)
    check_deadline()  # tier boundary: fallbacks → baseline rescue
    if len_text < options.min_extracted_size and options.focus != "precision":
        postbody, temp_text, len_text = baseline(raw_body_fn())
        tier = "baseline"
    return postbody, temp_text, len_text, tier


def _apply_prune_patterns(working_body: Node, options: Options) -> None:
    """User pruning before any cleaning (core.dart:232-244 pruneXpath —
    the reference hands the expressions to querySelectorAll, so they are
    CSS selectors; invalid ones are skipped).  XPath-syntax expressions
    (//div[@class="ad"], upstream trafilatura's prune_xpath dialect) are
    translated by dom.xpath_to_css so ported configs work unchanged.
    Bare-word patterns additionally fall back to class/id substring
    matching (engine extension, pinned by test_prune_patterns_option)."""
    if not options.prune_patterns:
        return
    from .dom import css_select
    for pattern in options.prune_patterns:
        try:
            matched = css_select(working_body, pattern)
        except ValueError:
            matched = []
        for elem in matched:
            if elem.parent is not None:
                elem.drop_tree()
        if not matched and pattern.isalnum():
            for elem in working_body.find_all():
                ident = (elem.attrs.get("class", "") + " "
                         + elem.attrs.get("id", "")).lower()
                if elem.parent is not None and pattern in ident:
                    elem.drop_tree()


def bare_extraction(filecontent: str, options: Options | None = None,
                    doc_id: str = "") -> ExtractionResult:
    """Full per-document pipeline (core.dart:147-336), wall-clock-bounded.

    The reference bounds per-document exceptions only (core.dart:333-335);
    ``options.doc_timeout_sec`` additionally bounds per-document TIME
    (watchdog.py) — a budget overrun yields ``status='timeout'`` the same
    way a failure yields ``status='error'``: the task never dies, the row
    is counted."""
    options = options or Options()
    result = ExtractionResult(doc_id=doc_id)
    try:
        with doc_budget(options.doc_timeout_sec):
            return _bare_extraction_impl(filecontent, options, result)
    except DocTimeout:
        # belt-and-suspenders: a late alarm can abort doc_budget's own
        # restore machinery mid-unwind; re-disarm so the stale deadline
        # cannot poison every later document in this worker
        clear_budget()
        return ExtractionResult(doc_id=doc_id, status="timeout", tier="none")
    except Exception:
        # core.dart:333-335 — swallow, count, never fail the task
        return ExtractionResult(doc_id=doc_id, status="error", tier="none")


def _bare_extraction_impl(filecontent: str, options: Options,
                          result: ExtractionResult) -> ExtractionResult:
    if filecontent is None or \
       not (options.min_file_size <= len(filecontent) <= options.max_file_size):
        result.status = "rejected"
        result.tier = "none"
        return result
    tree = load_html(filecontent)
    if tree is None:
        result.status = "rejected"
        result.tier = "none"
        return result

    if options.lang and not check_html_lang(tree, options.lang):
        result.status = "rejected"
        result.tier = "none"
        return result

    meta = None
    if options.with_metadata:
        meta = extract_metadata(tree, default_url=options.url,
                                author_blacklist=options.author_blacklist)
        if options.url_blacklist and meta.get("url") in options.url_blacklist:
            result.status = "rejected"
            result.tier = "none"
            return result
        if options.only_with_metadata and not (
            meta.get("date") and meta.get("title") and meta.get("url")
        ):
            result.status = "rejected"
            result.tier = "none"
            return result

    check_deadline()  # stage boundary: load + metadata → cleaning
    working_body = get_body(tree)
    _apply_prune_patterns(working_body, options)
    conv_url = options.url or (meta or {}).get("url")

    fast = options.fast
    if fast:
        # fast path: compare_extraction never runs, so nothing reads
        # the pristine working_body afterwards on the success path —
        # clean it IN PLACE and let pristine_body() re-derive a fresh
        # copy from the source only when a rescue actually fires
        cleaned = tree_cleaning(working_body, options)
    else:
        # fused copy+clean: one walk that never materializes the
        # subtrees cleaning deletes (~8% of the default path was the
        # full-body defensive copy); working_body stays pristine
        cleaned = clean_copy(working_body, options)

    def pristine_body() -> Node:
        """A freely-mutable body in its pre-cleaning state.  Fast
        mode re-parses the source (working_body was consumed by the
        in-place cleaning) — rescue-only, so the re-parse amortizes
        to ~0; non-fast copies the retained pristine body."""
        if not fast:
            return working_body.copy()
        t2 = load_html(filecontent)
        b2 = get_body(t2)
        _apply_prune_patterns(b2, options)
        return b2

    # the backup feeds compare_extraction only — skip the full-tree
    # copy in fast mode (the bench/oracle hot path)
    cleaned_backup = cleaned.copy() if not fast else cleaned
    converted = convert_tags(cleaned, options, url=conv_url)

    if options.comments:
        commentsbody, temp_comments, len_comments, converted = \
            extract_comments(converted, options)
    else:
        commentsbody, temp_comments, len_comments = Node("body"), "", 0

    if options.focus == "precision":
        for elem in select_comment_elements(converted):
            if elem.parent is not None:
                elem.drop_tree()

    def rebuild_converted() -> Node:
        # deterministic replay of the cleaning→conversion→comment-
        # removal steps above from a pristine body: the wild-text
        # second chance (extract_content) calls this ONLY when the
        # main pass comes up short, replacing the every-document
        # backup copy with an on-miss rebuild
        # non-fast: fused copy+clean straight off the retained
        # pristine body; fast: pristine_body() re-parses and the
        # fresh tree is cleaned in place (it has no other reader)
        c2 = clean_copy(working_body, options) if not fast \
            else tree_cleaning(pristine_body(), options)
        c = convert_tags(c2, options, url=conv_url)
        if options.comments:
            c = extract_comments(c, options)[3]
        if options.focus == "precision":
            for elem in select_comment_elements(c):
                if elem.parent is not None:
                    elem.drop_tree()
        return c

    postbody, temp_text, len_text, tier = trafilatura_sequence(
        converted, cleaned_backup, pristine_body, options,
        backup_factory=rebuild_converted)
    check_deadline()  # stage boundary: cascade → guards + emission

    # tree size guard (core.dart:285-296)
    if options.max_tree_size is not None:
        n_elems = sum(1 for _ in postbody.iterdesc())
        if n_elems > options.max_tree_size:
            from .dom import strip_tags
            strip_tags(postbody, "hi")
            if sum(1 for _ in postbody.iterdesc()) > options.max_tree_size:
                result.status = "rejected"
                result.tier = "none"
                return result

    # size gates (core.dart:299-301)
    if len_text < options.min_output_size and \
            len_comments < options.min_output_comm_size:
        result.status = "empty"
        result.tier = tier
        return result

    # output normalization (xml_utils.dart:315-316 via controlXmlOutput):
    # collapse nested head/code/p, drop word-char-less empties.  The
    # reference runs this on the XML serialization path; the span table
    # is this engine's serialization, so it runs before emit_spans (and
    # thus also feeds render_txt — consistent across sinks).
    normalize_output_tree(postbody, options.formatting)

    result.tier = tier
    result.body = postbody
    result.commentsbody = commentsbody \
        if options.comments and commentsbody.children else None
    included_comments = commentsbody \
        if options.comments and commentsbody.children else None
    if options.dedup:
        # deterministic per-document duplicateTest
        # (deduplication.dart:335-349): the reference tests the cached
        # count BEFORE incrementing, so max_repetitions+1 copies are
        # kept and occurrences beyond that are dropped.  Duplicates are
        # pruned from the TREE (as the reference does) so the span
        # table, txt/csv/json renderings and the fingerprint all agree.
        # The reference's cross-document LRU is order-dependent and
        # lives as a relational stage instead (functions/dedup.py).
        _prune_duplicate_elements(
            [postbody] + ([included_comments] if included_comments
                          is not None else []),
            options)
        if included_comments is not None and not included_comments.children:
            included_comments = None
    result.spans = emit_spans(
        postbody,
        included_comments,
        include_formatting=options.formatting,
    )
    result.text = render_txt(postbody, options.formatting)
    result.comments_text = render_txt(commentsbody, options.formatting) \
        if commentsbody.children else ""
    result.len_text = len_text
    if meta is not None and options.fingerprint:
        # core.dart:547-560: computed only when the output format is
        # not in _txtFormats — Options.fingerprint carries that gate.
        meta["fingerprint"] = content_fingerprint(
            f"{meta.get('title') or ''} {result.text}")
    result.meta = meta
    if not result.spans:
        result.status = "empty"
    return result


def extract_txt(filecontent: str, options: Options | None = None) -> str | None:
    """Convenience string API (core.dart:384-434 extract)."""
    res = bare_extraction(filecontent, options)
    if res.status in ("rejected", "error", "empty"):
        return None
    return res.text


_TXT_META_ORDER = ("title", "author", "url", "hostname", "description",
                   "sitename", "date", "categories", "tags", "fingerprint",
                   "id", "license")


def extract(filecontent: str, output_format: str = "txt",
            options: Options | None = None) -> str | None:
    """Top-level string extraction with output-format dispatch
    (core.dart:25-105 determineReturnString): txt/markdown with metadata
    front-matter, json, csv, html, xml, xmltei.  Markdown = txt with
    ``options.formatting`` enabled."""
    from .operators.serialize import (render_csv, render_html, render_json,
                                      render_tei, render_xml)
    options = options or Options()
    if output_format == "markdown" and not options.formatting:
        # "Markdown always needs formatting" (settings.dart:172-174)
        from dataclasses import replace
        options = replace(options, formatting=True)
    res = bare_extraction(filecontent, options)
    if res.status in ("rejected", "error", "empty") or res.body is None:
        return None
    if output_format == "xml":
        return render_xml(res.body, res.meta, res.commentsbody)
    if output_format == "xmltei":
        return render_tei(res.body, res.meta, res.commentsbody)
    if output_format == "csv":
        return render_csv(res.meta, res.text, res.comments_text)
    if output_format == "json":
        return render_json(res.meta, res.text, res.comments_text)
    if output_format == "html":
        return render_html(res.body, (res.meta or {}).get("title"))
    # txt / markdown: optional metadata front-matter then rendered body
    parts: list[str] = []
    if options.with_metadata and res.meta:
        parts.append("---")
        for name in _TXT_META_ORDER:
            val = res.meta.get(name)
            if isinstance(val, list):
                val = ", ".join(val)
            if val:
                parts.append(f"{name}: {val}")
        parts.append("---")
    body_txt = res.text
    if res.comments_text:
        body_txt = f"{body_txt}\n{res.comments_text}"
    parts.append(body_txt)
    return "\n".join(parts).strip()
