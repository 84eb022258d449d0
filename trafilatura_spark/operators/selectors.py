"""Candidate-subtree and discard selectors.

Programmatic equivalents of the reference's BODY_XPATH-style rules
(/root/reference/lib/src/xpaths.dart).  Each selector is a scan over DOM
nodes with class/id substring predicates — conceptually a prioritized
CASE WHEN over node attributes, first-match-wins (SURVEY.md §2.3).
Pattern tables are carried over verbatim; they ARE the semantics.
"""

from __future__ import annotations

from ..dom import Node

# xpaths.dart:17-43
BODY_CLASS_PATTERNS = [
    # reference lists postContent/articleText/ArticleContent separately;
    # matching here is on lowercased attrs, so each appears once
    "post-text", "post_text", "post-body", "post-entry", "postentry",
    "post-content", "post_content", "postcontent",
    "post_inner_wrapper", "article-text", "articletext",
    "entry-content", "article-content", "article__content", "article-body",
    "article__body", "articlebody", "articlecontent", "page-content",
    "text-content", "body-text", "article__container", "art-content",
]

# xpaths.dart:46-55
BODY_ID_PATTERNS = [
    "entry-content", "article-content", "article__content", "article-body",
    "article__body", "articlebody", "body-text", "art-content",
]

# xpaths.dart:58-74
SECONDARY_BODY_PATTERNS = [
    "post-bodycopy", "storycontent", "story-content", "postarea",
    "art-postcontent", "theme-content", "blog-content", "section-content",
    "single-content", "single-post", "main-column", "wpb_text_column",
    "story-body", "field-body", "fulltext",
]

# xpaths.dart:77-84
CONTENT_CLASS_PATTERNS = [
    "content-main", "content_main", "content-body", "content__body",
    "main-content", "page-content",
]

_CANDIDATE_TAGS = ("article", "div", "main", "section")

# xpaths.dart:190-202
COMMENTS_CLASS_PATTERNS = [
    "commentlist", "comment-page", "comment-list", "comments-content",
    "post-comments", "comments", "comment-", "article-comments", "comol",
    "disqus_thread", "dsq-comments",
]

# xpaths.dart:250-317
OVERALL_DISCARD_PATTERNS = [
    "footer", "related", "viral", "shar", "share-", "share", "social",
    "sociable", "syndication", "jp-", "dpsp-content", "embedded", "embed",
    "newsletter", "subnav", "cookie", "tags", "tag-list", "sidebar", "banner",
    "bar", "meta", "menu", "nav", "avigation", "navbar", "navbox", "post-nav",
    "breadcrumb", "bread-crumb", "author", "button", "byline", "rating",
    "widget", "attachment", "timestamp", "user-info", "user-profile", "-ad-",
    "-icon", "article-infos", "nfoline", "outbrain", "taboola", "criteo",
    "options", "expand", "consent", "modal-content", " ad ", "permission",
    "next-", "-stories", "most-popular", "mol-factbox", "zendeskform",
    "message-container", "slide", "viewport", "premium", "overlay",
    "paid-content", "paidcontent", "obfuscated", "blurred",
]

# xpaths.dart:320-339
HIDDEN_PATTERNS = [
    "comments-title", "nocomments", "reply-", "-reply-", "message",
    "reader-comments", "akismet", "suggest-links", "hide-", "-hide-",
    "hide-print", "hidden", " hidden", " hide", "noprint", "display:none",
    "display: none", "notloaded",
]

_DISCARD_TAGS = ("div", "item", "li", "p", "section", "span")


def _class_id(elem: Node) -> tuple[str, str]:
    return elem.attrs.get("class", "").lower(), elem.attrs.get("id", "").lower()


def _by_tag(tree: Node, tags: tuple) -> dict:
    """ONE pre-order walk bucketing descendants by tag (document order
    preserved within each bucket).  Selector functions below iterate their
    tag lists in the same per-tag order as before, so results are
    identical — this just replaces N full-tree walks with one."""
    want = {t: [] for t in tags}
    get = want.get
    stack = list(reversed(tree.children))
    pop = stack.pop
    extend = stack.extend
    while stack:
        node = pop()
        bucket = get(node.tag)
        if bucket is not None:
            bucket.append(node)
        if node.children:
            extend(reversed(node.children))
    return want


def select_body_elements(tree: Node) -> list[Node]:
    """5-tier first-match-wins candidate cascade (xpaths.dart:87-187)."""
    buckets = _by_tag(tree, ("article", "div", "main", "section"))
    results: list[Node] = []
    # tier 1: strong class/id/itemprop signals
    for tag in _CANDIDATE_TAGS:
        for elem in buckets[tag]:
            cls, eid = _class_id(elem)
            if any(p in cls for p in BODY_CLASS_PATTERNS) or \
               any(p in eid for p in BODY_ID_PATTERNS) or \
               elem.attrs.get("itemprop") == "articleBody":
                results.append(elem)
    if results:
        return [results[0]]
    # tier 2: first <article>
    if buckets["article"]:
        return [buckets["article"][0]]
    # tier 3: secondary patterns / role=article
    for tag in _CANDIDATE_TAGS:
        for elem in buckets[tag]:
            cls, eid = _class_id(elem)
            if any(p in cls or p in eid for p in SECONDARY_BODY_PATTERNS) or \
               elem.attrs.get("role") == "article":
                results.append(elem)
    if results:
        return [results[0]]
    # tier 4: content patterns / exact content
    for tag in _CANDIDATE_TAGS:
        for elem in buckets[tag]:
            cls, eid = _class_id(elem)
            if any(p in cls or p in eid for p in CONTENT_CLASS_PATTERNS) or \
               eid == "content" or cls == "content":
                results.append(elem)
    if results:
        return [results[0]]
    # tier 5: main*
    for tag in ("article", "div", "section", "main"):
        for elem in buckets[tag]:
            cls, eid = _class_id(elem)
            role = elem.attrs.get("role", "")
            if cls.startswith("main") or eid.startswith("main") or role.startswith("main"):
                results.append(elem)
    results.extend(buckets["main"])
    if results:
        return [results[0]]
    return []


def select_comment_elements(tree: Node) -> list[Node]:
    """Comment container selection (xpaths.dart:205-223)."""
    results = []
    buckets = _by_tag(tree, ("div", "section", "ul", "ol"))
    for tag in ("div", "section", "ul", "ol"):
        for elem in buckets[tag]:
            cls, eid = _class_id(elem)
            if any(p in cls or p in eid for p in COMMENTS_CLASS_PATTERNS):
                results.append(elem)
    return results


def select_elements_to_discard(tree: Node) -> list[Node]:
    """Boilerplate discard scan (xpaths.dart:342-380)."""
    results = []
    buckets = _by_tag(tree, _DISCARD_TAGS)
    for tag in _DISCARD_TAGS:
        for elem in buckets[tag]:
            cls, eid = _class_id(elem)
            role = elem.attrs.get("role", "").lower()
            style = elem.attrs.get("style", "").lower()
            if any(p in cls or p in eid or p in role for p in OVERALL_DISCARD_PATTERNS):
                results.append(elem)
            elif any(p in cls or p in eid or p in style for p in HIDDEN_PATTERNS):
                results.append(elem)
            elif elem.attrs.get("aria-hidden") == "true":
                results.append(elem)
    return results


def select_teasers_to_discard(tree: Node) -> list[Node]:
    """xpaths.dart:383-398."""
    results = []
    buckets = _by_tag(tree, _DISCARD_TAGS)
    for tag in _DISCARD_TAGS:
        for elem in buckets[tag]:
            cls, eid = _class_id(elem)
            if "teaser" in cls or "teaser" in eid:
                results.append(elem)
    return results


def select_precision_discard_elements(tree: Node) -> list[Node]:
    """xpaths.dart:401-425."""
    buckets = _by_tag(tree, ("header",) + _DISCARD_TAGS)
    results = list(buckets["header"])
    for tag in _DISCARD_TAGS:
        for elem in buckets[tag]:
            cls, eid = _class_id(elem)
            style = elem.attrs.get("style", "")
            if "bottom" in cls or "bottom" in eid or "link" in cls or "link" in eid \
               or "border" in style:
                results.append(elem)
    return results


def select_overall_discard_elements(tree: Node) -> list[Node]:
    """Union of discard selectors for precision pre-cleaning (xpaths.dart:428-437)."""
    seen: list[Node] = []
    ids = set()
    for elem in (select_elements_to_discard(tree)
                 + select_precision_discard_elements(tree)
                 + select_teasers_to_discard(tree)):
        if id(elem) not in ids:
            ids.add(id(elem))
            seen.append(elem)
    return seen


def select_basic_clean_elements(tree: Node) -> list[Node]:
    """Baseline-path cleaning targets (xpaths.dart:743-766)."""
    buckets = _by_tag(tree, ("aside", "div", "footer", "script", "style"))
    results = list(buckets["aside"])
    for elem in buckets["div"]:
        cls, eid = _class_id(elem)
        if "footer" in cls or "footer" in eid:
            results.append(elem)
    results.extend(buckets["footer"])
    results.extend(buckets["script"])
    results.extend(buckets["style"])
    return results


# -- metadata selectors (xpaths.dart:503-740) --------------------------------

AUTHOR_PATTERNS = [
    "author", "author-name", "authorname", "byline", "channel-name", "zuozhe",
    "bianji", "xiaobian", "submitted-by", "posted-by", "username", "byl",
    "journalist-name", "screenname", "writer",
]

AUTHOR_DISCARD_PATTERNS = [
    "comments", "commentlist", "title", "date", "sidebar", "is-hidden",
    "quote", "comment-list", "comments-list", "embedly-instagram",
    "productreviews", "figure", "article-share", "article-support", "print",
    "category", "meta-date", "meta-reviewer",
]

CATEGORY_CLASS_PATTERNS = [
    "post-info", "postinfo", "post-meta", "postmeta", "meta", "entry-meta",
    "entry-info", "entry-utility", "postpath", "entry-categories",
    "entry-footer", "post-category", "postcategory", "entry-category",
    "cat-links", "entry-header",
]

TAG_CLASS_PATTERNS = [
    "tags", "entry-tags", "jp-relatedposts", "entry-utility", "tag",
    "postmeta", "meta", "entry-meta", "topics", "tags-links",
]

TITLE_CLASS_PATTERNS = [
    "post-title", "entry-title", "headline", "post__title", "article-title",
    "title",
]


def select_author_elements(tree: Node) -> list[Node]:
    """xpaths.dart:524-560."""
    results = []
    buckets = _by_tag(tree, ("a", "address", "div", "link", "p", "span",
                             "strong", "author"))
    for tag in ("a", "address", "div", "link", "p", "span", "strong"):
        for elem in buckets[tag]:
            cls, eid = _class_id(elem)
            rel = elem.attrs.get("rel", "")
            itemprop = elem.attrs.get("itemprop", "")
            data_testid = elem.attrs.get("data-testid", "")
            if rel in ("author", "me") or eid == "author" or cls == "author" or \
               "author" in itemprop or data_testid in ("AuthorCard", "AuthorURL"):
                results.append(elem)
                continue
            if any(p in cls or p in eid for p in AUTHOR_PATTERNS):
                results.append(elem)
    results.extend(buckets["author"])
    return results


def select_author_discard_elements(tree: Node) -> list[Node]:
    """xpaths.dart:585-612."""
    results = []
    buckets = _by_tag(tree, ("a", "div", "section", "span", "time", "figure"))
    for tag in ("a", "div", "section", "span"):
        for elem in buckets[tag]:
            cls, eid = _class_id(elem)
            data_component = elem.attrs.get("data-component", "").lower()
            if any(p in cls or p in eid or p in data_component
                   for p in AUTHOR_DISCARD_PATTERNS):
                results.append(elem)
    results.extend(buckets["time"])
    results.extend(buckets["figure"])
    return results


def select_category_links(tree: Node) -> list[Node]:
    """xpaths.dart:635-665 — returns inner a[href] nodes."""
    results = []
    buckets = _by_tag(tree, ("div", "p", "footer", "li", "span", "header"))
    for tag in ("div", "p", "footer", "li", "span", "header"):
        for elem in buckets[tag]:
            cls, eid = _class_id(elem)
            if any(p in cls or eid.startswith(p) for p in CATEGORY_CLASS_PATTERNS):
                results.extend(a for a in elem.iterdesc("a") if "href" in a.attrs)
    for elem in buckets["div"]:
        if elem.class_name in ("row", "tags"):
            results.extend(a for a in elem.iterdesc("a") if "href" in a.attrs)
    return results


def select_tag_links(tree: Node) -> list[Node]:
    """xpaths.dart:682-701."""
    results = []
    buckets = _by_tag(tree, ("div", "p"))
    for tag in ("div", "p"):
        for elem in buckets[tag]:
            cls = elem.attrs.get("class", "").lower()
            if any(p in cls for p in TAG_CLASS_PATTERNS):
                results.extend(a for a in elem.iterdesc("a") if "href" in a.attrs)
    return results


def select_cats_tags_links(tree: Node) -> tuple[list[Node], list[Node]]:
    """Category and tag link selection sharing ONE tree walk — results are
    identical to calling the two selectors separately."""
    buckets = _by_tag(tree, ("div", "p", "footer", "li", "span", "header"))
    cats: list[Node] = []
    for tag in ("div", "p", "footer", "li", "span", "header"):
        for elem in buckets[tag]:
            cls, eid = _class_id(elem)
            if any(p in cls or eid.startswith(p) for p in CATEGORY_CLASS_PATTERNS):
                cats.extend(a for a in elem.iterdesc("a") if "href" in a.attrs)
    for elem in buckets["div"]:
        if elem.class_name in ("row", "tags"):
            cats.extend(a for a in elem.iterdesc("a") if "href" in a.attrs)
    tags_links: list[Node] = []
    for tag in ("div", "p"):
        for elem in buckets[tag]:
            cls = elem.attrs.get("class", "").lower()
            if any(p in cls for p in TAG_CLASS_PATTERNS):
                tags_links.extend(a for a in elem.iterdesc("a")
                                  if "href" in a.attrs)
    return cats, tags_links


def select_title_elements(tree: Node) -> list[Node]:
    """xpaths.dart:714-740."""
    results = []
    h_buckets = {"h1": [], "h2": [], "h3": []}
    classed = []
    for elem in tree.iterdesc():
        b = h_buckets.get(elem.tag)
        if b is not None:
            b.append(elem)
        if elem.attrs.get("class", "") in ("entry-title", "post-title"):
            classed.append(elem)
    for tag in ("h1", "h2", "h3"):
        for elem in h_buckets[tag]:
            cls, eid = _class_id(elem)
            itemprop = elem.attrs.get("itemprop", "")
            if any(p in cls or p in eid or p in itemprop for p in TITLE_CLASS_PATTERNS):
                results.append(elem)
    results.extend(classed)
    return results
