"""PDF text + layout extraction (pure stdlib; no external PDF library).

The north rule's extraction tier covers "HTML boilerplate strip, PDF/layout
parse, DOM heuristics"; the reference handles HTML only, so this module is
an engine extension following the same output contract: a PDF byte column
becomes the ordered span table ``(kind, text, media_ref, offset)`` that the
HTML cascade emits (SURVEY.md §1.2).

Scope (honest about it):

- object scanner: ``N G obj … endobj`` bodies, minimal dict reading
  (``/Filter /FlateDecode``, ``/Type /Page(s)``, ``/Contents``, ``/Kids``,
  ``/Subtype /Image``, ``/Width``, ``/Height``, ``/XObject`` maps) — no
  xref dependence, so lightly-damaged files still parse (tolerant-scan
  recovery, same philosophy as the HTML parser's html5 recovery);
- streams: raw or FlateDecode (zlib); other filters (DCTDecode, CCITT…)
  are treated as opaque — image XObjects become ``graphic`` spans with a
  ``pdf:obj<N>`` media_ref and width/height metadata in the span text,
  mirroring the multimodal seam (functions/multimodal.py): the *bytes*
  decode is where a codec library would plug in, the structure is real;
- content streams: ``BT…ET`` text blocks with ``Tf`` (font size), ``Tj``,
  ``'``, ``"``, ``TJ``, ``Td/TD/T*`` (line advance), and ``/Name Do``
  image placement; PDF string escapes (``\\(``, ``\\)``, ``\\\\``,
  ``\\n`` …, octal) are unescaped; hex strings ``<…>`` supported for the
  latin-1 range;
- layout: each ``BT`` block is one span; lines inside a block are joined
  with single spaces; blocks whose active font size is ≥ HEAD_FONT_SIZE
  emit ``kind='head'`` (font-size-based structure recovery), everything
  else ``kind='p'``.  Page order follows the /Pages /Kids tree when
  present, else object order.

The Spark surface is ``pdf_spans_df`` — one narrow Arrow-batched
mapInPandas stage, same shape as the HTML extraction pipeline
(operators/pipeline.py): embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import re
import zlib

HEAD_FONT_SIZE = 14.0

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
# (?!\d) blocks backtracking from defeating the indirect-reference
# lookahead: '/Length 50 0 R' must NOT match with group='5'
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
_NUM_REF_RE = re.compile(rb"/(Contents|Root|Pages)\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:[^][]|\[[^]]*\])*)\]", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_XOBJ_MAP_RE = re.compile(rb"/XObject\s*<<(.*?)>>", re.S)
_XOBJ_ENTRY_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")
_DIM_RE = re.compile(rb"/(Width|Height)\s+(\d+)")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[([^][]*)\]", re.S)

# content-stream tokens: strings, hex strings, names, numbers, operators
_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"      # literal string (1-level; escapes ok)
    rb"|<[0-9A-Fa-f\s]*>"          # hex string
    rb"|/[^\s/<>()\[\]]+"          # name
    rb"|[-+]?\d*\.?\d+"            # number
    rb"|\[|\]"
    rb"|[A-Za-z'\"*]+",            # operator
    re.S)

_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
        b"(": b"(", b")": b")", b"\\": b"\\"}


def _decode_hex_string(tok: bytes) -> str:
    """PDF hex string `<...>` (token INCLUDING delimiters) → text:
    whitespace stripped, odd length zero-padded, latin-1 byte view (the
    UTF-16BE BOM branch is the documented extension point)."""
    hexs = re.sub(rb"\s", b"", tok[1:-1])
    if len(hexs) % 2:
        hexs += b"0"
    return bytes.fromhex(hexs.decode("ascii")).decode("latin-1")


def _unescape_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1:i + 2]
            if nxt in _ESC:
                out += _ESC[nxt]
                i += 2
                continue
            if b"0" <= nxt <= b"7":
                j = i + 1
                while j < min(i + 4, n) and b"0" <= raw[j:j + 1] <= b"7":
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
                continue
            if nxt in (b"\n", b"\r"):
                # backslash-EOL line continuation: remove BOTH (PDF spec);
                # \r\n counts as one EOL
                i += 2
                if nxt == b"\r" and raw[i:i + 1] == b"\n":
                    i += 1
                continue
            i += 1  # unknown escape: drop backslash, keep the char
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _decode_stream(dict_part: bytes, stream: bytes) -> bytes | None:
    """Raw or FlateDecode; None = opaque (unsupported filter)."""
    if b"/Filter" not in dict_part:
        return stream
    if b"/FlateDecode" in dict_part:
        try:
            return zlib.decompress(stream)
        except zlib.error:
            return None
    return None


class _PdfDoc:
    __slots__ = ("objects", "streams", "trailer")

    def __init__(self, data: bytes):
        # sequential scan, not one big regex: compressed stream bytes can
        # contain 'endobj'/'N 0 obj' byte sequences, so stream payloads are
        # sliced by the dict's /Length (direct integers; the regex scan to
        # 'endstream' is only the fallback for indirect lengths) and object
        # headers found inside a previous stream are skipped.
        self.objects: dict[int, bytes] = {}
        self.streams: dict[int, bytes] = {}
        pos = 0
        for m in _OBJ_HEAD_RE.finditer(data):
            if m.start() < pos:
                continue
            num = int(m.group(1))
            em = data.find(b"endobj", m.end())
            # bound the stream scan by this object's endobj: an
            # unbounded search scans to end-of-file for EVERY
            # stream-less object (quadratic on annotation/font-heavy or
            # hostile PDFs — ~10k objects x file size).  +9 covers a
            # 'stream' token straddling the keyword boundary.
            sm = _STREAM_START_RE.search(
                data, m.end(), em + 9 if em != -1 else len(data))
            if sm is not None and (em == -1 or sm.start() < em):
                dict_part = data[m.end():sm.start()]
                lm = _LENGTH_RE.search(dict_part)
                if lm:
                    start = sm.end()
                    end = start + int(lm.group(1))
                else:
                    start = sm.end()
                    end = data.find(b"endstream", start)
                    if end == -1:
                        end = len(data)
                    while end > start and data[end - 1:end] in (b"\r", b"\n"):
                        end -= 1
                self.objects[num] = dict_part
                self.streams[num] = data[start:end]
                after = data.find(b"endobj", end)
                pos = after + 6 if after != -1 else end
            else:
                body_end = em if em != -1 else len(data)
                self.objects[num] = data[m.end():body_end]
                pos = body_end + 6 if em != -1 else len(data)
        self.trailer = data[data.rfind(b"trailer"):] if b"trailer" in data \
            else data


def _page_order(doc: _PdfDoc) -> list[int]:
    """Page object numbers in /Pages /Kids order, else /Type /Page objects
    in object order (tolerant-scan fallback)."""
    pages_obj = None
    root = _NUM_REF_RE.search(doc.trailer)
    candidates = []
    if root and root.group(1) == b"Root":
        root_body = doc.objects.get(int(root.group(2)), b"")
        pm = _NUM_REF_RE.search(root_body)
        if pm and pm.group(1) == b"Pages":
            pages_obj = int(pm.group(2))
    if pages_obj is None:
        for num, body in doc.objects.items():
            if b"/Type" in body and b"/Pages" in body:
                pages_obj = num
                break
    if pages_obj is not None:
        # walk the page tree: /Kids may reference intermediate /Pages
        # nodes (balanced trees from pdfTeX etc.).  DEPTH-first, kids
        # expanded in front of later siblings — a breadth-first pop
        # deferred an intermediate node's leaves until after ALL its
        # root-level siblings, transposing page order whenever leaves
        # and subtree nodes are siblings (pdftk-merged mixed-depth
        # trees)
        work = [pages_obj]
        seen = set()
        while work:
            node = work.pop(0)
            body = doc.objects.get(node, b"")
            if b"/Pages" in body or _KIDS_RE.search(body):
                if node in seen:  # cycle guard on tree nodes
                    continue
                seen.add(node)
                km = _KIDS_RE.search(body)
                if km:
                    work[:0] = [int(r.group(1))
                                for r in _REF_RE.finditer(km.group(1))]
            else:
                candidates.append(node)
    if not candidates:
        candidates = [num for num, body in sorted(doc.objects.items())
                      if b"/Type" in body and b"/Page" in body
                      and b"/Pages" not in body]
    return candidates


def _page_text_ops(doc: _PdfDoc, page_obj: int):
    """Yield ('text', font_size, str) | ('image', obj_num, w, h) in content
    order for one page."""
    body = doc.objects.get(page_obj, b"")
    xobjects: dict[bytes, int] = {}
    xm = _XOBJ_MAP_RE.search(body)
    if xm:
        xobjects = {e.group(1): int(e.group(2))
                    for e in _XOBJ_ENTRY_RE.finditer(xm.group(1))}
    content_objs = [int(m.group(2)) for m in _NUM_REF_RE.finditer(body)
                    if m.group(1) == b"Contents"]
    if not content_objs:
        # array form: /Contents [5 0 R 6 0 R] (pdfTeX and friends)
        am = _CONTENTS_ARR_RE.search(body)
        if am:
            content_objs = [int(r.group(1))
                            for r in _REF_RE.finditer(am.group(1))]
    for cnum in content_objs:
        raw = doc.streams.get(cnum)
        if raw is None:
            continue
        content = _decode_stream(doc.objects.get(cnum, b""), raw)
        if content is None:
            continue
        yield from _scan_content(content, xobjects, doc)


def _scan_content(content: bytes, xobjects: dict[bytes, int], doc: _PdfDoc):
    font_size = 0.0
    in_text = False
    lines: list[list[str]] = [[]]
    stack: list[bytes] = []  # recent non-string tokens (operands)
    in_array = False
    array_parts: list[str] = []

    def flush_block():
        nonlocal lines
        text = " ".join(" ".join(p for p in ln if p).strip()
                        for ln in lines if any(p.strip() for p in ln))
        text = re.sub(r"\s+", " ", text).strip()
        lines = [[]]
        return text

    for m in _TOKEN_RE.finditer(content):
        tok = m.group(0)
        c0 = tok[:1]
        if c0 == b"(":
            if in_array:
                array_parts.append(_unescape_pdf_string(tok[1:-1]))
            else:
                stack.append(tok)
                stack = stack[-8:]
            continue
        if c0 == b"<" and tok != b"<<":
            if in_array:
                array_parts.append(_decode_hex_string(tok))
            else:
                stack.append(tok)
            continue
        if tok == b"[":
            in_array = True
            array_parts = []
            continue
        if tok == b"]":
            in_array = False
            continue
        if c0 == b"/" or c0.isdigit() or c0 in b"+-.":
            stack.append(tok)
            stack = stack[-8:]
            continue
        # operator
        if tok == b"BT":
            in_text = True
            lines = [[]]
        elif tok == b"ET":
            if in_text:
                text = flush_block()
                if text:
                    yield ("text", font_size, text)
            in_text = False
        elif tok == b"Tf":
            try:
                font_size = float(stack[-1])
            except (ValueError, IndexError):
                pass
        elif tok in (b"Td", b"TD", b"T*"):
            if in_text:
                lines.append([])
        elif tok == b"Tj" or tok == b"'" or tok == b'"':
            if in_text:
                for prev in reversed(stack):
                    if prev[:1] == b"(":
                        lines[-1].append(_unescape_pdf_string(prev[1:-1]))
                        break
                    if prev[:1] == b"<" and prev != b"<<":
                        lines[-1].append(_decode_hex_string(prev))
                        break
                if tok != b"Tj":
                    lines.append([])  # ' and " imply T*
        elif tok == b"TJ":
            if in_text and array_parts:
                lines[-1].append("".join(array_parts))
                array_parts = []
        elif tok == b"Do":
            name = next((s for s in reversed(stack) if s[:1] == b"/"), None)
            if name is not None:
                obj = xobjects.get(name[1:])
                if obj is not None:
                    xbody = doc.objects.get(obj, b"")
                    if b"/Image" in xbody:
                        dims = {d.group(1): int(d.group(2))
                                for d in _DIM_RE.finditer(xbody)}
                        if in_text:
                            text = flush_block()
                            if text:
                                yield ("text", font_size, text)
                        yield ("image", obj,
                               dims.get(b"Width", 0), dims.get(b"Height", 0))
        stack = []
    # unterminated BT block: flush (tolerant recovery)
    if in_text:
        text = flush_block()
        if text:
            yield ("text", font_size, text)


def extract_pdf_spans(data: bytes) -> list[dict]:
    """PDF bytes -> ordered spans [(kind, text, media_ref, offset)]
    matching the HTML pipeline's output contract.  Never raises: malformed
    input yields []."""
    try:
        if not data or b"%PDF" not in data[:1024]:
            return []
        doc = _PdfDoc(data)
        spans: list[dict] = []
        for page in _page_order(doc):
            for item in _page_text_ops(doc, page):
                if item[0] == "text":
                    _, size, text = item
                    spans.append({
                        "kind": "head" if size >= HEAD_FONT_SIZE else "p",
                        "text": text, "media_ref": ""})
                else:
                    _, obj, w, h = item
                    spans.append({"kind": "graphic", "text": f"{w}x{h}",
                                  "media_ref": f"pdf:obj{obj}"})
        for i, s in enumerate(spans):
            s["offset"] = i
        return spans
    except Exception:
        return []


# -- deterministic fixture generator ------------------------------------------

def _wrap(text: str, width: int = 8) -> list[str]:
    words = text.split(" ")
    return [" ".join(words[i:i + width]) for i in range(0, len(words), width)]


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(doc_id: int, text: str) -> bytes:
    """Minimal valid two-page PDF from the corpus ground-truth contract
    (sources/corpus.py doc_parts): page 1 = head (18pt) + para1 (11pt) +
    ``doc_id % 3`` image XObjects, page 2 = para2.  Content streams are
    Flate-compressed for even doc_ids, raw otherwise (both decode paths
    exercised).  Fully deterministic."""
    from .corpus import doc_parts
    head, para1, para2, n_media = doc_parts(doc_id, text)

    def content_page1() -> bytes:
        ops = ["BT", "/F1 18 Tf", "72 720 Td", f"({_esc(head)}) Tj", "ET",
               "BT", "/F1 11 Tf", "72 680 Td"]
        for ln in _wrap(para1):
            ops.append(f"({_esc(ln)}) Tj")
            ops.append("T*")
        ops.append("ET")
        for i in range(n_media):
            ops.append(f"/Im{i} Do")
        return "\n".join(ops).encode("latin-1")

    def content_page2() -> bytes:
        ops = ["BT", "/F1 11 Tf", "72 720 Td"]
        for ln in _wrap(para2):
            ops.append(f"({_esc(ln)}) Tj")
            ops.append("T*")
        ops.append("ET")
        return "\n".join(ops).encode("latin-1")

    compress = doc_id % 2 == 0
    objs: list[bytes] = []

    def stream_obj(num: int, payload: bytes, extra: str = "") -> bytes:
        if compress and not extra:
            payload = zlib.compress(payload)
            filt = " /Filter /FlateDecode"
        else:
            filt = ""
        d = f"<< /Length {len(payload)}{filt}{extra} >>".encode("latin-1")
        return (f"{num} 0 obj\n".encode("latin-1") + d
                + b"\nstream\n" + payload + b"\nendstream\nendobj\n")

    n_imgs = doc_id % 3
    img_objs = list(range(8, 8 + n_imgs))
    xobj_entries = " ".join(f"/Im{i} {o} 0 R" for i, o in enumerate(img_objs))
    xobj = f" /XObject << {xobj_entries} >>" if img_objs else ""

    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>"
                b"\nendobj\n")
    objs.append((f"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R "
                 f"/Resources << /Font << /F1 7 0 R >>{xobj} >> >>"
                 f"\nendobj\n").encode("latin-1"))
    objs.append(b"4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R "
                b"/Resources << /Font << /F1 7 0 R >> >> >>\nendobj\n")
    objs.append(stream_obj(5, content_page1()))
    objs.append(stream_obj(6, content_page2()))
    for i, o in enumerate(img_objs):
        w, h = 16 * (i + 1), 9 * (i + 1)
        fake = bytes((doc_id + i + b) % 256 for b in range(32))
        objs.append(stream_obj(
            o, fake,
            extra=(f" /Type /XObject /Subtype /Image /Width {w} /Height {h}"
                   f" /ColorSpace /DeviceGray /BitsPerComponent 8"
                   f" /Filter /DCTDecode")))
    

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for o in objs:
        offsets.append(len(out))
        out += o
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode("latin-1")
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode("latin-1")
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode("latin-1")
    return bytes(out)


# -- Spark surface ------------------------------------------------------------

PDF_SPANS_SCHEMA = ("doc_id string, offset int, kind string, text string, "
                    "media_ref string")


def make_pdf_batches(options=None, content_col: str = "pdf",
                     id_col: str = "doc_id"):
    """mapInPandas batches function emitting the extraction pipeline's
    EXTRACTED_SCHEMA rows from a (doc_id, pdf binary) input — plugs PDF
    corpora into the same checkpointed job shell
    (job.run_extraction(batches_fn=...)): bucketing, salted waves,
    observe() metrics and resume all apply unchanged; tier='pdf'."""
    import pandas as pd

    min_out = getattr(options, "min_output_size", 1) if options else 1

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[content_col]):
                spans = extract_pdf_spans(bytes(blob)
                                          if blob is not None else b"")
                text = " ".join(s["text"] for s in spans
                                if s["kind"] != "graphic")
                status = "ok" if spans and len(text) >= min_out else "empty"
                # len_text 0 on empty rows, matching the HTML path's
                # size gate (core.py): it describes the EMITTED text, so
                # metrics like extraction_metrics' total_chars don't
                # count characters that were never emitted
                rows.append((str(doc_id),
                             spans if status == "ok" else [],
                             text if status == "ok" else None,
                             None, status, "pdf" if spans else "none",
                             len(text) if status == "ok" else 0))
            yield pd.DataFrame(
                rows, columns=["doc_id", "spans", "text", "meta", "status",
                               "tier", "len_text"])

    return batches


def pdf_spans_df(df, content_col: str = "pdf", id_col: str = "doc_id"):
    """Binary PDF column -> span table, one narrow Arrow-batched stage
    (same plan shape as the HTML extraction pipeline — no shuffle)."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[content_col]):
                for s in extract_pdf_spans(bytes(blob) if blob is not None
                                           else b""):
                    rows.append((str(doc_id), s["offset"], s["kind"],
                                 s["text"], s["media_ref"]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "offset", "kind", "text",
                               "media_ref"])

    return df.mapInPandas(batches, schema=PDF_SPANS_SCHEMA)
