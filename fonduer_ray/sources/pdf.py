"""Native PDF visual path: text-layer word extraction + the 3-pass linker.

The reference's ``PdfVisualParser`` shells out to poppler's ``pdftotext
-bbox-layout`` (``parser/visual_parser/pdf_visual_parser.py:107-139``) and
aligns HTML words with PDF words via a 3-pass linker (``:211-343``).
poppler is not available in this environment, so this module provides:

- ``pdf_extract_words``: a minimal pure-Python extractor for simple
  text-layer PDFs — objects located by scan, Flate/plain content streams,
  text operators BT/ET, Tf, Td/TD/T*/Tm, Tj/TJ/'/" interpreted with an
  approximate fixed per-char advance (CHAR_W x font size). Exact for PDFs
  written by ``generate_simple_pdf`` (same advance model); approximate
  boxes for foreign simple PDFs; entropy-coded/CID PDFs are out of scope.
- word post-processing to the reference's shape: delimiter splitting with
  the reference's separator regex, block-then-position sort
  (``:161-199``), top-left-origin coordinates, 1-based pages.
- ``link_word_lists``: a faithful port of the reference 3-pass linker —
  global exact match, windowed exact match (search_radius windows), fuzzy
  match with prefix/suffix shortcut + Levenshtein*edit_cost + offset_cost
  (``:211-343``) — as a pure function over (id, word) lists.
- ``attach_pdf_bboxes``: the engine-side ``parse()`` — writes per-word
  page/top/left/bottom/right arrays onto the document's sentences.
"""

from __future__ import annotations

import re
import zlib

#: reference separator set (pdf_visual_parser.py:67-70)
SEPARATORS = re.compile(
    r"([\(\)\,\?−“”‘’°\*']|(?<!http):|\.$|\.\.\.)"
)

#: approximate per-char advance as a fraction of the font size (Helvetica
#: average width); the generator below uses the same constant, making
#: round-trips exact
CHAR_W = 0.6

_OBJ_RGX = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.S)
_STREAM_RGX = re.compile(rb"stream\r?\n(.*?)\s*endstream", re.S)
_MEDIABOX_RGX = re.compile(
    rb"/MediaBox\s*\[\s*([\d.]+)\s+([\d.]+)\s+([\d.]+)\s+([\d.]+)\s*\]"
)
_CONTENTS_RGX = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")

#: content-stream tokens: strings, arrays, numbers, operators
_TOKEN_RGX = re.compile(
    rb"\((?:\\.|[^\\()])*\)|\[|\]|/[A-Za-z0-9]+|[-+.0-9]+|[A-Za-z'\"*]+"
)


def _decode_pdf_string(tok: bytes) -> str:
    body = tok[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == 0x5C and i + 1 < len(body):  # backslash escape
            n = body[i + 1]
            mapping = {0x6E: "\n", 0x72: "\r", 0x74: "\t", 0x62: "\b", 0x66: "\f"}
            out.append(mapping.get(n, chr(n)))
            i += 2
        else:
            out.append(chr(c))
            i += 1
    return "".join(out)


def pdf_extract_words(data: bytes):
    """-> (word_list, coordinate_map, (page_w, page_h)).

    ``word_list``: [((page, idx), word)] sorted by (block_top, block_left,
    top, left) per the reference; ``coordinate_map``: {(page, idx): (page,
    top, bottom, left, right)} in TOP-LEFT-origin points, pages 1-based."""
    objects: dict[int, bytes] = {}
    for m in _OBJ_RGX.finditer(data):
        objects[int(m.group(1))] = m.group(2)

    pages = []
    for num in sorted(objects):
        body = objects[num]
        if b"/Type" in body and b"/Page" in body and b"/MediaBox" in body:
            mb = _MEDIABOX_RGX.search(body)
            ct = _CONTENTS_RGX.search(body)
            if mb and ct:
                pages.append(
                    (
                        float(mb.group(3)) - float(mb.group(1)),
                        float(mb.group(4)) - float(mb.group(2)),
                        int(ct.group(1)),
                    )
                )
    word_list = []
    coordinate_map = {}
    page_dim = (612, 792)
    for page_num, (pw, ph, content_ref) in enumerate(pages, start=1):
        page_dim = (int(pw), int(ph))
        body = objects.get(content_ref, b"")
        sm = _STREAM_RGX.search(body)
        if not sm:
            continue
        stream = sm.group(1)
        if b"/FlateDecode" in body:
            stream = zlib.decompress(stream)
        raw_words = _interpret_content(stream, ph)
        # delimiter split + block sort (reference _coordinates_from_HTML)
        split_words = []
        for (block, top, bottom, left, right), text in raw_words:
            for content in SEPARATORS.split(text):
                if content:
                    split_words.append(((block, top, bottom, left, right), content))
        block_min: dict[int, tuple] = {}
        for (block, top, _b, left, _r), _t in split_words:
            cur = block_min.get(block)
            cand = (top, left)
            if cur is None or cand < cur:
                block_min[block] = cand
        split_words.sort(
            key=lambda w: block_min[w[0][0]] + (w[0][1], w[0][3])
        )
        for i, ((block, top, bottom, left, right), text) in enumerate(split_words):
            wid = (page_num, i)
            word_list.append((wid, text))
            coordinate_map[wid] = (
                page_num,
                int(top),
                int(bottom),
                int(left),
                int(right),
            )
    return word_list, coordinate_map, page_dim


def _interpret_content(stream: bytes, page_h: float):
    """Execute the text operators; yield ((block, top, bottom, left,
    right), text-run) per string, one block per BT..ET group."""
    out = []
    tokens = _TOKEN_RGX.findall(stream)
    x = y = 0.0
    lx = ly = 0.0  # line start
    size = 12.0
    leading = 0.0
    block = -1
    stack: list = []

    def emit(s: str) -> None:
        nonlocal x
        # emit per space-separated word with advancing cursor
        i = 0
        while i < len(s):
            if s[i] == " ":
                x += CHAR_W * size
                i += 1
                continue
            j = i
            while j < len(s) and s[j] != " ":
                j += 1
            w = s[i:j]
            left = x
            width = CHAR_W * size * len(w)
            top = page_h - y - size
            bottom = page_h - y
            out.append(((block, top, bottom, left, left + width), w))
            x += width
            i = j

    for tok in tokens:
        if tok.startswith(b"("):
            stack.append(_decode_pdf_string(tok))
        elif tok in (b"[", b"]"):
            continue
        elif tok.startswith(b"/"):
            stack.append(tok.decode("latin-1"))
        elif re.fullmatch(rb"[-+.0-9]+", tok):
            try:
                stack.append(float(tok))
            except ValueError:
                pass
        else:
            op = tok.decode("latin-1")
            if op == "BT":
                block += 1
                x = y = lx = ly = 0.0
                stack.clear()
            elif op == "ET":
                stack.clear()
            elif op == "Tf" and len(stack) >= 1 and isinstance(stack[-1], float):
                size = stack[-1]
                stack.clear()
            elif op in ("Td", "TD") and len(stack) >= 2:
                ty, tx = stack[-1], stack[-2]
                lx += tx
                ly += ty
                x, y = lx, ly
                if op == "TD":
                    leading = -ty
                stack.clear()
            elif op == "TL" and stack:
                leading = stack[-1]
                stack.clear()
            elif op == "T*":
                ly -= leading
                x, y = lx, ly
                stack.clear()
            elif op == "Tm" and len(stack) >= 6:
                lx, ly = stack[-2], stack[-1]
                x, y = lx, ly
                stack.clear()
            elif op == "Tj" and stack and isinstance(stack[-1], str):
                emit(stack[-1])
                stack.clear()
            elif op == "TJ":
                for item in stack:
                    if isinstance(item, str):
                        emit(item)
                    elif isinstance(item, float):
                        x -= item / 1000.0 * size
                stack.clear()
            elif op in ("'", '"'):
                s = next((v for v in reversed(stack) if isinstance(v, str)), None)
                ly -= leading
                x, y = lx, ly
                if s is not None:
                    emit(s)
                stack.clear()
            else:
                stack.clear()
    return out


def generate_simple_pdf(
    pages: list[list[tuple[str, float, float, float]]],
    page_w: float = 612,
    page_h: float = 792,
) -> bytes:
    """Write a minimal text-layer PDF: ``pages`` is a list of pages, each a
    list of (text, x, y, font_size) draw commands (PDF bottom-left origin).
    Uses the same CHAR_W advance model as the extractor."""
    objs: list[bytes] = []
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2*i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, cmds in enumerate(pages):
        page_obj = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {page_w} {page_h}] "
            f"/Contents {4 + 2*i} 0 R /Resources << /Font << /F1 "
            f"{font_num} 0 R >> >> >>"
        ).encode()
        content = b"\n".join(
            b"BT /F1 %.2f Tf %.2f %.2f Td (%s) Tj ET"
            % (sz, xx, yy, t.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)").encode("latin-1"))
            for t, xx, yy, sz in cmds
        )
        stream = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
        objs.append(page_obj)
        objs.append(stream)
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_pos)
    )
    return bytes(out)


def render_candidates_pdf(
    doc: dict,
    candidates: list[dict] | None = None,
    page_w: float = 612,
    page_h: float = 792,
    font_size: float = 10,
) -> bytes:
    """Debug visualizer (analog of the reference's PDF overlay,
    ``utils/visualizer.py:23-170``, which draws candidate bboxes on the
    rendered page): renders every sentence word at its attached bbox and
    strokes a red rectangle around each candidate argument span. Pure
    function -> PDF bytes; pages come from the words' ``page`` arrays.
    Debug artifact: the trailing xref offsets are stale after the overlay
    append (viewers that scan objects — like this module's extractor —
    are unaffected)."""
    by_page: dict[int, list] = {}
    sent_by_pos = {s["position"]: s for s in doc["sentences"]}
    for s in doc["sentences"]:
        if not s.get("page"):
            continue
        for i, w in enumerate(s["words"]):
            by_page.setdefault(s["page"][i], []).append(
                (w, s["left"][i], s["top"][i], s["bottom"][i])
            )
    rects: dict[int, list] = {}
    for cand in candidates or []:
        for j, pos in enumerate(cand.get("arg_sentence_positions", [])):
            s = sent_by_pos.get(pos)
            if s is None or not s.get("page"):
                continue
            cs, ce = cand["arg_char_starts"][j], cand["arg_char_ends"][j]
            offs = s["char_offsets"]
            idxs = [
                i for i in range(len(s["words"]))
                if offs[i] <= ce and offs[i] + len(s["words"][i]) - 1 >= cs
            ]
            if not idxs:
                continue
            left = min(s["left"][i] for i in idxs)
            right = max(s["right"][i] for i in idxs)
            top = min(s["top"][i] for i in idxs)
            bottom = max(s["bottom"][i] for i in idxs)
            rects.setdefault(s["page"][idxs[0]], []).append(
                (left, top, bottom, right)
            )
    n_pages = max(list(by_page) + list(rects) + [1])
    pages = []
    overlays = []
    for p in range(1, n_pages + 1):
        pages.append(
            [
                (w, left, page_h - bottom, font_size)
                for (w, left, top, bottom) in by_page.get(p, [])
            ]
        )
        overlays.append(rects.get(p, []))
    pdf = generate_simple_pdf(pages, page_w=page_w, page_h=page_h)
    # append rectangle strokes into each page's content stream
    for p, boxes in enumerate(overlays, start=1):
        if not boxes:
            continue
        extra = b"\n1 0 0 RG 0.8 w " + b" ".join(
            b"%.2f %.2f %.2f %.2f re S"
            % (l - 1, page_h - b_ - 1, (r - l) + 2, (b_ - t) + 2)
            for (l, t, b_, r) in boxes
        )
        pdf = _append_to_page_stream(pdf, p, extra)
    return pdf


def _append_to_page_stream(pdf: bytes, page_num: int, extra: bytes) -> bytes:
    """Append drawing ops to the Nth page's content stream of a PDF written
    by ``generate_simple_pdf`` (known object layout: content object =
    ``4 + 2*(page_num-1)``), fixing up the /Length entry."""
    obj_num = 4 + 2 * (page_num - 1)
    marker = b"%d 0 obj\n" % obj_num
    start = pdf.index(marker)
    end = pdf.index(b"\nendobj\n", start)
    body = pdf[start + len(marker) : end]
    sm = _STREAM_RGX.search(body)
    content = sm.group(1) + extra
    new_body = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
    return pdf[: start + len(marker)] + new_body + pdf[end:]


def _editdist(a: str, b: str) -> int:
    """Levenshtein distance (small strings; DP rows)."""
    if a == b:
        return 0
    if not a or not b:
        return len(a) + len(b)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def link_word_lists(
    html_word_list: list[tuple],
    pdf_word_list: list[tuple],
    search_max: int = 200,
    edit_cost: int = 20,
    offset_cost: int = 1,
) -> dict:
    """Port of the reference 3-pass linker (``pdf_visual_parser.py:211-343``):
    returns {html_word_id -> pdf_word_id} covering EVERY html word."""
    N, M = len(html_word_list), len(pdf_word_list)
    if N == 0 or M == 0:
        return {}
    html_to_pdf: list[int | None] = [None] * N
    pdf_to_html: list[int | None] = [None] * M

    def get_anchors(l: int, u: int):
        while l >= 0 and html_to_pdf[l] is None:
            l -= 1
        while u < N and html_to_pdf[u] is None:
            u += 1
        if l < 0:
            l, L = 0, 0
        else:
            L = html_to_pdf[l]
        if u >= N:
            u, U = N, M
        else:
            U = html_to_pdf[u]
        return l, u, L, U

    def link_exact(l: int, u: int) -> None:
        if l >= u:  # empty window (tiny search radius) — nothing to anchor
            return
        l, u, L, U = get_anchors(l, u)
        html_dict: dict[str, list[int]] = {}
        pdf_dict: dict[str, list[int]] = {}
        for i in range(l, u):
            if html_to_pdf[i] is None:
                html_dict.setdefault(html_word_list[i][1], []).append(i)
        for j in range(L, U):
            if pdf_to_html[j] is None:
                pdf_dict.setdefault(pdf_word_list[j][1], []).append(j)
        for word, hlist in html_dict.items():
            plist = pdf_dict.get(word, [])
            if len(hlist) == len(plist):
                for k in range(len(hlist)):
                    html_to_pdf[hlist[k]] = plist[k]
                    pdf_to_html[plist[k]] = hlist[k]

    # clamp: search_max < 2 would make the windowed-exact stride 0 (div by zero)
    search_radius = max(1, search_max // 2)
    search_order = [(-1) ** (i % 2) * (i // 2) for i in range(1, search_max + 1)]

    def link_fuzzy(i: int) -> None:
        word = html_word_list[i][1]
        l, u, L, U = get_anchors(i, i)
        offset = int(L + (float(i - l) / (u - l) if u > l else 0.0) * (U - L))
        indices = [min(max(offset + d, 0), M - 1) for d in search_order]
        cost = [0] * len(indices)
        for j, k in enumerate(indices):
            other = pdf_word_list[k][1]
            if (
                word.startswith(other)
                or word.endswith(other)
                or other.startswith(word)
                or other.endswith(word)
            ):
                html_to_pdf[i] = k
                return
            cost[j] = _editdist(word, other) * edit_cost + j * offset_cost
        html_to_pdf[i] = indices[min(range(len(cost)), key=cost.__getitem__)]

    # pass 1: global exact
    link_exact(0, N)
    # pass 2: windowed exact
    for i in range(((N + 2) // search_radius) + 1):
        link_exact(
            max(0, i * search_radius - search_radius),
            min(N, i * search_radius + search_radius),
        )
    # pass 3: fuzzy
    for i in range(N):
        if html_to_pdf[i] is None:
            link_fuzzy(i)
    return {
        html_word_list[i][0]: pdf_word_list[html_to_pdf[i]][0] for i in range(N)
    }


def attach_pdf_bboxes(doc: dict, pdf_bytes: bytes, search_max: int = 200) -> dict:
    """Engine-side ``PdfVisualParser.parse``: link the document's sentence
    words with the PDF's word boxes and fill the VisualMixin arrays."""
    sentences = sorted(doc["sentences"], key=lambda s: s["position"])
    html_word_list = []
    for s in sentences:
        for i, w in enumerate(s["words"]):
            html_word_list.append(((s["position"], i), w))
    pdf_word_list, coord, _dim = pdf_extract_words(pdf_bytes)
    if not html_word_list or not pdf_word_list:
        return doc
    links = link_word_lists(html_word_list, pdf_word_list, search_max=search_max)
    for s in sentences:
        pages, tops, bottoms, lefts, rights = [], [], [], [], []
        for i in range(len(s["words"])):
            box = coord[links[(s["position"], i)]]
            pages.append(box[0])
            tops.append(box[1])
            bottoms.append(box[2])
            lefts.append(box[3])
            rights.append(box[4])
        s["page"], s["top"], s["bottom"] = pages, tops, bottoms
        s["left"], s["right"] = lefts, rights
    return doc
