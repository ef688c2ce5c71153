"""Dependency-free minimal PDF text extractor (I1 fallback backend).

Parses the subset of the public PDF spec (ISO 32000) needed to recover
per-character boxes from simple text PDFs: object scanning without an
xref table, FlateDecode/plain content streams, and the classic text
operators (BT/ET, Tf, Td, TD, TL, Tm, T*, Tj, TJ, '). Positions assume
unrotated, unscaled text (Tm handled as translation) — exactly the shape
of machine-generated report PDFs; scanned or exotic PDFs belong to the
pypdfium2 backend (`pdf.py`), which takes priority when installed.

Char metrics: advance = 0.5·font_size per char (Helvetica-like
monospacing approximation); box top/bottom = baseline ± (0.8/0.2)·size.
Line/block assembly downstream only needs relative geometry (5pt line
tolerance, 4pt space gap, 15pt block gap — `pdf_processor.cpp:96-240`),
which this satisfies.

Font weight: resolved from the page's /Font resources; a /BaseFont name
containing "Bold" maps to 700, else 400 (the reference reads PDFium's
weight field, `pdf_processor.cpp:60-66`).
"""

from __future__ import annotations

import re
import zlib

CHAR_ADVANCE = 0.5   # fraction of font size per char
ASCENT = 0.8
DESCENT = 0.2

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_NAME_NUM_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")


def _objects(data: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}


def _stream_of(body: bytes) -> bytes | None:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    raw = m.group(1)
    if b"/FlateDecode" in body[: m.start()]:
        raw = zlib.decompress(raw)
    return raw


def _dict_refs(body: bytes) -> dict[str, int]:
    return {m.group(1).decode(): int(m.group(2)) for m in _NAME_NUM_RE.finditer(body)}


def _font_weights(page_body: bytes, objs: dict[int, bytes]) -> dict[str, int]:
    """Map font resource names (F1, F2...) to 400/700 via /BaseFont."""
    weights: dict[str, int] = {}
    for name, ref in _dict_refs(page_body).items():
        target = objs.get(ref, b"")
        if b"/BaseFont" in target:
            bold = b"Bold" in target
            weights[name] = 700 if bold else 400
        elif b"/Font" in target or b"/F" in target:
            # resource dict object: recurse one level
            for n2, r2 in _dict_refs(target).items():
                t2 = objs.get(r2, b"")
                if b"/BaseFont" in t2:
                    weights[n2] = 700 if b"Bold" in t2 else 400
    return weights


# content tokens: name, number, string, array delimiters, operator
_TOK_RE = re.compile(
    rb"/(?P<name>[^\s/\[\]()<>]+)"
    rb"|(?P<num>[-+]?\d*\.?\d+)"
    rb"|(?P<str>\((?:\\.|[^\\()])*\))"
    rb"|(?P<hex><[0-9A-Fa-f\s]*>)"
    rb"|(?P<arr>[\[\]])"
    rb"|(?P<op>[A-Za-z'\"*]+)"
)

_ESCAPES = {b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
            b"(": "(", b")": ")", b"\\": "\\"}


def _decode_string(tok: bytes) -> str:
    body = tok[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\":
            nxt = body[i + 1 : i + 2]
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, len(body)) and body[j : j + 1].isdigit():
                    j += 1
                out.append(chr(int(body[i + 1 : j], 8)))
                i = j
                continue
            out.append(_ESCAPES.get(nxt, nxt.decode("latin1")))
            i += 2
        else:
            out.append(c.decode("latin1"))
            i += 1
    return "".join(out)


def extract_chars(data: bytes, doc_name: str) -> list[dict]:
    """All pages' char boxes: dicts with doc/page/left/top/right/bottom/
    ch/font_size/font_weight (same shape as pdf.CHAR_SCHEMA)."""
    objs = _objects(data)
    pages = [
        (num, body)
        for num, body in sorted(objs.items())
        if re.search(rb"/Type\s*/Page\b(?!s)", body)
    ]
    out: list[dict] = []
    for pno, (_num, body) in enumerate(pages, start=1):
        weights = _font_weights(body, objs)
        m = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
        if not m:
            continue
        content = _stream_of(objs.get(int(m.group(1)), b""))
        if content is None:
            continue
        out.extend(_run_content(content, weights, doc_name, pno))
    return out


def _run_content(
    content: bytes, weights: dict[str, int], doc: str, page: int
) -> list[dict]:
    chars: list[dict] = []
    stack: list = []       # operand stack (numbers / strings / names / arrays)
    arr: list | None = None
    fs = 12.0
    fw = 400
    leading = 0.0
    x = y = 0.0            # current text position
    lx = ly = 0.0          # line start (Td is relative to line matrix)

    def emit(s: str):
        nonlocal x
        adv = CHAR_ADVANCE * fs
        for ch in s:
            chars.append(
                {
                    "doc": doc, "page": page,
                    "left": x, "top": y + ASCENT * fs,
                    "right": x + adv, "bottom": y - DESCENT * fs,
                    "ch": ch, "font_size": fs, "font_weight": fw,
                }
            )
            x += adv

    for m in _TOK_RE.finditer(content):
        kind = m.lastgroup
        tok = m.group(0)
        if kind == "name":
            (arr if arr is not None else stack).append("/" + m.group("name").decode())
        elif kind == "num":
            (arr if arr is not None else stack).append(float(tok))
        elif kind == "str":
            (arr if arr is not None else stack).append(_decode_string(tok))
        elif kind == "hex":
            h = re.sub(rb"\s", rb"", tok[1:-1])
            if len(h) % 2:
                h += b"0"
            (arr if arr is not None else stack).append(
                bytes.fromhex(h.decode()).decode("latin1")
            )
        elif kind == "arr":
            if tok == b"[":
                arr = []
            else:
                stack.append(arr or [])
                arr = None
        elif kind == "op":
            op = tok.decode()
            if op == "Tf" and len(stack) >= 2:
                fs = float(stack[-1])
                fname = str(stack[-2]).lstrip("/")
                fw = weights.get(fname, 400)
            elif op == "TL" and stack:
                leading = float(stack[-1])
            elif op == "Td" and len(stack) >= 2:
                lx += float(stack[-2]); ly += float(stack[-1])
                x, y = lx, ly
            elif op == "TD" and len(stack) >= 2:
                leading = -float(stack[-1])
                lx += float(stack[-2]); ly += float(stack[-1])
                x, y = lx, ly
            elif op == "Tm" and len(stack) >= 6:
                lx, ly = float(stack[-2]), float(stack[-1])
                x, y = lx, ly
            elif op == "T*":
                ly -= leading
                x, y = lx, ly
            elif op == "Tj" and stack:
                emit(str(stack[-1]))
            elif op == "'" and stack:
                ly -= leading
                x, y = lx, ly
                emit(str(stack[-1]))
            elif op == "TJ" and stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, str):
                        emit(el)
                    else:  # kerning adjustment, thousandths of font size
                        x -= float(el) / 1000.0 * fs
            elif op == "BT":
                x = y = lx = ly = 0.0
            stack.clear()
    return chars
