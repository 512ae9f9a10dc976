"""Pure-stdlib PDF table extraction: the real-decode backend for the
S5 PDF-table seam (reference: zhou_transform.py:81-85 runs
``tabula.io.read_pdf``; the sandbox has no JVM, and round 2 shipped the
seam without ever running a decode).

``extract_tables`` parses actual PDF bytes — object scan, balanced
``<< >>`` dictionaries, ``/Kids`` page ordering, ``/Contents`` stream
resolution, FlateDecode inflation, and a text-operator interpreter for
``Tm``/``Td`` positioning and ``Tj`` literal strings — then recovers
table rows by grouping text runs on shared baselines (y) and ordering
cells by x, i.e. a minimal "stream-mode" tabula. Output is the
tabula-style page list (``[{"data": [[{"text": ...}, ...], ...]}]``)
that ``sources.pdftable.multi_page_table_to_list`` consumes unchanged.

``encode_table_pdf`` writes spec-conformant single-column-font PDFs
(catalog/pages/page/content objects, xref table, trailer) used as
deterministic fixtures, so the decode path runs against real files.

Scope (honest subset, asserted loudly): uncompressed or FlateDecode
content streams; text via ``Tm`` (absolute) / ``Td`` (relative) +
literal-string ``Tj``; escapes ``\\( \\) \\\\ \\n \\r \\t``. Encrypted
PDFs, hex strings, TJ arrays, CID fonts and object streams raise.
A production deployment swaps tabula back in behind the same
``_PdfDecoder`` seam without touching the dataflow.
"""

from __future__ import annotations

import re
import zlib

# --------------------------------------------------------------- encode

_PAGE_W, _PAGE_H = 612, 792
_X0, _COL_W = 50, 130
_Y0, _ROW_H = 750, 16


def _esc(s: str) -> bytes:
    return (s.replace("\\", "\\\\").replace("(", "\\(")
             .replace(")", "\\)")).encode("latin-1")


def encode_table_pdf(pages: list[list[list[str]]]) -> bytes:
    """Encode table pages (page -> rows -> cell strings) as a real PDF
    with FlateDecode content streams and a correct xref table."""
    n_pages = len(pages)
    objs: dict[int, bytes] = {}
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} "
               f">>").encode()
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    streams: dict[int, bytes] = {}
    for i, rows in enumerate(pages):
        page_num, content_num = 4 + 2 * i, 5 + 2 * i
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_PAGE_W} "
            f"{_PAGE_H}] /Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {content_num} 0 R >>").encode()
        ops = [b"BT", b"/F1 10 Tf"]
        for r, row in enumerate(rows):
            y = _Y0 - r * _ROW_H
            for c, cell in enumerate(row):
                x = _X0 + c * _COL_W
                ops.append(b"1 0 0 1 %d %d Tm (%s) Tj"
                           % (x, y, _esc(cell)))
        ops.append(b"ET")
        raw = b"\n".join(ops)
        comp = zlib.compress(raw, 6)
        objs[content_num] = (f"<< /Length {len(comp)} /Filter "
                             f"/FlateDecode >>").encode()
        streams[content_num] = comp

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\n"
        if num in streams:
            out += b"stream\n" + streams[num] + b"\nendstream\n"
        out += b"endobj\n"
    xref_pos = len(out)
    n = max(objs) + 1
    out += b"xref\n0 %d\n0000000000 65535 f \n" % n
    for num in range(1, n):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF\n" % (n, xref_pos))
    return bytes(out)


# --------------------------------------------------------------- decode

def _parse_dict_span(data: bytes, start: int) -> tuple[int, int]:
    """(begin, end) byte span of the balanced ``<< ... >>`` at/after
    ``start``."""
    i = data.index(b"<<", start)
    depth, j = 0, i
    while j < len(data) - 1:
        if data[j:j + 2] == b"<<":
            depth += 1
            j += 2
        elif data[j:j + 2] == b">>":
            depth -= 1
            j += 2
            if depth == 0:
                return i, j
        else:
            j += 1
    raise ValueError("PDF: unbalanced dictionary")


def _parse_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """object number -> (dict bytes, stream bytes or None)."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    for m in re.finditer(rb"(\d+)\s+0\s+obj", data):
        num = int(m.group(1))
        d0, d1 = _parse_dict_span(data, m.end())
        d = data[d0:d1]
        stream = None
        tail = data[d1:d1 + 20].lstrip()
        if tail.startswith(b"stream"):
            lm = re.search(rb"/Length\s+(\d+)", d)
            if not lm:
                raise ValueError("PDF: stream without direct /Length")
            s0 = data.index(b"stream", d1) + len(b"stream")
            if data[s0:s0 + 2] == b"\r\n":
                s0 += 2
            elif data[s0:s0 + 1] == b"\n":
                s0 += 1
            stream = data[s0:s0 + int(lm.group(1))]
        objs[num] = (d, stream)
    return objs


def _ref(d: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+0\s+R", d)
    return int(m.group(1)) if m else None


_UNESC = {b"\\\\": b"\\", b"\\(": b"(", b"\\)": b")",
          b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t"}


def _unescape(s: bytes) -> str:
    def repl(m: re.Match) -> bytes:
        tok = m.group(0)
        if tok not in _UNESC:
            raise ValueError(f"PDF: unsupported string escape {tok!r}")
        return _UNESC[tok]

    return re.sub(rb"\\.", repl, s, flags=re.S).decode("latin-1")


_TEXT_OP = re.compile(
    rb"(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+(-?[\d.]+)\s+"
    rb"(-?[\d.]+)\s+(-?[\d.]+)\s+Tm"
    rb"|(-?[\d.]+)\s+(-?[\d.]+)\s+Td"
    rb"|\(((?:\\.|[^\\()])*)\)\s*Tj"
    rb"|\[|<[0-9A-Fa-f]")


def _text_runs(content: bytes) -> list[tuple[float, float, str]]:
    """(y, x, text) runs from one content stream."""
    runs: list[tuple[float, float, str]] = []
    x = y = 0.0
    for m in _TEXT_OP.finditer(content):
        if m.group(1) is not None:  # Tm: absolute matrix
            x, y = float(m.group(5)), float(m.group(6))
        elif m.group(7) is not None:  # Td: relative line move
            x, y = x + float(m.group(7)), y + float(m.group(8))
        elif m.group(9) is not None:  # (text) Tj
            runs.append((y, x, _unescape(m.group(9))))
        else:
            raise ValueError(
                "PDF: TJ arrays / hex strings not supported "
                "(stdlib subset)")
    return runs


def _page_content(objs: dict, page_dict: bytes) -> bytes:
    cnum = _ref(page_dict, b"Contents")
    if cnum is None or cnum not in objs:
        raise ValueError("PDF: page without resolvable /Contents")
    cdict, stream = objs[cnum]
    if stream is None:
        raise ValueError("PDF: /Contents is not a stream")
    if b"/Filter" in cdict:
        if b"/FlateDecode" not in cdict:
            raise ValueError("PDF: only FlateDecode streams supported")
        return zlib.decompress(stream)
    return stream


def extract_tables(data: bytes, pages: list[int] | None = None,
                   *, y_tol: float = 2.0) -> list[dict]:
    """PDF bytes -> tabula-style page list. ``pages`` is the 1-based
    page-number filter (tabula's ``pages=`` semantics); None = all."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF: missing %PDF header")
    objs = _parse_objects(data)
    # page order from the /Kids array of the /Type /Pages node
    pages_nodes = [d for d, _ in objs.values()
                   if re.search(rb"/Type\s*/Pages\b", d)]
    if pages_nodes:
        kid_nums = [int(n) for n in re.findall(
            rb"(\d+)\s+0\s+R", re.search(
                rb"/Kids\s*\[(.*?)\]", pages_nodes[0], re.S).group(1))]
    else:  # fallback: document order
        kid_nums = [n for n, (d, _) in sorted(objs.items())
                    if re.search(rb"/Type\s*/Page\b", d)]
    out = []
    for idx, num in enumerate(kid_nums):
        if pages is not None and (idx + 1) not in pages:
            continue
        runs = _text_runs(_page_content(objs, objs[num][0]))
        runs.sort(key=lambda r: (-r[0], r[1]))
        rows: list[list[dict]] = []
        last_y: float | None = None
        for ry, rx, text in runs:
            if last_y is None or abs(ry - last_y) > y_tol:
                rows.append([])
                last_y = ry
            rows[-1].append({"text": text})
        out.append({"extraction_method": "stream", "page_number": idx + 1,
                    "data": rows})
    return out
