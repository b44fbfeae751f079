"""Stdlib-only PDF and DOCX text codecs for the S2/S3 ingest paths.

The reference extracts PDF text with PyPDF2 (``page.extract_text()``,
reference services.py:35-42) and DOCX text with python-docx
(``"\\n".join(p.text for p in doc.paragraphs)``, services.py:44-48).
Neither library is installable in this sandbox, so this module implements
the same extraction semantics from the published file-format specs using
only the standard library — plus the matching GENERATORS, so the binary
ingest fixture can materialize real ``.pdf``/``.docx`` files and the gate
can verify the full parse round-trip against the DuckDB oracle.

PDF (ISO 32000 subset)
    * ``encode_pdf`` emits a spec-valid single-page document: catalog /
      page tree / Helvetica font objects, a Flate-compressed content
      stream (one ``Tj`` text-show per input line, ``T*`` line advances),
      and a correct xref table — readable by any standard PDF viewer.
    * ``decode_pdf`` walks every ``stream … endstream`` object, inflates
      ``/FlateDecode`` streams (zlib IS stdlib — so real-world compressed
      PDFs parse too), and extracts the string operands of ``Tj``/``'``
      and ``TJ`` operators inside ``BT … ET`` text blocks.  Both literal
      strings (``(…)`` with ``\\``-escapes and octal) and hex strings
      (``<…>``, UTF-16BE when BOM-prefixed) are decoded.  Each ``Tj``
      yields one line — the same line-per-show behavior PyPDF2's
      ``extract_text`` produces for this layout.

DOCX (ECMA-376 subset)
    * ``encode_docx`` writes the minimal OPC package ([Content_Types].xml,
      _rels/.rels, word/document.xml) with one ``<w:p><w:r><w:t>`` per
      input line — opens in Word/LibreOffice.
    * ``decode_docx`` unzips ``word/document.xml`` and joins the ``w:t``
      runs of each paragraph, paragraphs with ``\\n`` — exactly
      python-docx's ``paragraphs``/``text`` semantics used by the
      reference.

Both decoders raise ``ValueError`` on malformed input (bad magic,
truncated zip, no text payload) so the ingest dispatch surfaces corrupt
files instead of silently emitting empty text.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib

# ---------------------------------------------------------------------------
# PDF
# ---------------------------------------------------------------------------

_PDF_HEADER = b"%PDF-1.4"


def _pdf_hex_string(line: str) -> bytes:
    """Text line as a BOM-prefixed UTF-16BE hex string — no escaping rules,
    any unicode content survives byte-exact."""
    return b"<" + ("﻿" + line).encode("utf-16-be").hex().upper().encode() + b">"


def encode_pdf(text: str) -> bytes:
    """Minimal but spec-valid single-page PDF showing ``text`` (one ``Tj``
    per input line, Flate-compressed content stream, correct xref)."""
    lines = text.split("\n")
    ops = [b"BT", b"/F1 12 Tf", b"14 TL", b"72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"T*")
        ops.append(_pdf_hex_string(line) + b" Tj")
    ops.append(b"ET")
    content = zlib.compress(b"\n".join(ops))

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length "
        + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + content
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = io.BytesIO()
    out.write(_PDF_HEADER + b"\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(out.tell())
        out.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref_at = out.tell()
    out.write(f"xref\n0 {len(objs) + 1}\n".encode())
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(f"{off:010d} 00000 n \n".encode())
    out.write(
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n".encode()
    )
    return out.getvalue()


#: stream-object opener: the dict plus the EOL that terminates the
#: ``stream`` keyword; the data itself is sliced by ``/Length`` (spec
#: path) or by searching ``endstream`` (no-Length fallback) — a regex
#: capture of the body would truncate at any ``endstream`` byte sequence
#: occurring INSIDE compressed data.
_STREAM_START_RX = re.compile(rb"<<(?P<dict>.*?)>>\s*stream(?:\r\n|\r|\n)", re.DOTALL)
#: direct /Length value; the lookahead rejects indirect refs (``6 0 R``)
_LENGTH_RX = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_BT_RX = re.compile(rb"BT(?P<body>.*?)ET", re.DOTALL)

#: PDF delimiter characters (ISO 32000 §7.2.2); regular-token runs stop here
_PDF_DELIMS = b"()<>[]{}/%"
_PDF_WS = b"\x00\t\n\x0c\r "

_LIT_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_pdf_string(tok: bytes) -> str:
    """One PDF string token (literal or hex) → text."""
    if tok.startswith(b"<"):
        raw = bytes.fromhex(re.sub(rb"\s", b"", tok[1:-1]).decode("ascii"))
        if raw.startswith(b"\xfe\xff"):
            return raw[2:].decode("utf-16-be")
        return raw.decode("latin-1")
    body, out, i = tok[1:-1], bytearray(), 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\":
            nxt = body[i + 1 : i + 2]
            if nxt in _LIT_ESCAPES:
                out += _LIT_ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():
                j = i + 1
                while j < len(body) and j < i + 4 and body[j : j + 1].isdigit():
                    j += 1
                out.append(int(body[i + 1 : j], 8) & 0xFF)
                i = j
            else:  # line continuation / unknown escape: drop the backslash
                i += 1
        else:
            out += c
            i += 1
    return out.decode("utf-8", errors="replace")


def _literal_span(body: bytes, i: int) -> int:
    """End index (exclusive, past the closing paren) of the literal string
    starting at ``body[i] == b'('``.  Depth scanner per ISO 32000 §7.3.4.2:
    BALANCED unescaped parentheses are legal inside a literal string, so a
    regex cannot delimit it — ``(a (b) c)`` is ONE string."""
    depth, j = 1, i + 1
    while j < len(body):
        c = body[j]
        if c == 0x5C:  # backslash: the escaped byte never affects depth
            j += 2
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return j + 1
        j += 1
    raise ValueError("unterminated literal string in content stream")


def _show_lines(body: bytes) -> list[str]:
    """Text shown inside one BT…ET block, one entry per show operator.

    A small token scanner (not a regex — see :func:`_literal_span`):
    strings and arrays are tracked as the pending operand; the show
    operators ``Tj`` / ``'`` / ``"`` emit the last string as a line and
    ``TJ`` emits its array's strings concatenated (kern numbers between
    them never split lines).  Comments skip to EOL, every other token
    (names, numbers, other operators) just clears a stale pending array.
    """
    lines: list[str] = []
    last: str | None = None  # most recent scalar string operand
    arr: list[str] | None = None  # open [ … ] accumulator
    pending_arr: list[str] | None = None  # closed array awaiting TJ
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c in _PDF_WS:
            i += 1
        elif c == b"(":
            end = _literal_span(body, i)
            s = _decode_pdf_string(body[i:end])
            if arr is not None:
                arr.append(s)
            else:
                last = s
            i = end
        elif c == b"<":
            if body[i + 1 : i + 2] == b"<":  # inline dict (e.g. BDC): skip
                i += 2
                continue
            end = body.find(b">", i + 1)
            if end == -1:
                raise ValueError("unterminated hex string in content stream")
            s = _decode_pdf_string(body[i : end + 1])
            if arr is not None:
                arr.append(s)
            else:
                last = s
            i = end + 1
        elif c == b"[":
            arr, i = [], i + 1
        elif c == b"]":
            pending_arr, arr = arr, None
            i += 1
        elif c == b"%":  # comment: to end of line
            nl = body.find(b"\n", i)
            i = len(body) if nl == -1 else nl + 1
        elif c in (b"'", b'"'):  # move-and-show operators
            if last is not None:
                lines.append(last)
            i += 1
        elif c in b")>":  # stray delimiter (malformed): skip
            i += 1
        elif c in _PDF_DELIMS:  # { } / — skip the delimiter itself
            i += 1
        else:
            j = i
            while (
                j < len(body)
                and body[j : j + 1] not in _PDF_DELIMS
                and body[j : j + 1] not in _PDF_WS
                and body[j : j + 1] not in b"'\""
            ):
                j += 1
            tok = body[i:j]
            if tok == b"Tj":
                if last is not None:
                    lines.append(last)
            elif tok == b"TJ":
                if pending_arr is not None:
                    lines.append("".join(pending_arr))
            pending_arr = None  # any operator consumes/invalidates the array
            i = j
    return lines


def decode_pdf(blob: bytes) -> str:
    """Extract the text shown by every content stream, one line per
    ``Tj``/``'`` show (PyPDF2-equivalent for line-oriented layouts).

    Stream bodies are sliced by the dict's ``/Length`` entry when it is a
    direct integer (ISO 32000 §7.3.8 — exact, survives ``endstream`` or
    EOL bytes inside compressed data); only no-Length streams fall back to
    an ``endstream`` search with a single trailing-EOL trim (the EOL
    before ``endstream`` belongs to the keyword, not the data).

    Content-stream text is tokenized by a small scanner
    (:func:`_show_lines`), not a regex, so spec-legal literal strings with
    BALANCED UNESCAPED parentheses — ``(a (b) c)`` — decode intact, and
    comments / inline dicts / kern numbers are skipped by grammar rather
    than by pattern luck.
    """
    if not blob.startswith(b"%PDF-"):
        raise ValueError("bad PDF magic (missing %PDF- header)")
    lines: list[str] = []
    pos = 0
    while True:
        m = _STREAM_START_RX.search(blob, pos)
        if m is None:
            break
        start = m.end()
        lm = _LENGTH_RX.search(m.group("dict"))
        if lm is not None:
            n = int(lm.group(1))
            if start + n > len(blob):
                raise ValueError("truncated stream (shorter than /Length)")
            data = blob[start : start + n]
            end = blob.find(b"endstream", start + n)
            pos = end + len(b"endstream") if end != -1 else start + n
        else:
            end = blob.find(b"endstream", start)
            if end == -1:
                raise ValueError("unterminated stream (no endstream)")
            data = blob[start:end]
            if data.endswith(b"\r\n"):
                data = data[:-2]
            elif data.endswith(b"\n") or data.endswith(b"\r"):
                data = data[:-1]
            pos = end + len(b"endstream")
        if b"/FlateDecode" in m.group("dict"):
            try:
                data = zlib.decompress(data)
            except zlib.error as e:
                raise ValueError(f"corrupt FlateDecode stream: {e}") from e
        for bt in _BT_RX.finditer(data):
            lines.extend(_show_lines(bt.group("body")))
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# DOCX
# ---------------------------------------------------------------------------

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


#: characters XML 1.0 cannot carry (even escaped): C0 controls minus
#: TAB/LF, surrogates, and the two non-characters #xFFFE/#xFFFF.  CR is
#: included because conformant XML parsers NORMALIZE \r and \r\n to \n
#: (XML 1.0 §2.11) — a literal \r cannot round-trip through a real .docx
#: either.  \n is fine: it is this codec's paragraph separator.
_XML_ILLEGAL_RX = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\r\ud800-\udfff￾￿]"
)


def xml_illegal_char(text: str) -> str | None:
    """First XML-1.0-unrepresentable character in ``text`` (or None).
    Used by ``encode_docx`` to fail fast and by the binary-ingest fixture
    to route such documents to the PDF codec instead (whose hex strings
    carry arbitrary code points)."""
    m = _XML_ILLEGAL_RX.search(text)
    return m.group() if m else None


def encode_docx(text: str) -> bytes:
    """Minimal OPC package with one ``w:p``/``w:r``/``w:t`` per input line.
    Fixed zip timestamps keep the fixture byte-stable across rebuilds.
    Contract: XML-legal text only — XML 1.0 cannot represent C0 control
    characters at all (the same limit a real Word document has) and
    parsers normalize \\r away; such input raises ``ValueError`` up front
    (instead of an uncaught ElementTree ParseError or a silent
    mis-round-trip at decode time).  The PDF codec's hex strings carry
    them if a corpus needs that."""
    bad = xml_illegal_char(text)
    if bad is not None:
        raise ValueError(
            f"text is not XML-1.0-representable (contains {bad!r}); "
            "a real .docx has the same limit — use the PDF codec"
        )
    paras = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{_xml_escape(line)}</w:t></w:r></w:p>'
        for line in text.split("\n")
    )
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>{paras}</w:body></w:document>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, payload in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _RELS),
            ("word/document.xml", document),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(zi, payload)
    return buf.getvalue()


def decode_docx(blob: bytes) -> str:
    """python-docx-equivalent text: each paragraph's ``w:t`` runs
    concatenated, paragraphs joined with newlines (services.py:44-48)."""
    import xml.etree.ElementTree as ET

    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            doc_xml = z.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError) as e:
        raise ValueError(f"not a DOCX package: {e}") from e
    root = ET.fromstring(doc_xml)
    w = f"{{{_W_NS}}}"
    paras = []
    for p in root.iter(f"{w}p"):
        paras.append("".join(t.text or "" for t in p.iter(f"{w}t")))
    return "\n".join(paras)
