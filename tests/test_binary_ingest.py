"""S2/S3 binary ingest: binaryFile scan → extension-dispatched extraction.

Covers the round-trip contract (extracted text == source text modulo strip),
the reference's CSV-to-prose semantics, the KGXB container framing (magic +
length checks), unsupported-extension dispatch, and the stdlib PDF/DOCX
parser pair (reference services.py:20-62)."""

import os
import tempfile

import pytest

from kgx.sources import binary, minidoc


@pytest.fixture(scope="module")
def drop_dir():
    d = tempfile.mkdtemp(prefix="kgx_bin_test_")
    with open(os.path.join(d, "doc_1.txt"), "wb") as f:
        f.write("  John Doe is the CEO of Acme Corporation.  \n".encode())
    with open(os.path.join(d, "doc_2.kgxb"), "wb") as f:
        f.write(binary.encode_kgxb("Jane Smith founded TechStart."))
    with open(os.path.join(d, "doc_4.csv"), "wb") as f:
        f.write(b"TechCorp,500000000,David Kim\nDataInc,1000,Ana Lee\n")
    with open(os.path.join(d, "doc_6.pdf"), "wb") as f:
        f.write(minidoc.encode_pdf("Maria Garcia works at Innovate Labs.\nSecond line."))
    with open(os.path.join(d, "doc_8.docx"), "wb") as f:
        f.write(minidoc.encode_docx("Li Wei founded Quantum Systems.\nBoard: Ana Lee."))
    return d


def test_binary_round_trip_txt_kgxb_csv(spark, drop_dir):
    out = {
        r["doc_id"]: (r["source_format"], r["text"])
        for r in binary.extract_binary_text(
            binary.load_binary_docs(spark, drop_dir, glob="doc_*")
        ).collect()
    }
    assert out[1] == ("txt", "John Doe is the CEO of Acme Corporation.")
    assert out[2] == ("kgxb", "Jane Smith founded TechStart.")
    # reference CSV semantics: cells re-joined with ", ", rows with newline
    assert out[4] == ("csv", "TechCorp, 500000000, David Kim\nDataInc, 1000, Ana Lee")
    assert out[6] == ("pdf", "Maria Garcia works at Innovate Labs.\nSecond line.")
    assert out[8] == ("docx", "Li Wei founded Quantum Systems.\nBoard: Ana Lee.")


def test_kgxb_framing_rejects_corruption():
    blob = binary.encode_kgxb("payload text")
    assert binary.decode_kgxb(blob) == "payload text"
    with pytest.raises(ValueError, match="magic"):
        binary.decode_kgxb(b"NOTKGX" + blob[6:])
    with pytest.raises(ValueError, match="truncated"):
        binary.decode_kgxb(blob[:-3])


def test_unsupported_extension_raises(spark, drop_dir):
    d = tempfile.mkdtemp(prefix="kgx_bin_bad_")
    with open(os.path.join(d, "doc_9.xyz"), "wb") as f:
        f.write(b"???")
    with pytest.raises(Exception, match="Unsupported file type"):
        binary.extract_binary_text(binary.load_binary_docs(spark, d)).collect()


def test_pdf_roundtrip_and_foreign_shapes():
    """The stdlib PDF codec: generator→parser identity on arbitrary text,
    plus parsing of foreign uncompressed literal-string PDFs (escapes,
    octal codes, TJ kerning arrays) — the shapes real writers emit."""
    for t in [
        "John Doe is the CEO of Acme Corporation.",
        "line one\nline two\nline three",
        "unicode: déjà vu — 漢字",
        "parens (and) backslash \\ and <angle>",
    ]:
        assert minidoc.decode_pdf(minidoc.encode_pdf(t)) == t
    raw = (
        b"%PDF-1.1\n1 0 obj\n<< /Length 60 >>\nstream\n"
        b"BT (Hello \\(World\\) \\101BC) Tj T* [(kern)-120(ed)] TJ ET\n"
        b"endstream\nendobj\n"
    )
    assert minidoc.decode_pdf(raw) == "Hello (World) ABC\nkerned"
    with pytest.raises(ValueError, match="magic"):
        minidoc.decode_pdf(b"not a pdf")


def test_docx_roundtrip_and_corruption():
    for t in ["Jane Smith founded TechStart.", "p1\np2", "a & b < c > d"]:
        assert minidoc.decode_docx(minidoc.encode_docx(t)) == t
    with pytest.raises(ValueError, match="DOCX"):
        minidoc.decode_docx(b"garbage bytes")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def _lines(alphabet):
        return st.lists(
            st.text(alphabet=alphabet, max_size=80), min_size=1, max_size=6
        ).map("\n".join)

    # PDF hex strings carry arbitrary unicode (minus line separators that
    # would alias the \n line protocol and lone surrogates)
    _pdf_lines = _lines(
        st.characters(
            blacklist_categories=("Cs",),
            blacklist_characters="\r\x0b\x0c\x85  ",
        )
    )
    # XML 1.0 cannot represent C0 control characters AT ALL (even escaped) —
    # a real .docx has the same limit, so the docx contract is XML-legal text
    _docx_lines = _lines(
        st.characters(
            blacklist_categories=("Cs", "Cc"),
            blacklist_characters="  ",
        )
    )

    @given(_pdf_lines)
    @settings(max_examples=60, deadline=None)
    def test_pdf_codec_roundtrip_property(t):
        assert minidoc.decode_pdf(minidoc.encode_pdf(t)) == t

    @given(_docx_lines)
    @settings(max_examples=60, deadline=None)
    def test_docx_codec_roundtrip_property(t):
        assert minidoc.decode_docx(minidoc.encode_docx(t)) == t
except ImportError:  # pragma: no cover - hypothesis is baked into the sandbox
    pass


def test_fixture_is_idempotent_and_complete(spark, sf_dir):
    d1 = binary.ensure_binary_fixture(sf_dir, max_doc_id=40)
    d2 = binary.ensure_binary_fixture(sf_dir, max_doc_id=40)
    assert d1 == d2
    rows = binary.extract_binary_text(
        binary.load_binary_docs(spark, d1, glob="doc_*")
    ).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id < 40")
        .collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        assert r["source_format"] == binary.FIXTURE_FORMATS[r["doc_id"] % 4]
        assert r["text"] == docs[r["doc_id"]].strip()  # all 4 parsers round-trip
