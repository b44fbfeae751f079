"""S2/S3 binary ingest: binaryFile scan → extension-dispatched extraction.

Covers the round-trip contract (extracted text == source text modulo strip),
the reference's CSV-to-prose semantics, the KGXB container framing (magic +
length checks), unsupported-extension dispatch, and the documented
pdf/docx stubs (reference services.py:20-62)."""

import os
import tempfile

import pytest

from kgx.sources import binary


@pytest.fixture(scope="module")
def drop_dir():
    d = tempfile.mkdtemp(prefix="kgx_bin_test_")
    with open(os.path.join(d, "doc_1.txt"), "wb") as f:
        f.write("  John Doe is the CEO of Acme Corporation.  \n".encode())
    with open(os.path.join(d, "doc_2.kgxb"), "wb") as f:
        f.write(binary.encode_kgxb("Jane Smith founded TechStart."))
    with open(os.path.join(d, "doc_4.csv"), "wb") as f:
        f.write(b"TechCorp,500000000,David Kim\nDataInc,1000,Ana Lee\n")
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


def test_pdf_docx_stubs_name_their_dependency(spark):
    d = tempfile.mkdtemp(prefix="kgx_bin_pdf_")
    with open(os.path.join(d, "doc_3.pdf"), "wb") as f:
        f.write(b"%PDF-1.4 fake")
    try:
        import pypdf  # noqa: F401

        pytest.skip("pypdf installed — stub path not reachable")
    except ImportError:
        pass
    with pytest.raises(Exception, match="pypdf"):
        binary.extract_binary_text(binary.load_binary_docs(spark, d)).collect()


def test_fixture_is_idempotent_and_complete(spark, sf_dir):
    d1 = binary.ensure_binary_fixture(sf_dir, max_doc_id=40)
    d2 = binary.ensure_binary_fixture(sf_dir, max_doc_id=40)
    assert d1 == d2
    rows = binary.extract_binary_text(
        binary.load_binary_docs(spark, d1, glob="doc_*")
    ).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where("doc_id < 40")
    assert len(rows) == docs.count()
    fmts = {r["doc_id"]: r["source_format"] for r in rows}
    assert all(f == ("kgxb" if i % 2 == 0 else "txt") for i, f in fmts.items())
