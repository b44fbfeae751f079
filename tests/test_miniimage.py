"""Live-bytes image decode: stdlib BMP/PPM codecs + the Arrow decode stage.

The round-3 verdict asked for at least one REAL media decode path (task 6);
kgx.sources.miniimage supplies generator+parser pairs for the two
uncompressed raster formats the stdlib can carry, and
kgx.operators.media.decode_media_bytes runs them over a binary column —
mirroring how minidoc de-stubbed the PDF/DOCX document ingest."""

import pytest

from kgx.sources import miniimage


def _gradient(w, h):
    """Non-uniform pixels — catches decoders that only handle solid fills,
    wrong row order, or channel swaps."""
    return [
        [((3 * x + 7 * y) % 256, (5 * x + y) % 256, (x + 11 * y) % 256)
         for x in range(w)]
        for y in range(h)
    ]


@pytest.mark.parametrize("codec", ["bmp", "ppm"])
@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (5, 4), (31, 23), (4, 1)])
def test_roundtrip_gradient(codec, w, h):
    # (5, 4): w*3 = 15 → BMP rows need 1 pad byte; (31, 23): 93 → 3 pad bytes
    px = _gradient(w, h)
    enc = miniimage.encode_bmp if codec == "bmp" else miniimage.encode_ppm
    fmt, back = miniimage.sniff_decode(enc(px))
    assert fmt == codec
    assert back == px


def test_bmp_top_down_negative_height():
    """Foreign top-down BMPs store height negative and rows first-row-first;
    the decoder must return the same top-down matrix either way."""
    import struct

    px = _gradient(3, 2)
    blob = bytearray(miniimage.encode_bmp(px))
    h = struct.unpack("<i", blob[22:26])[0]
    blob[22:26] = struct.pack("<i", -h)  # declare top-down...
    body = blob[54:]
    stride = len(body) // h
    # ...and reverse the stored row order to match
    blob[54:] = b"".join(
        bytes(body[i * stride : (i + 1) * stride]) for i in reversed(range(h))
    )
    assert miniimage.decode_bmp(bytes(blob)) == px


def test_ppm_header_comments_and_whitespace():
    px = _gradient(2, 2)
    raw = miniimage.encode_ppm(px)
    body = raw.split(b"255\n", 1)[1]
    foreign = b"P6 # a comment\n # another\n 2\t2\n255\n" + body
    assert miniimage.decode_ppm(foreign) == px


def test_corruption_raises():
    px = _gradient(2, 2)
    with pytest.raises(ValueError, match="magic"):
        miniimage.decode_bmp(b"not an image")
    with pytest.raises(ValueError, match="magic"):
        miniimage.decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 4)  # P5 = grayscale
    with pytest.raises(ValueError, match="truncated"):
        miniimage.decode_bmp(miniimage.encode_bmp(px)[:-3])
    with pytest.raises(ValueError, match="truncated"):
        miniimage.decode_ppm(miniimage.encode_ppm(px)[:-1])
    with pytest.raises(ValueError, match="unsupported"):
        miniimage.decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)
    with pytest.raises(ValueError, match="unrecognized"):
        miniimage.sniff_decode(b"GIF89a...")


def test_channel_means_exact_floor():
    px = [[(0, 10, 255), (1, 20, 255), (1, 30, 254)]]  # sums 2, 60, 764 over 3
    assert miniimage.channel_means(px) == (0, 20, 254)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _dims = st.tuples(st.integers(1, 12), st.integers(1, 12))
    _byte = st.integers(0, 255)

    @given(
        _dims.flatmap(
            lambda wh: st.lists(
                st.lists(st.tuples(_byte, _byte, _byte),
                         min_size=wh[0], max_size=wh[0]),
                min_size=wh[1], max_size=wh[1],
            )
        ),
        st.booleans(),
    )
    @settings(max_examples=40, deadline=None)
    def test_codec_roundtrip_property(px, use_bmp):
        enc = miniimage.encode_bmp if use_bmp else miniimage.encode_ppm
        fmt, back = miniimage.sniff_decode(enc(px))
        assert fmt == ("bmp" if use_bmp else "ppm")
        assert back == px
except ImportError:  # pragma: no cover
    pass


def test_decode_media_bytes_live_path(spark, sf_dir):
    """End-to-end: inventory → deterministic blob synthesis → Arrow binary
    column → REAL stdlib parse; decoded dims/format/fill must equal the
    md5-60 derivation the synthesis used (the same check the DuckDB oracle
    performs for the media_decode_real gate query)."""
    from kgx.operators import media, spans as spans_op
    from kgx.sources import docs as docs_src, corpus

    sp = docs_src.spans_table(
        corpus.narrative_documents(docs_src.load_documents(spark, sf_dir))
    )
    inv = media.media_inventory(spans_op.explode_spans(sp))
    rows = media.decode_media_bytes(media.synthesize_media_blobs(inv)).collect()
    assert len(rows) == inv.count() > 0
    for r in rows[:50]:
        h = media._md5_60(r["media_ref"])
        assert r["format"] == ("bmp" if h % 2 == 0 else "ppm")
        assert (r["width"], r["height"]) == (1 + h % 31, 1 + (h // 31) % 23)
        # solid fill → per-channel mean == the fill value exactly
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (
            h % 256, (h // 256) % 256, (h // 65536) % 256
        )


def test_nearest_resize_semantics():
    """Pin nearest-neighbor indexing: out[ri][ci] = in[ri*h//oh][ci*w//ow]."""
    from kgx.sources.miniimage import nearest_resize

    px = [[(ri * 10 + ci, 0, 0) for ci in range(4)] for ri in range(4)]
    # 4x4 -> 2x2 picks rows/cols 0 and 2
    assert nearest_resize(px, 2, 2) == [
        [(0, 0, 0), (2, 0, 0)],
        [(20, 0, 0), (22, 0, 0)],
    ]
    # identity when dims match
    assert nearest_resize(px, 4, 4) == px
    # down to a single pixel takes the top-left source pixel
    assert nearest_resize(px, 1, 1) == [[(0, 0, 0)]]
    # solid fill stays exactly solid at any target size
    solid = [[(7, 8, 9)] * 5 for _ in range(3)]
    assert nearest_resize(solid, 2, 7) == [[(7, 8, 9)] * 2 for _ in range(7)]
    import pytest

    with pytest.raises(ValueError):
        nearest_resize(px, 0, 2)


def test_resize_media_real_live_loop(spark, sf_dir):
    """End-to-end decode → aspect-fit resample → re-encode → re-decode on
    real bytes: dims obey the shared _aspect_fit formula (never upscaled,
    min 1 px) and solid fills survive exactly."""
    from kgx.operators import media, spans as spans_op
    from kgx.sources import docs as docs_src, corpus

    sp = docs_src.spans_table(
        corpus.narrative_documents(docs_src.load_documents(spark, sf_dir))
    )
    inv = media.media_inventory(spans_op.explode_spans(sp))
    rows = media.resize_media_real(
        media.synthesize_media_blobs(inv), max_w=8, max_h=8
    ).collect()
    assert len(rows) == inv.count() > 0
    for r in rows[:50]:
        h = media._md5_60(r["media_ref"])
        assert (r["out_width"], r["out_height"]) == media._aspect_fit(
            r["width"], r["height"], 8, 8
        )
        assert r["out_width"] <= 8 and r["out_height"] <= 8
        assert r["out_width"] <= r["width"] and r["out_height"] <= r["height"]
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (
            h % 256, (h // 256) % 256, (h // 65536) % 256
        )


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.integers(1, 10), st.integers(1, 8),   # in dims
        st.integers(1, 10), st.integers(1, 8),   # out dims
        st.data(),
    )
    @settings(max_examples=40, deadline=None)
    def test_nearest_resize_properties(w, h, ow, oh, data):
        from kgx.sources.miniimage import nearest_resize

        px_strat = st.tuples(
            st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
        )
        px = [[data.draw(px_strat) for _ in range(w)] for _ in range(h)]
        out = nearest_resize(px, ow, oh)
        # exact output dims
        assert len(out) == oh and all(len(r) == ow for r in out)
        # every output pixel is a real input pixel at the floor-index map
        for ri in range(oh):
            for ci in range(ow):
                assert out[ri][ci] == px[ri * h // oh][ci * w // ow]
        # identity at equal dims
        if (ow, oh) == (w, h):
            assert out == px
except ImportError:  # pragma: no cover
    pass
