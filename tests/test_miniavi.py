"""Live-bytes video decode: stdlib RIFF/AVI codec + the Arrow decode and
frame-explode stages (kgx.sources.miniavi + kgx.operators.media
decode_video_bytes / video_frame_means) — the video member of the
test_miniimage / test_miniwav family."""

import struct

import pytest

from kgx.sources import miniavi


def _gradient_frames(w, h, n):
    return [
        [
            [((i * 7 + ci) % 256, (ri * 3 + i) % 256, (ri + ci) % 256)
             for ci in range(w)]
            for ri in range(h)
        ]
        for i in range(n)
    ]


def test_roundtrip_gradient_with_row_padding():
    # w=5 → 15-byte rows padded to 16: exercises the DIB stride path
    frames = _gradient_frames(5, 3, 4)
    v = miniavi.decode_avi(miniavi.encode_avi(frames, fps=8))
    assert (v["rate"], v["scale"]) == (8, 1)
    assert (v["width"], v["height"]) == (5, 3)
    assert v["frames"] == frames


def test_roundtrip_no_padding_and_single_pixel():
    for w, h, n, fps in [(4, 2, 1, 25), (1, 1, 3, 4), (8, 11, 10, 20)]:
        frames = _gradient_frames(w, h, n)
        v = miniavi.decode_avi(miniavi.encode_avi(frames, fps))
        assert v["frames"] == frames
        assert v["rate"] // v["scale"] == fps


def test_encode_rejects_bad_input():
    frame = [[(0, 0, 0)]]
    with pytest.raises(ValueError, match="empty frame list"):
        miniavi.encode_avi([], 10)
    with pytest.raises(ValueError, match="fps"):
        miniavi.encode_avi([frame], 0)
    with pytest.raises(ValueError, match="empty pixel"):
        miniavi.encode_avi([[]], 10)
    with pytest.raises(ValueError, match="dimensions"):
        miniavi.encode_avi([frame, [[(0, 0, 0)], [(0, 0, 0)]]], 10)


def test_decode_rejects_corruption():
    blob = miniavi.encode_avi(_gradient_frames(3, 2, 2), 10)
    with pytest.raises(ValueError, match="magic"):
        miniavi.decode_avi(b"not a video")
    with pytest.raises(ValueError, match="magic"):
        miniavi.decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="truncated|overruns"):
        miniavi.decode_avi(blob[:40])
    with pytest.raises(ValueError, match="truncated|overruns"):
        miniavi.decode_avi(blob[:-5])
    # headerless movi-only RIFF
    with pytest.raises(ValueError, match="avih"):
        miniavi.decode_avi(b"RIFF" + struct.pack("<I", 4) + b"AVI ")


def test_decode_rejects_frame_count_mismatch():
    blob = bytearray(miniavi.encode_avi(_gradient_frames(3, 2, 2), 10))
    # avih dwTotalFrames lives 16 bytes into the avih payload:
    # RIFF(12) + LIST hdr(8) + 'hdrl'(4) + avih hdr(8) + 16
    off = 12 + 8 + 4 + 8 + 16
    assert struct.unpack_from("<I", blob, off)[0] == 2
    struct.pack_into("<I", blob, off, 3)
    with pytest.raises(ValueError, match="declares 3 frames"):
        miniavi.decode_avi(bytes(blob))


def test_decode_rejects_unsupported_bit_depth():
    blob = bytearray(miniavi.encode_avi(_gradient_frames(3, 2, 1), 10))
    # strf biBitCount: RIFF(12) + LIST(8)+hdrl(4) + avih(8+56) +
    # LIST(8)+strl(4) + strh(8+56) + strf hdr(8) + 14
    off = 12 + 8 + 4 + 8 + 56 + 8 + 4 + 8 + 56 + 8 + 14
    assert struct.unpack_from("<H", blob, off)[0] == 24
    struct.pack_into("<H", blob, off, 32)
    with pytest.raises(ValueError, match="bpp=32"):
        miniavi.decode_avi(bytes(blob))


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _px = st.tuples(
        st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
    )

    @given(
        st.integers(1, 9),  # width
        st.integers(1, 6),  # height
        st.integers(1, 5),  # frames
        st.sampled_from([4, 5, 8, 10, 20, 25]),
        st.data(),
    )
    @settings(max_examples=40, deadline=None)
    def test_avi_roundtrip_property(w, h, n, fps, data):
        frames = [
            [
                [data.draw(_px) for _ in range(w)]
                for _ in range(h)
            ]
            for _ in range(n)
        ]
        v = miniavi.decode_avi(miniavi.encode_avi(frames, fps))
        assert v["frames"] == frames
        assert (v["rate"], v["scale"]) == (fps, 1)
        assert (v["width"], v["height"]) == (w, h)
except ImportError:  # pragma: no cover
    pass


def test_decode_video_bytes_live_path(spark, sf_dir):
    """End-to-end: video inventory → deterministic AVI synthesis → Arrow
    binary column → REAL stdlib RIFF/AVI parse; decoded features must equal
    the md5-60 derivation (the video_decode_real oracle's check)."""
    from kgx.operators import media, spans as spans_op
    from kgx.sources import docs as docs_src, corpus

    sp = docs_src.spans_table(
        corpus.narrative_documents(docs_src.load_documents(spark, sf_dir))
    )
    inv = media.media_inventory(spans_op.explode_spans(sp))
    rows = media.decode_video_bytes(media.synthesize_video_blobs(inv)).collect()
    n_video = inv.where("media_type = 'video'").count()
    assert len(rows) == n_video > 0
    for r in rows[:50]:
        h = media._md5_60(r["media_ref"])
        n = 2 + (h // 7) % 9
        fps = media.VIDEO_FPS_CHOICES[h % 6]
        assert r["format"] == "avi"
        assert r["width"] == 1 + h % 15
        assert r["height"] == 1 + (h // 31) % 11
        assert r["fps"] == fps
        assert r["n_frames"] == n
        assert r["duration_ms"] == n * 1000 // fps
        assert r["mean_r"] == sum((h + 37 * i) % 256 for i in range(n)) // n
        assert r["mean_g"] == (
            sum((h // 256 + 53 * i) % 256 for i in range(n)) // n
        )


def test_video_frame_means_explode_agrees_with_decode(spark, sf_dir):
    """The 1→N frame explode and the whole-video decode must agree: frame
    counts match, per-frame means equal the per-frame fill, and ts_ms is
    frame_idx * 1000 // fps exactly."""
    from pyspark.sql import functions as F

    from kgx.operators import media, spans as spans_op
    from kgx.sources import docs as docs_src, corpus

    sp = docs_src.spans_table(
        corpus.narrative_documents(docs_src.load_documents(spark, sf_dir))
    )
    inv = media.media_inventory(spans_op.explode_spans(sp))
    blobs = media.synthesize_video_blobs(inv).localCheckpoint()
    per_video = {
        r["media_ref"]: r["n_frames"]
        for r in media.decode_video_bytes(blobs).collect()
    }
    counts = (
        media.video_frame_means(blobs)
        .groupBy("media_ref")
        .agg(
            F.count("*").alias("n"),
            F.max("frame_idx").alias("max_idx"),
            F.min("ts_ms").alias("ts0"),
        )
        .collect()
    )
    assert {r["media_ref"]: r["n"] for r in counts} == per_video
    for r in counts:
        assert r["max_idx"] == per_video[r["media_ref"]] - 1
        assert r["ts0"] == 0


def _chunk(cc, data):
    return cc + struct.pack("<I", len(data)) + data + (
        b"\x00" if len(data) % 2 else b""
    )


def test_decode_skips_foreign_audio_stream():
    """A spec-legal AVI can carry an audio strl before the video strl;
    the decoder must take rate/scale/bpp from the vids stream only."""
    frames = _gradient_frames(3, 2, 2)
    blob = miniavi.encode_avi(frames, fps=10)
    (riff_size,) = struct.unpack("<I", blob[4:8])

    def lst(t, data):
        return _chunk(b"LIST", t + data)

    strh_a = _chunk(
        b"strh",
        struct.pack("<4s4sIHHIIIIIIII4h", b"auds", b"PCM ", 0, 0, 0, 0,
                    1, 8000, 0, 100, 0, 0, 2, 0, 0, 0, 0),
    )
    strf_a = _chunk(b"strf", struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16))
    audio_strl = lst(b"strl", strh_a + strf_a)

    rest, avih_seg, vstrl_seg = [], None, None
    for cc, ds, size in miniavi._walk(blob, 12, 8 + riff_size):
        seg = blob[ds - 8 : ds + size + (size % 2)]
        if cc == b"LIST" and blob[ds : ds + 4] == b"hdrl":
            for cc2, ds2, s2 in miniavi._walk(blob, ds + 4, ds + size):
                seg2 = blob[ds2 - 8 : ds2 + s2 + (s2 % 2)]
                if cc2 == b"avih":
                    avih_seg = seg2
                elif cc2 == b"LIST":
                    vstrl_seg = seg2
        else:
            rest.append(seg)
    new_blob = _chunk(
        b"RIFF",
        b"AVI " + lst(b"hdrl", avih_seg + audio_strl + vstrl_seg)
        + b"".join(rest),
    )
    v = miniavi.decode_avi(new_blob)
    assert v["frames"] == frames
    assert (v["rate"], v["scale"]) == (10, 1)
