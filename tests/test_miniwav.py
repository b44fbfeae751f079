"""Live-bytes audio decode: stdlib WAV/PCM codec + the Arrow decode stage
(kgx.sources.miniwav + kgx.operators.media.decode_audio_bytes) — the audio
twin of test_miniimage."""

import pytest

from kgx.sources import miniwav


def test_roundtrip_arbitrary_waveform_mono():
    samples = [0, 1, -1, 32767, -32768, 123, -4567, 890] * 5
    feats = miniwav.decode_wav(miniwav.encode_wav(samples, 8000, 1))
    assert feats["channels"] == 1
    assert feats["sample_rate"] == 8000
    assert feats["n_frames"] == len(samples)
    assert feats["duration_ms"] == len(samples) * 1000 // 8000
    assert feats["peak"] == 32768  # |−32768|
    assert feats["mean_abs"] == sum(abs(s) for s in samples) // len(samples)


def test_roundtrip_stereo_interleaved():
    # L channel loud, R channel quiet — means span both channels
    samples = [1000, -10, -1000, 10] * 8  # 16 frames, interleaved L R
    feats = miniwav.decode_wav(miniwav.encode_wav(samples, 16000, 2))
    assert feats["channels"] == 2
    assert feats["n_frames"] == len(samples) // 2
    assert feats["duration_ms"] == (len(samples) // 2) * 1000 // 16000
    assert feats["peak"] == 1000
    assert feats["mean_abs"] == (1000 + 10) // 2


def test_encode_rejects_bad_input():
    with pytest.raises(ValueError, match="int16"):
        miniwav.encode_wav([40000])
    with pytest.raises(ValueError, match="channel"):
        miniwav.encode_wav([0], channels=3)
    with pytest.raises(ValueError, match="interleave"):
        miniwav.encode_wav([0, 1, 2], channels=2)


def test_decode_rejects_corruption():
    blob = miniwav.encode_wav([100, -100] * 10)
    with pytest.raises(ValueError, match="magic"):
        miniwav.decode_wav(b"not audio at all")
    with pytest.raises(ValueError, match="corrupt|truncated"):
        miniwav.decode_wav(blob[:30])
    # 8-bit PCM is spec-valid WAV but outside this codec's contract
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(b"\x80" * 16)
    with pytest.raises(ValueError, match="width"):
        miniwav.decode_wav(buf.getvalue())


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(st.integers(-32768, 32767), min_size=2, max_size=400).map(
            lambda s: s if len(s) % 2 == 0 else s + [0]
        ),
        st.sampled_from([1, 2]),
        st.sampled_from([8000, 16000, 44100]),
    )
    @settings(max_examples=40, deadline=None)
    def test_wav_feature_roundtrip_property(samples, channels, rate):
        feats = miniwav.decode_wav(miniwav.encode_wav(samples, rate, channels))
        n = len(samples)
        assert feats["channels"] == channels
        assert feats["sample_rate"] == rate
        assert feats["n_frames"] == n // channels
        assert feats["peak"] == max(abs(s) for s in samples)
        assert feats["mean_abs"] == sum(abs(s) for s in samples) // n
except ImportError:  # pragma: no cover
    pass


def test_decode_audio_bytes_live_path(spark, sf_dir):
    """End-to-end: audio inventory → deterministic WAV synthesis → Arrow
    binary column → REAL stdlib RIFF parse; decoded features must equal the
    md5-60 derivation (the audio_decode_real oracle's check)."""
    from kgx.operators import media, spans as spans_op
    from kgx.sources import docs as docs_src, corpus

    sp = docs_src.spans_table(
        corpus.narrative_documents(docs_src.load_documents(spark, sf_dir))
    )
    inv = media.media_inventory(spans_op.explode_spans(sp))
    rows = media.decode_audio_bytes(media.synthesize_audio_blobs(inv)).collect()
    n_audio = inv.where("media_type = 'audio'").count()
    assert len(rows) == n_audio > 0
    for r in rows[:50]:
        h = media._md5_60(r["media_ref"])
        assert r["channels"] == 1 + h % 2
        assert r["sample_rate"] == 8000
        assert r["n_frames"] == 160 + h % 800
        assert r["duration_ms"] == (160 + h % 800) * 1000 // 8000
        amp = 1000 + (h // 7) % 20000
        assert r["peak"] == amp == r["mean_abs"]
