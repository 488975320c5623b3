"""Multimodal column plumbing: binary payloads + typed metadata through
Arrow-batched mapInPandas operators (decode stubbed deterministically)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.multimodal import (
    decode_images,
    extract_features,
    audio_windows,
    frame_sample,
    resize_images,
    text_as_media,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "x" * 2500), (2, "")],
        "doc_id long, text string",
    )
    return text_as_media(docs)


def test_media_schema(media):
    row = media.filter(F.col("media_id") == 0).collect()[0]
    assert bytes(row["content"]) == b"hello world"
    assert row["meta"]["mime"] == "application/octet-stream"
    assert row["meta"]["source_uri"] == "mem://doc/0"


def test_extract_features_deterministic(media):
    out = {r["media_id"]: r for r in extract_features(media, fake=True).collect()}
    assert out[0]["n_bytes"] == 11
    assert out[0]["content_md5"] == hashlib.md5(b"hello world").hexdigest()
    assert len(out[0]["feat"]) == 4
    assert all(0.0 <= f < 1.0 for f in out[0]["feat"])
    # empty payload still flows through the Arrow batch path
    assert out[2]["n_bytes"] == 0
    # rerun -> identical (no hidden randomness)
    again = {r["media_id"]: r for r in extract_features(media, fake=True).collect()}
    assert out[1]["feat"] == again[1]["feat"]


def test_real_decode_is_marked_unimplemented(media):
    with pytest.raises(Exception) as exc:
        extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_decode_images_stub(media):
    out = {r["media_id"]: r for r in decode_images(media, fake=True).collect()}
    assert out[0]["mode"] == "RGB" and 64 <= out[0]["width"] < 257


def test_frame_sample_udtf_shape(media):
    # 2500-'ms' payload sampled every 1000ms -> frames at 0/1000/2000
    frames = frame_sample(media, every_ms=1000, fake=True).filter(
        F.col("media_id") == 1
    ).collect()
    assert [f["frame_offset_ms"] for f in sorted(frames, key=lambda r: r["frame_offset_ms"])] == [0, 1000, 2000]


def test_resize_caps_longer_side_and_preserves_aspect(media):
    out = {r["media_id"]: r for r in resize_images(media, max_side=100, fake=True).collect()}
    dec = {r["media_id"]: r for r in decode_images(media, fake=True).collect()}
    for mid, r in out.items():
        w0, h0 = dec[mid]["width"], dec[mid]["height"]
        assert max(r["width"], r["height"]) <= 100
        if max(w0, h0) <= 100:  # already small: untouched dims
            assert (r["width"], r["height"]) == (w0, h0)
        else:  # aspect preserved within integer truncation
            assert abs(r["width"] * h0 - r["height"] * w0) <= max(w0, h0)
        assert r["content"] is not None and len(r["content"]) >= 1
    # deterministic across runs
    again = {r["media_id"]: bytes(r["content"]) for r in resize_images(media, max_side=100, fake=True).collect()}
    assert {m: bytes(r["content"]) for m, r in out.items()} == again


def test_audio_windows_tile_duration(media):
    rows = audio_windows(media, window_ms=1000, fake=True).filter(
        F.col("media_id") == 1
    ).collect()
    rows.sort(key=lambda r: r["window_idx"])
    # 2500-'ms' payload -> windows [0,1000) [1000,2000) [2000,2500)
    assert [(r["start_ms"], r["end_ms"]) for r in rows] == [
        (0, 1000), (1000, 2000), (2000, 2500),
    ]
    assert all(len(r["feat"]) == 4 for r in rows)
    # distinct windows get distinct features (salted by index)
    assert rows[0]["feat"] != rows[1]["feat"]


def test_resize_and_audio_real_paths_unimplemented(media):
    with pytest.raises(Exception):
        resize_images(media, fake=False).collect()
    with pytest.raises(Exception):
        audio_windows(media, fake=False).collect()


def _wav_bytes(freq_hz=440.0, ms=1200, rate=8000, amp=0.5):
    """A real little WAV file via the stdlib (16-bit mono sine)."""
    import io
    import math
    import struct
    import wave

    n = int(rate * ms / 1000)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack(
                "<h", int(amp * 32767 * math.sin(2 * math.pi * freq_hz * i / rate))
            )
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_audio_windows_real_wav_decode(spark):
    """The REAL audio path on stdlib-decodable WAV payloads: windows tile
    the true duration (from the WAV header, not payload length) and RMS
    of a 0.5-amplitude sine lands near 0.5/sqrt(2)."""
    wav = _wav_bytes()
    df = spark.createDataFrame(
        [(7, wav)], "media_id long, content binary"
    )
    out = audio_windows(df, window_ms=500, fake=False).orderBy("window_idx").collect()
    assert [r["window_idx"] for r in out] == [0, 1, 2]
    assert out[0]["start_ms"] == 0 and out[0]["end_ms"] == 500
    assert out[2]["end_ms"] == 1200  # true duration from the header
    rms = out[0]["feat"][0]
    assert abs(rms - 0.5 / 2**0.5) < 0.01
    # determinism across runs
    again = audio_windows(df, window_ms=500, fake=False).orderBy("window_idx").collect()
    assert [r["feat"] for r in again] == [r["feat"] for r in out]


def test_image_real_paths_decode_with_pil_when_present(spark):
    """Real image decode/resize/features — runs wherever PIL is
    installed, auto-skips here (the lazy-import upgrade contract)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = PIL_Image.new("RGB", (320, 200), color=(255, 0, 0))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, buf.getvalue())], "media_id long, content binary"
    )
    dec = decode_images(df, fake=False).collect()[0]
    assert (dec["width"], dec["height"], dec["mode"]) == (320, 200, "RGB")
    rs = resize_images(df, max_side=100, fake=False).collect()[0]
    assert max(rs["width"], rs["height"]) == 100
    feats = extract_features(df, fake=False).collect()[0]
    assert feats["feat"][0] == 320.0 and feats["feat"][1] == 200.0


def test_missing_decoder_error_names_dependency(media):
    """fake=False with the lib absent raises an error NAMING the missing
    module (auto-skips if the lib is actually present)."""
    try:
        import PIL.Image  # noqa: F401

        pytest.skip("PIL present: the real path runs instead")
    except ImportError:
        pass
    with pytest.raises(Exception) as exc:
        decode_images(media, fake=False).collect()
    assert "PIL.Image" in str(exc.value)


class TestMediaPhash:
    def test_fake_phash_pairs_exact_dups_only(self, spark):
        from pyspark.sql import Row
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.dedup_similarity import (
            hamming_near_dup_pairs,
        )
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.multimodal import (
            media_phash,
            text_as_media,
        )

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="same payload body"),
                Row(doc_id=2, text="same payload body"),
                Row(doc_id=3, text="a different payload"),
            ]
        )
        ph = media_phash(text_as_media(docs), fake=True)
        rows = {r.media_id: r.phash for r in ph.collect()}
        assert rows[1] == rows[2] != rows[3]
        assert all(0 <= v < (1 << 60) for v in rows.values())
        pairs = hamming_near_dup_pairs(
            ph.localCheckpoint(), id_col="media_id", hash_col="phash", bits=60
        ).collect()
        assert [(r.doc_a, r.doc_b, r.hamming) for r in pairs] == [(1, 2, 0)]

    def test_real_phash_requires_pil(self, spark):
        from pyspark.sql import Row
        import pytest as _pytest
        from automated_ohlcv_data_pipeline_for_algorithmic_trading_spark.operators.multimodal import (
            _optional,
            media_phash,
            text_as_media,
        )

        docs = spark.createDataFrame([Row(doc_id=1, text="x")])
        out = media_phash(text_as_media(docs), fake=False)
        if _optional("PIL.Image") is None:
            with _pytest.raises(Exception):  # NotImplementedError via Py4J
                out.collect()
        else:  # pragma: no cover - image lib present in some envs
            _pytest.skip("PIL present; real decode covered elsewhere")
