"""Multimodal columns for training-data pipelines: image/audio/video as
opaque ``binary`` payloads with typed metadata structs, processed by
Arrow-batched ``mapInPandas`` operators.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested. The media decode resolves LAZILY per
executor batch: with ``fake=False`` each operator imports its decoder on
first use (PIL for images, soundfile — or the stdlib ``wave`` module for
WAV — for audio, PyAV for video) and runs the real decode when the
library is present; when it is absent the operator raises
``NotImplementedError`` naming the missing dependency. ``fake=True``
(the tested default in this image) substitutes a deterministic
md5-derived decoder with the same shape and stable values, so the
distributed plumbing is verifiable end-to-end either way, and the
component upgrades itself on any cluster whose image carries the libs.
The WAV path needs only the standard library, so real audio decode is
exercised by the test suite even here.

Scale notes: payload bytes travel as Arrow binary columns; mapInPandas
streams batches per partition so executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` x mean payload size —
size that conf (e.g. 64) for multi-MB media. Keep payloads out of shuffle
keys; repartition by a small id before wide ops.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every binary payload.
MEDIA_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("source_uri", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_METADATA_SCHEMA),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, content_md5 string, feat array<double>"
)


def text_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test/demo adapter: wrap a text column as a binary payload with
    metadata — the same column shapes a real image table would have."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.concat(F.lit("mem://doc/"), F.col(id_col)).alias("source_uri"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic md5-derived pseudo-feature vector in [0, 1)."""
    out = []
    for i in range(dim):
        h = hashlib.md5(payload + b"#%d" % i).hexdigest()[:8]
        out.append(int(h, 16) / 16**8)
    return out


def _optional(module: str):
    """Lazy optional-dependency import: the module object, or None when
    absent.  Called inside mapInPandas bodies so resolution happens on the
    EXECUTOR (whose image may differ from the driver's)."""
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError:
        return None


def _require(module: str, what: str):
    mod = _optional(module)
    if mod is None:
        raise NotImplementedError(
            f"real {what} requires the optional dependency {module!r}, "
            f"which is not installed on this executor; install it or pass "
            f"fake=True for the deterministic stand-in decoder"
        )
    return mod


def _read_wav(payload: bytes):
    """Stdlib WAV decode -> (samples as float in [-1,1], duration_ms).
    The no-dependency audio path: mono-mixes by taking channel 0."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n, ch, width, rate = (
            w.getnframes(), w.getnchannels(), w.getsampwidth(), w.getframerate()
        )
        raw = w.readframes(n)
    if width == 2:
        vals = struct.unpack(f"<{n * ch}h", raw)
        scale = 32768.0
    elif width == 1:
        vals = [b - 128 for b in raw]
        scale = 128.0
    else:
        raise NotImplementedError(f"WAV sample width {width} unsupported")
    samples = [vals[i * ch] / scale for i in range(n)]
    return samples, int(n * 1000 / rate)


def extract_features(df: DataFrame, fake: bool = True, dim: int = 4) -> DataFrame:
    """Per-payload feature extraction via mapInPandas (Arrow batches).

    ``fake=False`` decodes the payload as an image with PIL (lazily
    imported on the executor; NotImplementedError when absent) and emits
    real image statistics — width, height, aspect, mean luminance —
    padded/truncated to ``dim``; swap the stats for a model forward pass
    in the same loop for embedding extraction.
    """

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        if fake:
            feats = lambda b: _fake_features(b, dim)  # noqa: E731
        else:
            pil = _require("PIL.Image", "image feature extraction")

            def feats(b: bytes) -> list[float]:
                import io

                img = pil.open(io.BytesIO(b))
                gray = img.convert("L")
                hist = gray.histogram()
                n_px = max(1, sum(hist))
                mean_luma = sum(i * c for i, c in enumerate(hist)) / n_px / 255.0
                out = [
                    float(img.width),
                    float(img.height),
                    img.width / max(1, img.height),
                    mean_luma,
                ]
                return (out + [0.0] * dim)[:dim]

        for pdf in batches:
            payloads = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feat": payloads.map(lambda b: feats(bytes(b))),
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def decode_images(df: DataFrame, fake: bool = True) -> DataFrame:
    """Image decode -> (media_id, width, height, mode).

    ``fake=False`` decodes with PIL (lazy executor import; clear
    NotImplementedError when absent); ``fake=True`` derives deterministic
    dimensions from the payload hash — same shape either way."""

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if fake:
                h = pdf["content"].map(
                    lambda b: int(hashlib.md5(bytes(b)).hexdigest()[:4], 16)
                )
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": (64 + h % 193).astype("int32"),
                        "height": (64 + (h // 193) % 193).astype("int32"),
                        "mode": "RGB",
                    }
                )
                continue
            pil = _require("PIL.Image", "image decode")
            import io

            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                img = pil.open(io.BytesIO(bytes(content)))
                rows.append((mid, img.width, img.height, img.mode))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "mode"])

    return df.mapInPandas(op, schema="media_id long, width int, height int, mode string")


def frame_sample(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling -> one row per sampled frame offset (UDTF
    shape: one input row -> many output rows). STUB samples offsets from
    the fake duration (payload length as ms)."""

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            if fake:
                for mid, content in zip(pdf["media_id"], pdf["content"]):
                    duration = len(content)  # fake: 1 byte ~ 1 ms
                    for off in range(0, duration, every_ms):
                        rows.append((mid, off, hashlib.md5(bytes(content) + b"@%d" % off).hexdigest()))
            else:
                av = _require("av", "video frame sampling")
                import io

                for mid, content in zip(pdf["media_id"], pdf["content"]):
                    with av.open(io.BytesIO(bytes(content))) as container:
                        stream = container.streams.video[0]
                        next_off = 0
                        for frame in container.decode(stream):
                            off_ms = int(frame.time * 1000) if frame.time else 0
                            if off_ms >= next_off:
                                digest = hashlib.md5(
                                    frame.to_ndarray().tobytes()
                                ).hexdigest()
                                rows.append((mid, off_ms, digest))
                                next_off = off_ms + every_ms
            yield pd.DataFrame(rows, columns=["media_id", "frame_offset_ms", "frame_md5"])

    return df.mapInPandas(op, schema="media_id long, frame_offset_ms long, frame_md5 string")


def resize_images(
    df: DataFrame, max_side: int = 224, fake: bool = True
) -> DataFrame:
    """Image resize -> (media_id, width, height, content) with the longer
    side capped at ``max_side`` (aspect preserved, the standard
    pre-embedding normalization). STUB: dimensions come from the fake
    decoder and the resized payload is a deterministic md5-derived
    stand-in sized ~width*height/64; a real deployment swaps the body
    for PIL's ``thumbnail`` inside the same mapInPandas shape. Output
    payloads stay Arrow binary columns — same bounded-memory batching as
    the decode path."""

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            if fake:
                for mid, content in zip(pdf["media_id"], pdf["content"]):
                    b = bytes(content)
                    h = int(hashlib.md5(b).hexdigest()[:4], 16)
                    w0, h0 = 64 + h % 193, 64 + (h // 193) % 193
                    scale = min(1.0, max_side / max(w0, h0))
                    w1, h1 = max(1, int(w0 * scale)), max(1, int(h0 * scale))
                    seed = hashlib.md5(b + b"|resized").digest()
                    out = (seed * (w1 * h1 // 64 // len(seed) + 1))[: max(1, w1 * h1 // 64)]
                    rows.append((mid, w1, h1, out))
            else:
                pil = _require("PIL.Image", "image resize")
                import io

                for mid, content in zip(pdf["media_id"], pdf["content"]):
                    img = pil.open(io.BytesIO(bytes(content)))
                    img.thumbnail((max_side, max_side))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    rows.append((mid, img.width, img.height, buf.getvalue()))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "content"])

    return df.mapInPandas(
        op, schema="media_id long, width int, height int, content binary"
    )


def audio_windows(
    df: DataFrame, window_ms: int = 500, fake: bool = True, dim: int = 4
) -> DataFrame:
    """Audio windowing -> one row per fixed-length window with per-window
    features (the framing step before any audio encoder; UDTF shape like
    frame_sample). STUB: duration is the fake 1-byte~1-ms mapping and
    features are md5-derived from (payload, window index); a real
    deployment decodes PCM and computes e.g. log-mel stats in the same
    loop."""

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        sf = None if fake else _optional("soundfile")
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                if fake:
                    duration = len(b)
                    for i, start in enumerate(range(0, duration, window_ms)):
                        end = min(start + window_ms, duration)
                        rows.append(
                            (mid, i, start, end, _fake_features(b + b"#%d" % i, dim))
                        )
                    continue
                # real decode: soundfile when installed, else the stdlib
                # wave module (WAV only — the no-dependency path this
                # image CAN run); per-window RMS/mean/min/max stats stand
                # where a log-mel front end would go
                if sf is not None:
                    import io

                    data, rate = sf.read(io.BytesIO(b), always_2d=True)
                    samples = [float(r[0]) for r in data]
                    duration = int(len(samples) * 1000 / rate)
                else:
                    samples, duration = _read_wav(b)
                per_ms = len(samples) / max(1, duration)
                for i, start in enumerate(range(0, duration, window_ms)):
                    end = min(start + window_ms, duration)
                    lo, hi = int(start * per_ms), max(int(end * per_ms), int(start * per_ms) + 1)
                    win = samples[lo:hi]
                    n = len(win)
                    mean = sum(win) / n
                    rms = (sum(x * x for x in win) / n) ** 0.5
                    stats = [rms, mean, min(win), max(win)]
                    rows.append((mid, i, start, end, (stats + [0.0] * dim)[:dim]))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "window_idx", "start_ms", "end_ms", "feat"],
            )

    return df.mapInPandas(
        op,
        schema="media_id long, window_idx int, start_ms long, end_ms long,"
        " feat array<float>",
    )


PHASH_SCHEMA = "media_id long, phash long"


def media_phash(df: DataFrame, fake: bool = True, bits: int = 60) -> DataFrame:
    """Perceptual hash per media payload — the image twin of text
    SimHash, feeding the same 4-chunk pigeonhole pair join
    (dedup_similarity.hamming_near_dup_pairs) for near-duplicate image
    detection at corpus scale.

    ``fake=False`` computes an average-hash (aHash) with PIL: downscale
    to 8x8 grayscale, bit i = pixel_i > mean — nearly-identical images
    (recompressed, slightly cropped) land within a few bits. The 64-bit
    aHash is right-shifted to ``bits`` (60 keeps the 15-bit chunks of
    the shared pair join). ``fake=True`` derives a deterministic
    md5-prefix hash of the payload (identical payloads collide at
    hamming 0; others are ~uniform), so the distributed plumbing and
    the pair join are oracle-checkable in this image. Lazy executor
    import + NotImplementedError contract as the other decoders.
    """

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        if fake:
            def ph(b: bytes) -> int:
                h = hashlib.md5(bytes(b) + b"#ph").hexdigest()
                return int(h[: bits // 4], 16)
        else:
            pil = _require("PIL.Image", "perceptual hashing")

            def ph(b: bytes) -> int:
                import io

                img = pil.open(io.BytesIO(bytes(b)))
                small = img.convert("L").resize((8, 8))
                px = list(small.getdata())
                mean = sum(px) / 64.0
                h64 = 0
                for i, p in enumerate(px):
                    if p > mean:
                        h64 |= 1 << i
                return h64 >> (64 - bits)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pdf["content"].map(ph).astype("int64"),
                }
            )

    return df.mapInPandas(op, schema=PHASH_SCHEMA)
