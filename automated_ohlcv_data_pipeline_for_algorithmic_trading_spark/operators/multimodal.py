"""Multimodal columns for training-data pipelines: image/audio/video as
opaque ``binary`` payloads with typed metadata structs, processed by
Arrow-batched ``mapInPandas`` operators.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested. The actual media decode is STUBBED: this
container has no image/audio libraries, so ``decode_images`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic md5-derived fake decoder stands in (same shape, stable
values, so the distributed plumbing is verifiable end-to-end).

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


def extract_features(df: DataFrame, fake: bool = True, dim: int = 4) -> DataFrame:
    """Per-payload feature extraction via mapInPandas (Arrow batches).

    With ``fake=False`` this is where a real model/decoder would run —
    currently NotImplementedError (no media libs in this environment).
    """

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires image/audio libraries not "
                    "present in this environment; pass fake=True"
                )
            payloads = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feat": payloads.map(lambda b: _fake_features(bytes(b), dim)),
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def decode_images(df: DataFrame, fake: bool = True) -> DataFrame:
    """Image decode -> (media_id, width, height, mode). STUB: deterministic
    fake dimensions derived from the payload hash; a real deployment swaps
    the body for PIL/torchvision inside the same mapInPandas shape."""

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError("no image decoder in this environment")
            h = pdf["content"].map(lambda b: int(hashlib.md5(bytes(b)).hexdigest()[:4], 16))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": (64 + h % 193).astype("int32"),
                    "height": (64 + (h // 193) % 193).astype("int32"),
                    "mode": "RGB",
                }
            )

    return df.mapInPandas(op, schema="media_id long, width int, height int, mode string")


def frame_sample(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling -> one row per sampled frame offset (UDTF
    shape: one input row -> many output rows). STUB samples offsets from
    the fake duration (payload length as ms)."""

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError("no video decoder in this environment")
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                duration = len(content)  # fake: 1 byte ~ 1 ms
                for off in range(0, duration, every_ms):
                    rows.append((mid, off, hashlib.md5(bytes(content) + b"@%d" % off).hexdigest()))
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
            if not fake:
                raise NotImplementedError("no image decoder in this environment")
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                h = int(hashlib.md5(b).hexdigest()[:4], 16)
                w0, h0 = 64 + h % 193, 64 + (h // 193) % 193
                scale = min(1.0, max_side / max(w0, h0))
                w1, h1 = max(1, int(w0 * scale)), max(1, int(h0 * scale))
                seed = hashlib.md5(b + b"|resized").digest()
                out = (seed * (w1 * h1 // 64 // len(seed) + 1))[: max(1, w1 * h1 // 64)]
                rows.append((mid, w1, h1, out))
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

        for pdf in batches:
            if not fake:
                raise NotImplementedError("no audio decoder in this environment")
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                duration = len(b)
                for i, start in enumerate(range(0, duration, window_ms)):
                    end = min(start + window_ms, duration)
                    rows.append(
                        (
                            mid,
                            i,
                            start,
                            end,
                            _fake_features(b + b"#%d" % i, dim),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "window_idx", "start_ms", "end_ms", "feat"],
            )

    return df.mapInPandas(
        op,
        schema="media_id long, window_idx int, start_ms long, end_ms long,"
        " feat array<float>",
    )
