"""Multimodal column plumbing: media as opaque binary + typed metadata.

The crawl engine's interleaved spans carry ``media_ref`` pointers
(input_hint payload); a training pipeline materializes those as binary
columns and runs decode / feature-extract / resize / frame-sample over them.
The image/audio codecs are NOT in this container, so the decode step is a
deterministic fake behind ``decode_available()`` — what IS real and tested is
the Spark-side plumbing: schema, Arrow batch shape, mapInPandas signature,
and partition behavior, which is exactly what survives a swap-in of a real
codec (PIL/libav) on a production cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_available() -> bool:
    """True when a real image codec is importable (never in this sandbox)."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for image decode + 4-dim feature extraction.

    A real implementation decodes ``payload``; the fake derives (width,
    height, feature) from its digest so tests are stable and the Arrow
    plumbing (binary in, struct+array out) is exercised for real.
    """
    d = hashlib.md5(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    feature = [round(b / 255.0, 6) for b in d[2:6]]
    return width, height, feature


def extract_media_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas decode/feature pass over binary payloads (Arrow batches).

    At 100 TB: media rows are large — repartition upstream so a batch of
    payloads fits executor memory; the transform itself is embarrassingly
    parallel and shuffle-free.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode_available():  # pragma: no cover - not in sandbox
            raise NotImplementedError("real codec path: decode payload with PIL")
        for pdf in batches:
            decoded = pdf["payload"].map(lambda p: _fake_decode(bytes(p)) if p is not None else (None, None, None))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "feature": decoded.map(lambda t: t[2]),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_table_from_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a media table: text bytes as the opaque payload (the
    pipeline treats payloads as opaque, so this is faithful plumbing)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.concat(F.lit("media-"), F.col(id_col).cast("string")).alias("media_id"),
        payload.alias("payload"),
        F.when(F.col(id_col) % 3 == 0, "image/jpeg").when(F.col(id_col) % 3 == 1, "audio/wav").otherwise("video/mp4").alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
    )
