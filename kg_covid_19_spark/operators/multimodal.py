"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The container has no decode libraries (PIL/ffmpeg), so the decode kernel is
STUBBED: ``decode_media`` raises NotImplementedError unless the
deterministic fake decoder is selected. Everything around the stub — the
binary column handling, Arrow batch shape, ``mapInPandas`` signature,
declared output schema, partition behavior — is real and tested; swapping
in a real decoder is a one-function change.

Scale notes: media bytes dominate row size, so the kernel runs via
``mapInPandas`` (per-partition batch iterator) — one Arrow transfer per
batch, no per-row overhead — and the output projects the bytes away so
downstream stages never reshuffle them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.corpus import read_table

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("decoder", StringType(), False),
    ]
)


def decode_media(data: bytes, decoder: str = "fake-v1") -> tuple[int, int]:
    """Decode media bytes → (width, height).

    Only the deterministic fake decoder exists in this environment; a real
    image decode (PIL.Image.open → .size) plugs in here.
    """
    if decoder == "fake-v1":
        n = len(data)
        return (n % 640) + 1, (n // 640) + 1
    raise NotImplementedError(
        f"decoder {decoder!r} requires media libraries not present in this "
        "container; only 'fake-v1' (deterministic stub) is available"
    )


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a synthetic binary media column (utf-8 text bytes) —
    the stand-in for (url, media binary) rows."""
    return read_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("media")
    )


def media_metadata(spark: SparkSession, sf_dir: str,
                   decoder: str = "fake-v1") -> DataFrame:
    """Per-media metadata via the decode kernel (mapInPandas)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes = pdf["media"].map(len)
            dims = pdf["media"].map(lambda b: decode_media(bytes(b), decoder))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": sizes.astype("int32"),
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                    "decoder": decoder,
                }
            )

    return media_frame(spark, sf_dir).mapInPandas(decode_batches, MEDIA_META_SCHEMA)


MULTIMODAL_ORACLES = {
    "media_metadata": """
SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       (octet_length(encode(text)) % 640) + 1 AS width,
       (octet_length(encode(text)) // 640) + 1 AS height,
       'fake-v1' AS decoder
FROM documents
""",
}

MULTIMODAL_QUERIES = {
    "media_metadata": media_metadata,
}
