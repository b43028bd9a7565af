"""Multimodal column handling (north-star brief).

Pattern: media travels as an opaque BinaryType column + a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas functions over mapInPandas, so each executor
core processes a batch of blobs without JVM round-trips per row.

The image/audio codecs are NOT in this container, so ``decode_image``
raises NotImplementedError and the pipeline runs with
``fake_decode_meta`` — a deterministic stand-in with the same schema
and batch shape, keeping the Spark-side plumbing (schemas,
partitioning, UDF signatures) real and tested.

At 100 TB: blobs dominate bytes — keep them in their own column so
column pruning skips them unless a stage truly decodes, and size
``spark.sql.files.maxPartitionBytes`` so one task holds only a few
hundred blobs in flight.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, uri string, media_type string, n_bytes long, payload binary"
)

DECODED_SCHEMA = "doc_id long, media_type string, width int, height int, n_frames int"


def attach_media(documents: DataFrame) -> DataFrame:
    """Manufacture the multimodal column layout from the documents
    fixture: payload = utf-8 bytes of text, media type derived from
    lang (deterministic)."""
    media_type = (
        F.when(F.col("lang").isin("en", "de"), "image/png")
        .when(F.col("lang").isin("es", "fr"), "audio/wav")
        .otherwise("video/mp4")
    )
    return documents.select(
        "doc_id",
        F.concat(F.lit("blob://corpus/"), F.col("doc_id").cast("string")).alias("uri"),
        media_type.alias("media_type"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.encode("text", "utf-8").alias("payload"),
    )


def decode_image(payload: bytes) -> dict:
    """Real decoder hook — requires an image codec library.

    Cite: container has no PIL/cv2; see module docstring. Swap this in
    on a cluster image that ships codecs.
    """
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "use fake_decode_meta for plumbing tests"
    )


def fake_decode_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic decode stand-in (same schema/batch shape as a real
    decoder): dimensions derived from payload length."""
    for pdf in batches:
        n = pdf["n_bytes"]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": (16 + n % 64).astype("int32"),
                "height": (9 + n % 36).astype("int32"),
                "n_frames": pdf["media_type"].map(
                    lambda m: 1 if m != "video/mp4" else 24
                ),
            }
        )
        yield out


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode over mapInPandas (fake decoder)."""
    return media.mapInPandas(fake_decode_meta, schema=DECODED_SCHEMA)
