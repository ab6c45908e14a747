"""Multimodal column plumbing (north-star extension).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, and implements the decode / feature-extract stages as
Arrow-batched ``mapInPandas`` operators. The actual media decode is
STUBBED (no image/audio libraries in this container — clearly marked
below); everything Spark-side is real and tested: schema, binary column
handling, UDF signatures, batch iteration, partitioning.

At scale: binary payloads stay in parquet (never shuffled unless needed);
metadata extraction is a map-only stage (no shuffle); decode parallelism
is per-partition with Arrow batches bounding memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes int, fake_width int, fake_height int, checksum string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (stand-in for image/audio bytes).

    In production this column arrives from the source parquet; here it is
    synthesized from the text column (UTF-8 bytes) so the binary-column
    code path is exercised end-to-end.
    """
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas operator: binary payload → typed metadata row.

    STUB: a real deployment would decode the payload here (PIL/ffmpeg —
    not available in this container). The fake decode is deterministic
    arithmetic on the byte payload so the full Spark plumbing (Arrow
    batches in/out, schema contract, per-partition iteration) is real and
    oracle-checkable.
    """
    try:  # pragma: no cover - the real decoder is intentionally absent here
        import PIL.Image  # noqa: F401

        have_decoder = True
    except ImportError:
        have_decoder = False

    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        if have_decoder:
            # Real decode path would go here; not reachable in this image.
            raise NotImplementedError("real media decode not wired in this container")
        n_bytes = payloads.map(len).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "fake_width": (n_bytes % 640).astype("int32"),
                "fake_height": (n_bytes % 480).astype("int32"),
                "checksum": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
            }
        )


def decode_media(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """Run the (stubbed) decoder over the binary column, Arrow-batched."""
    return df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")).mapInPandas(
        decode_media_batch, schema=DECODED_SCHEMA
    )
