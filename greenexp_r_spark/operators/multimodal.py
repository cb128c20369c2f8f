"""Multimodal column plumbing: opaque binary payloads + typed metadata
extracted by Arrow-batched pandas (`mapInPandas`).

The container has no image/audio codecs, so the actual decode is a
STUB (`decode_image_real` raises NotImplementedError); the Spark-side
plumbing — binary column construction, schema contract, partition-
preserving mapInPandas, batch-shaped UDF — is real and tested.  The
deterministic fake decoder derives metadata purely from the payload
bytes, so it has an exact SQL oracle.

Scale notes: mapInPandas streams Arrow batches; nothing is collected;
binary payloads never shuffle (metadata extraction is a narrow map,
output drops the payload column before any wide op).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType,
                               StructField, StructType)

META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("fake_width", LongType()),
    StructField("fake_height", LongType()),
    StructField("fmt", StringType()),
])


def pages_with_payload(docs: DataFrame) -> DataFrame:
    """Attach the html binary payload (input_hint pages shape):
    html = b'<html><body>' + text + b'</body></html>'."""
    html = F.encode(
        F.concat(F.lit("<html><body>"), F.col("text"),
                 F.lit("</body></html>")), "UTF-8")
    return docs.select("doc_id", html.alias("html"))


def decode_image_real(payload: bytes):
    """Real decode path — requires PIL/libjpeg, absent here."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this "
        "container; the deterministic fake below exercises the same "
        "Spark plumbing (schema, batching, partitioning)")


def _fake_meta(payload: bytes) -> tuple[int, int, int, str]:
    n = len(payload)
    return (n, 64 + n % 512, 64 + (n * 7) % 512,
            "png" if n % 2 == 0 else "jpeg")


def decode_meta(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, fake_width, fake_height, fmt) via mapInPandas
    over the binary payload — the batch shape a real decoder would use."""
    pages = pages_with_payload(docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = pdf["html"].map(_fake_meta)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": metas.map(lambda m: m[0]),
                "fake_width": metas.map(lambda m: m[1]),
                "fake_height": metas.map(lambda m: m[2]),
                "fmt": metas.map(lambda m: m[3]),
            })

    return pages.mapInPandas(batches, META_SCHEMA)
