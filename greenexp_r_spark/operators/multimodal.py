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


THUMB_BLOCKS = 4          # resize target: 4×4 block means
FRAME_BYTES = 256         # fake video: 256-byte frames
FRAME_SAMPLE_EVERY = 2    # sample every 2nd frame
FRAME_MS = 40             # 25 fps


def thumb_dims(n_bytes: int) -> tuple[int, int]:
    """Deterministic fake source dims, divisible by THUMB_BLOCKS so
    block-mean resize partitions exactly."""
    return 32 + 4 * (n_bytes % 8), 32 + 4 * ((n_bytes * 3) % 8)


def thumbnail_stats(docs: DataFrame) -> DataFrame:
    """Decode + resize plumbing: the deterministic fake image of each
    page (pixel(r,c) = ascii of text char at (r·w0+c) mod len — byte
    stream as pixel grid) is block-mean-resized to 4×4.  This is the
    exact batch shape of a real thumbnailer (decode → numpy grid →
    block reduce); the fake decode keeps an exact SQL oracle.
    Output: (doc_id, w0, h0, b00..b33 as double block means).
    """
    import numpy as np

    fields = [StructField("doc_id", LongType()),
              StructField("w0", LongType()),
              StructField("h0", LongType())]
    bnames = [f"b{i}{j}" for i in range(THUMB_BLOCKS)
              for j in range(THUMB_BLOCKS)]
    from pyspark.sql.types import DoubleType
    fields += [StructField(b, DoubleType()) for b in bnames]
    schema = StructType(fields)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = THUMB_BLOCKS
        for pdf in it:
            if not len(pdf):
                continue
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                arr = np.frombuffer(text.encode("ascii"), dtype=np.uint8)
                n = len(arr) + 26          # payload length (html wrap)
                w0, h0 = thumb_dims(n)
                px = arr[np.arange(h0 * w0) % len(arr)].astype(np.int64)
                sums = px.reshape(k, h0 // k, k, w0 // k).sum(axis=(1, 3))
                cells = (h0 // k) * (w0 // k)
                row = {"doc_id": did, "w0": w0, "h0": h0}
                for i in range(k):
                    for j in range(k):
                        row[f"b{i}{j}"] = sums[i, j] / cells
                rows.append(row)
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text").mapInPandas(batches, schema)


def frame_samples(docs: DataFrame) -> DataFrame:
    """Frame-sampling plumbing: the page payload is treated as a fake
    video of FRAME_BYTES-byte frames; every FRAME_SAMPLE_EVERY-th
    frame is sampled and checksummed (sum of byte values) — the batch
    shape of a real frame sampler (seek → decode frame → feature).
    Output: (doc_id, frame_idx, ts_ms, frame_bytes, checksum).
    """
    import numpy as np

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("ts_ms", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("checksum", LongType()),
    ])
    pages = pages_with_payload(docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "frame_idx", "ts_ms",
                                   "frame_bytes", "checksum")}
            for did, payload in zip(pdf["doc_id"], pdf["html"]):
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(arr)
                n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
                for f in range(0, n_frames, FRAME_SAMPLE_EVERY):
                    frame = arr[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
                    out["doc_id"].append(did)
                    out["frame_idx"].append(f)
                    out["ts_ms"].append(f * FRAME_MS)
                    out["frame_bytes"].append(len(frame))
                    out["checksum"].append(int(frame.sum()))
            yield pd.DataFrame(out)

    return pages.mapInPandas(batches, schema)


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
