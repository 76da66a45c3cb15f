"""Multimodal column plumbing (SURVEY.md §2B "Multimodal columns").

Images/audio/video ride as opaque ``binary`` columns with typed metadata
structs alongside relational data. The Spark-side plumbing is real —
schemas, Arrow-batched Pandas UDF boundaries, partition-friendly layout;
the actual codec step is a deterministic FAKE (the container ships no
image/audio libraries), clearly marked and swappable for a real decoder.

At 100 TB the pattern that matters: keep payload bytes in their own
parquet column (columnar pruning means metadata-only queries never read
the blobs), decode with ``mapInPandas`` (Arrow batches, not per-row
pickling), and never collect payloads to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, byte_len long, width int, height int, mode string"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary payload column (UTF-8 bytes of the text field —
    the deterministic stand-in for real image/audio bytes)."""
    return docs.withColumn("payload", F.encode(F.col("text"), "UTF-8"))


def binary_metadata(docs: DataFrame) -> DataFrame:
    """Pure-native metadata over a binary column: byte length, content
    hash, hex prefix — the queries a 100 TB pipeline runs WITHOUT
    decoding (and, thanks to columnar pruning, without reading payloads
    when metadata is pre-materialized)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("byte_len"),
        F.sha2(payload, 256).alias("content_sha256"),
        F.lower(F.hex(F.substring(F.col("text"), 1, 8))).alias("hex_prefix"),
    )


def fake_decode_image(docs_with_payload: DataFrame) -> DataFrame:
    """'Decode' binary payloads via mapInPandas (Arrow batch iterator —
    the real-decoder integration point).

    STUB: a real build would call PIL/libvips here. The fake derives
    deterministic pseudo-dimensions from the byte length so the full
    plumbing (batch shapes, schema contract, null payloads) is testable.
    """
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blens = pdf["payload"].map(lambda b: 0 if b is None else len(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": blens.astype("int64"),
                    "width": (blens % 640 + 1).astype("int32"),
                    "height": (blens % 480 + 1).astype("int32"),
                    "mode": ["RGB" if b % 2 == 0 else "L" for b in blens],
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        decode, schema=DECODED_SCHEMA
    )


def real_decode_image(docs_with_payload: DataFrame) -> DataFrame:
    """Integration point for a real image decoder (PIL etc.). Not
    available in this container."""
    raise NotImplementedError(
        "image codec libraries are not installed in this environment; "
        "use fake_decode_image for plumbing tests"
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"


def frame_sample(docs_with_payload: DataFrame, frame_bytes: int = 16,
                 stride: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video-like binary payloads: treat the
    byte stream as fixed-size frames, emit every ``stride``-th frame's
    index + content hash via mapInPandas (Arrow batches — the decoder
    integration point; a real build would seek keyframes instead of
    slicing bytes).

    At 100 TB this is the access pattern that matters: the payload column
    is read once per partition, frames fan out executor-side (never
    through the driver), and downstream joins run on the compact
    (doc_id, frame_idx, hash) rows, not the blobs."""
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list[int] = []
            idxs: list[int] = []
            hashes: list[str] = []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                if b is None or len(b) == 0:
                    continue
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    frame = bytes(b[i * frame_bytes:(i + 1) * frame_bytes])
                    doc_ids.append(did)
                    idxs.append(i)
                    hashes.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(hashes, dtype="object"),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        sample, schema=FRAME_SCHEMA
    )
