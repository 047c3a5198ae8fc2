"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video columns are opaque ``binary`` with a metadata struct; the
decode / feature-extract stage runs as Arrow-batched ``mapInPandas`` so the
Spark-side contract (schema, batch shape, partitioning) is real and tested.
The actual codecs are NOT in this container, so :func:`decode_image_real`
is a clearly-marked stub (NotImplementedError) and the pipeline uses
:func:`decode_features` — a deterministic fake decoder over the payload
bytes (mirrored by the DuckDB oracle, since the synthetic payload is the
document text encoded as UTF-8).

At scale: mapInPandas streams Arrow record batches through one Python
worker per core with no shuffle; metadata-only predicates (format, size)
are Catalyst filters that never touch Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id bigint, fmt string, byte_len bigint, checksum string, "
    "width int, height int, n_frames int"
)


def with_binary_payload(corpus: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload binary, meta struct) — the multimodal
    column contract. Payload = UTF-8 text bytes standing in for media."""
    return corpus.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.element_at(
                F.array(F.lit("png"), F.lit("jpeg"), F.lit("wav"), F.lit("mp4")),
                (F.col("doc_id") % 4 + 1).cast("int"),
            ).alias("fmt"),
            F.length(F.col("text")).alias("claimed_len"),
        ).alias("meta"),
    )


def decode_image_real(payload: bytes) -> dict:
    """Real decoder plug-in point (PIL/ffmpeg are not in this container)."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; pipeline uses "
        "decode_features (deterministic fake) for the Spark-side plumbing"
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': deterministic features of the payload bytes
    (length, md5, fake dimensions, frame count by format)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payload = pdf["payload"]
            fmt = pdf["meta"].map(lambda m: m["fmt"])
            blen = payload.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": fmt,
                    "byte_len": blen,
                    "checksum": payload.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "width": (blen % 640).astype("int32"),
                    "height": (blen % 480).astype("int32"),
                    "n_frames": fmt.map(lambda f: 16 if f == "mp4" else 1).astype(
                        "int32"
                    ),
                }
            )

    return media.mapInPandas(batches, DECODE_SCHEMA)


def frame_sample(decoded: DataFrame, stride: int = 4) -> DataFrame:
    """Frame sampling for video rows: explode every stride-th frame index."""
    frames = F.sequence(
        F.lit(0), F.col("n_frames") - 1, F.lit(stride)
    )
    return decoded.filter(F.col("fmt") == "mp4").select(
        "doc_id",
        "checksum",
        F.explode(frames).alias("frame_idx"),
    )
