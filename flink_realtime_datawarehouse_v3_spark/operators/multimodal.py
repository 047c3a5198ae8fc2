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


RESIZE_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, target_w int, "
    "target_h int, out_len bigint, out_checksum string, scale_x double, "
    "scale_y double"
)


def resize_stub(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Arrow-batched 'resize' for image rows: the scaling contract with a
    deterministic stand-in transform (output payload = input truncated to
    target_w * target_h bytes — one byte per pixel; a real resampler plugs
    in at :func:`decode_image_real`).

    The image-format predicate is a Catalyst filter on the METADATA struct,
    so non-image rows never cross into Python — the pattern that matters at
    100 TB where most of the corpus is text. Emits source/target dims,
    scale factors (NULL when the fake width/height is 0), and the resized
    payload's length + md5.
    """
    target_bytes = target_w * target_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in it:
            if pdf.empty:
                continue
            payload = pdf["payload"]
            blen = payload.map(len)
            width = (blen % 640).astype("int32")
            height = (blen % 480).astype("int32")
            out = payload.map(lambda b: bytes(b)[:target_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": pdf["meta"].map(lambda m: m["fmt"]),
                    "width": width,
                    "height": height,
                    "target_w": np.int32(target_w),
                    "target_h": np.int32(target_h),
                    "out_len": out.map(len).astype("int64"),
                    "out_checksum": out.map(lambda b: hashlib.md5(b).hexdigest()),
                    "scale_x": (target_w / width.replace(0, np.nan)).round(4),
                    "scale_y": (target_h / height.replace(0, np.nan)).round(4),
                }
            )

    images = media.filter(F.col("meta.fmt").isin("png", "jpeg"))
    return images.mapInPandas(batches, RESIZE_SCHEMA)


DHASH_W, DHASH_H = 9, 8  # 9x8 sample grid -> 64 horizontal-difference bits
DHASH_SCHEMA = "doc_id bigint, fmt string, dhash bigint"


def dhash_fingerprints(media: DataFrame) -> DataFrame:
    """Perceptual fingerprints (dHash) for IMAGE rows: each payload is
    'decoded' by the deterministic fake (payload bytes as a grayscale
    sample stream — a real decoder plugs in at :func:`decode_image_real`),
    resampled onto a 9x8 grid at positions ``i*len//72``, and hashed as
    the 64 horizontal brightness-difference bits — the classic dHash.

    A small local edit perturbs at most one grid sample (two difference
    bits), so near-identical payloads land within a few Hamming bits;
    the format predicate is a Catalyst METADATA filter, so non-image rows
    never reach Python, and the Arrow stage emits 12 bytes/row — the
    fingerprint table that downstream banding shuffles is ~1e-5 of the
    media bytes at 100 TB.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n_samples = DHASH_W * DHASH_H
        pos = np.arange(n_samples, dtype=np.int64)
        for pdf in it:
            if pdf.empty:
                continue
            hashes = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if arr.size == 0:
                    hashes.append(0)
                    continue
                grid = arr[pos * arr.size // n_samples].reshape(DHASH_H, DHASH_W)
                bits = (grid[:, :-1].astype(np.int16) > grid[:, 1:]).ravel()
                hashes.append(
                    int.from_bytes(np.packbits(bits).tobytes(), "big", signed=True)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": pdf["meta"].map(lambda m: m["fmt"]),
                    "dhash": pd.Series(hashes, dtype="int64"),
                }
            )

    images = media.filter(F.col("meta.fmt").isin("png", "jpeg"))
    return images.mapInPandas(batches, DHASH_SCHEMA)


def dhash_sql() -> str:
    """DuckDB twin of the dHash Arrow stage (r13 flip lever): the
    synthetic payload is the UTF-8 encoding of the document text, and
    the corpus is printable ASCII (pinned in
    tests/test_training_ops.py::test_bpe_oracle_separator_boundary's
    char-inventory companion gates), so byte ``i`` of the payload IS
    ``ascii(substr(text, i+1, 1))`` and ``len(payload) == length(text)``
    — the byte-grid sampling becomes plain SQL. Bit ``k`` (row-major
    over the 8x8 difference grid) lands at int64 bit ``63-k``
    (numpy ``packbits`` big-endian, signed): bit 0 is the SIGN bit,
    emitted as the -2^63 literal (DuckDB's ``<<`` is overflow-checked
    at 63).

    Returns a WITH-extension (starts with ", ") defining
    ``dsig(doc_id, fmt, dhash)`` over a prior ``corpus`` CTE —
    image rows only (the metadata format predicate)."""
    n = DHASH_W * DHASH_H
    g = (
        "list_transform(range({n}), j -> ascii(substr(text, "
        "CAST(j * length(text) // {n} AS INTEGER) + 1, 1)))"
    ).format(n=n)
    terms = []
    for k in range(64):
        r, c = divmod(k, 8)
        a = r * DHASH_W + c
        val = "-9223372036854775808" if k == 0 else str(1 << (63 - k))
        terms.append(
            f"CASE WHEN g[{a + 1}] > g[{a + 2}] "
            f"THEN CAST({val} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    dhash = "\n         + ".join(terms)
    return f""", __dg AS MATERIALIZED (
    SELECT doc_id,
           CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' ELSE 'jpeg' END
               AS fmt,
           length(text) AS n, {g} AS g
    FROM corpus WHERE doc_id % 4 IN (0, 1)
),
dsig AS MATERIALIZED (
    SELECT doc_id, fmt,
           CASE WHEN n = 0 THEN 0 ELSE
           {dhash}
           END AS dhash
    FROM __dg
)"""


def dedup_perceptual(
    media: DataFrame,
    max_hamming: int = 3,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Perceptual near-dup image pairs: dHash fingerprints, then the
    Hamming-band LSH from the text plane (same recipe as
    ``text_dedup.simhash_pairs``): 4 bands of 16 bits — by pigeonhole a
    pair differing in at most 3 bits (= bands - 1) leaves one band
    untouched, so candidate recall is STRUCTURAL for ``max_hamming``
    <= 3; candidate generation is a bucketed equi-join on (band,
    band_value), NEVER all-pairs, and the exact ``bit_count(xor)``
    verify runs only on band collisions. (A looser radius needs more
    bands: guaranteeing distance d requires d+1 bands — don't raise
    ``max_hamming`` past bands-1 or recall silently becomes
    probabilistic, the round-9 review catch.)

    At 100 TB the banded index is 4 rows x 20 bytes per image and the
    join fan-in per bucket is bounded by band-value cardinality (2^16
    per band over a 64-bit near-uniform hash) PLUS the clone-mass cap:
    N byte-identical images share every band value, so buckets larger
    than ``max_band_bucket`` (default ``text_dedup.MAX_BAND_BUCKET``)
    are dropped before the self-join — run :func:`dedup_binary_exact`
    first, which catches byte-identical copies without decoding;
    detection never touches the payload bytes after the one fingerprint
    pass."""
    from .text_dedup import MAX_BAND_BUCKET, drop_hot_buckets

    if max_band_bucket is None:
        max_band_bucket = MAX_BAND_BUCKET
    # Checkpoint the fingerprints (12 bytes/image): without it the
    # clone-mass cap's counts branch and the pair join would EACH run
    # the Arrow decode pass — at 100 TB that is two full passes over
    # the media bytes instead of one.
    sig = dhash_fingerprints(media).select("doc_id", "dhash").localCheckpoint()
    band_exprs = [
        F.struct(
            F.lit(j).alias("band"),
            F.shiftright(F.col("dhash"), 16 * j)
            .bitwiseAND(F.lit(65535))
            .alias("v"),
        )
        for j in range(4)
    ]
    banded = sig.select(
        "doc_id", "dhash", F.explode(F.array(*band_exprs)).alias("bv")
    ).select(
        "doc_id", "dhash", F.col("bv.band").alias("band"), F.col("bv.v").alias("v")
    )
    banded = drop_hot_buckets(banded, ("band", "v"), max_band_bucket)
    a = banded.select(F.col("doc_id").alias("a"), F.col("dhash").alias("ha"), "band", "v")
    b = banded.select(F.col("doc_id").alias("b"), F.col("dhash").alias("hb"), "band", "v")
    cands = (
        a.join(b, ["band", "v"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def dedup_binary_exact(media: DataFrame) -> DataFrame:
    """Exact content dedup of media payloads — the first curation pass a
    multimodal corpus runs, and the one that must NEVER decode: the
    content hash is a Catalyst ``md5`` over the binary column, so
    detection costs one scan + one hash agg with no Python and no codec.
    Output: one row per duplicated (checksum, fmt) cluster with the kept
    doc (min id), duplicate count, and bytes reclaimable by dropping the
    copies."""
    per = media.select(
        "doc_id",
        F.md5(F.col("payload")).alias("checksum"),
        F.col("meta.fmt").alias("fmt"),
        F.length(F.col("payload")).cast("bigint").alias("byte_len"),
    )
    return (
        per.groupBy("checksum", "fmt")
        .agg(
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.max("byte_len").alias("byte_len"),
        )
        .filter(F.col("n_copies") >= 2)
        .select(
            "checksum",
            "fmt",
            "keep_doc_id",
            "n_copies",
            ((F.col("n_copies") - 1) * F.col("byte_len"))
            .cast("bigint")
            .alias("bytes_reclaimable"),
        )
    )
