"""Dataset-versioning snapshot diff — training-data op beyond the
reference surface.

A crawl pipeline re-materializes its corpus every cycle; the curation
team needs the DELTA (what appeared, vanished, or changed) without
re-reading either snapshot's payload twice. The scale-correct shape is:
hash the content FIRST (so the join payload is a 32-byte digest, not
the document), then a doc_id-co-partitioned FULL OUTER join — one
shuffle whose width is id+hash regardless of document size. At 100 TB
both snapshots arrive partitioned by doc_id (the write layout), so the
exchange is the only data movement and AQE handles any residual skew.

The "v2" snapshot here is derived deterministically from the base
documents table (drop / revise / append slices keyed on doc_id mod
primes) so the diff is oracle-checkable end-to-end; `snapshot_diff`
itself takes ANY two (doc_id, text) snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic v2 derivation slices (mirrored in the DuckDB oracle).
REMOVED_MOD = 13  # doc_id % 13 == 0 dropped in v2
CHANGED_MOD = 17  # doc_id % 17 == 0 (and not removed) revised in v2
ADDED_MOD = 19  # doc_id % 19 == 0 re-appears as a NEW doc id
ADDED_OFFSET = 10_000_000


def snapshot_v2(documents: DataFrame) -> DataFrame:
    """The simulated next-cycle corpus snapshot: same schema, with the
    removed/changed/added slices above applied."""
    did = F.col("doc_id")
    base = documents.filter(did % REMOVED_MOD != 0).select(
        "doc_id",
        F.when(
            did % CHANGED_MOD == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = documents.filter(did % ADDED_MOD == 0).select(
        (did + F.lit(ADDED_OFFSET)).alias("doc_id"),
        F.concat(F.lit("new: "), F.col("text")).alias("text"),
    )
    return base.unionByName(added)


def snapshot_diff(v1: DataFrame, v2: DataFrame) -> DataFrame:
    """Content-hash diff of two corpus snapshots: one row per doc_id whose
    membership or content changed, status in {added, removed, changed}.

    Unchanged rows are dropped BEFORE materialization — the delta is the
    product (at 100 TB the unchanged set is the overwhelming majority;
    emitting it would make the diff as large as the corpus)."""
    a = v1.select("doc_id", F.md5("text").alias("v1_hash"))
    b = v2.select("doc_id", F.md5("text").alias("v2_hash"))
    j = a.join(b, "doc_id", "full_outer")
    status = (
        F.when(F.col("v1_hash").isNull(), F.lit("added"))
        .when(F.col("v2_hash").isNull(), F.lit("removed"))
        .when(F.col("v1_hash") != F.col("v2_hash"), F.lit("changed"))
    )
    return (
        j.select("doc_id", status.alias("status"), "v1_hash", "v2_hash")
        .filter(F.col("status").isNotNull())
    )
