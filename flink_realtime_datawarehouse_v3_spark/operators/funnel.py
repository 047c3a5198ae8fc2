"""Composed curation-funnel report — the stage-by-stage accounting table
a training-data team dashboards: how many documents survive each gate of
the curation pipeline (structural rules -> quality threshold ->
decontamination -> exact dedup -> mixture sampling).

Every stage reuses the SHARED builders of the standalone operators
(text_analysis.gopher_rules / quality_score_col, text_dedup.decontaminate,
the md5 keep-min dedup, text_analysis.mixture_rates), so the funnel
cannot drift from the operators it summarizes. The corpus is touched by
ONE wide flag projection plus the two joins the semantics require (the
doc_id-keyed decon flag join and the text_hash-keyed dedup keep join —
both co-partitioned corpus-scale shuffles, whitelisted fact-fact); the
final counts collapse map-side into two 1-row aggregates stacked into
the 6-row report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text_analysis as ta
from . import text_dedup as td

STAGES = ["raw", "structural", "quality", "decontaminated", "deduped", "sampled"]


def curation_funnel(docs: DataFrame) -> DataFrame:
    c = ta.quality_counts(F.col("text"))
    r = ta.gopher_rules(c)
    score = ta.quality_score_col(c)
    structural = (
        r["word_count"] & r["mean_word_len"] & r["alpha_ratio"] & r["stopwords"]
    )
    qkeep = structural & (score >= F.lit(ta.QUALITY_GATE_MIN_SCORE))
    base = docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("text_hash"),
        structural.alias("structural"),
        qkeep.alias("qkeep"),
    )
    # Benchmark docs are absent from decontaminate()'s candidate set ->
    # the left join leaves them NULL -> they drop at the decon stage.
    decon = td.decontaminate(docs).select(
        "doc_id", (F.col("contaminated") == 0).alias("dok")
    )
    base = (
        base.join(decon, "doc_id", "left")
        .withColumn("decon_ok", F.coalesce("dok", F.lit(False)))
        .drop("dok")
    )
    # The narrow per-doc decision table feeds two consumers (the dedup
    # keep-min agg and the final conjunction agg); at 100 TB a production
    # funnel persists it as the artifact it is. Here it stays a lazy
    # plan: its recompute is two scans of a narrow projection, while a
    # localCheckpoint on this DAG costs ~20 s of RDD-conversion planning
    # (measured) — far more than it saves.
    survivor = F.col("qkeep") & F.col("decon_ok")
    keepd = (
        base.filter(survivor)
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    # The mixture policy is fit on the FULL corpus (the shipped artifact),
    # then applied to the surviving set — same posture as the live twin.
    rates = ta.mixture_rates(docs)
    full = (
        base.join(keepd, "text_hash", "left")
        .join(F.broadcast(rates), "lang", "left")
        .withColumn(
            "dedup_keep", survivor & (F.col("doc_id") == F.col("keep_id"))
        )
        .withColumn(
            "mix_keep",
            F.col("dedup_keep")
            & (
                ta.hash40(F.col("doc_id").cast("string")) % 1_000_000
                < F.col("sample_ppm")
            ),
        )
    )
    one = full.agg(
        F.count(F.lit(1)).cast("bigint").alias("s0"),
        F.sum(F.col("structural").cast("int")).cast("bigint").alias("s1"),
        F.sum(F.col("qkeep").cast("int")).cast("bigint").alias("s2"),
        F.sum(survivor.cast("int")).cast("bigint").alias("s3"),
        F.sum(F.col("dedup_keep").cast("int")).cast("bigint").alias("s4"),
        F.sum(F.col("mix_keep").cast("int")).cast("bigint").alias("s5"),
    )
    stack = ", ".join(
        f"{i}, '{name}', s{i}" for i, name in enumerate(STAGES)
    )
    return one.selectExpr(
        f"stack({len(STAGES)}, {stack}) AS (stage_idx, stage, n_docs)"
    )
