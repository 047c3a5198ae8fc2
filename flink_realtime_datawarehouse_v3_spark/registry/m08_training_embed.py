"""Training-data ops C: embeddings/IVF, timeseries, curation reports.

Split out of the monolithic api.py in round 12 — REGISTRATION ORDER
is preserved by the import order in registry/__init__.py; the
order-drift and driver-window gates (tests/test_driver_order.py)
verify it.
"""

from __future__ import annotations

from ._core import DataFrame, SparkSession, register, register_fixture  # noqa: F401
from .m03_joins import analytics_op, timeseries_op  # noqa: F401
from .m06_training_text import (  # noqa: F401
    _BM,
    _CORPUS,
    _SHINGLES_CAPPED_CTE,
    _SHINGLES_CTE,
    _SHINGLE_LIST_N,
    _STOP_EN,
    _TOKS,
    _corpus,
    _csql,
    _emb,
    _emb_corpus,
    _ngram_pairs,
    corpus_mod,
    funnel_op,
    multimodal,
    simsearch,
    snapshot_op,
    tables,
    text_analysis,
    text_dedup,
)
from .m07_training_models import _MIX_W_CASE  # noqa: F401

# Quality-aware canonical pick over exact-text clusters: keep the
# highest-quality copy per duplicated text, account tokens saved.
register(
    "dedup_cluster_keep_quality",
    lambda spark, sf: text_dedup.cluster_keep_quality(_corpus(spark, sf)),
    _csql(
        f"""SELECT text_hash,
       CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keep_doc_id,
       CAST(max(CASE WHEN rn = 1 THEN q_micro END) AS BIGINT) AS keep_q_micro,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rn > 1 THEN n_toks ELSE 0 END) AS BIGINT)
         AS tokens_saved
FROM (SELECT doc_id, text_hash, n_toks, q_micro,
             row_number() OVER (PARTITION BY text_hash
                                ORDER BY q_micro DESC, doc_id) AS rn
      FROM (SELECT doc_id, md5(text) AS text_hash,
                   CAST(len(toks) AS BIGINT) AS n_toks,
                   coalesce(CAST(round((CASE WHEN n_tokens > 0 AND n_chars > 0 THEN
                     round(0.4 * least(1.0, n_tokens / 400.0)
                           + 0.3 * (1.0 - n_punct / n_chars)
                           + 0.3 * least(1.0, (n_stop / n_tokens) * 5.0), 6)
                END) * 1e6) AS BIGINT), -1)
                     AS q_micro
            FROM (SELECT doc_id, text,
                         len({_TOKS}) AS n_tokens,
                         length(text) AS n_chars,
                         len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
                         len(list_filter({_TOKS}, t -> t IN {_STOP_EN}))
                           AS n_stop,
                         {_TOKS} AS toks
                  FROM corpus)))
GROUP BY text_hash HAVING count(*) >= 2"""
    ),
)

# IVF index health report — HASH-GREEN since r12: the coarse-quantizer
# fit is integer-exact (milli-quantized sample, int64 Lloyd steps,
# sqrt-free cross-multiplied assignment score), so the oracle REBUILDS
# the identical fit as 10 unrolled materialized CTE iterations
# (simsearch.ivf_fit_sql — the CMS trained-artifact precedent) and the
# cell counts become plain SQL. Invariants additionally pinned in pytest.
_IVF_QUANT = simsearch.IVF_QUANT_SQL.format(col="embedding")
register(
    "embedding_ivf_cell_stats",
    lambda spark, sf: simsearch.ivf_cell_stats(_emb(spark, sf)),
    f"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS embedding
             FROM embeddings),
{simsearch.ivf_fit_sql("emb")},
vv AS (SELECT vec_id, {_IVF_QUANT} AS vq FROM emb),
assigned AS (SELECT vec_id, c_id AS bucket
             FROM ({simsearch.ivf_assign_sql("vv")}) WHERE rn = 1),
per AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs
        FROM assigned GROUP BY bucket)
SELECT CAST(bucket AS BIGINT) AS cell_id, n_vecs,
       CAST(n_vecs * 1000000
            // CAST((SELECT sum(n_vecs) FROM per) AS BIGINT)
            AS BIGINT) AS share_ppm,
       CAST(trunc(n_vecs * (SELECT count(*) FROM per) * 1000000
                  / CAST((SELECT sum(n_vecs) FROM per) AS BIGINT))
            AS BIGINT) AS balance_ppm
FROM per""",
)

# Radius (range) similarity search riding the IVF probed-cell equi-join —
# HASH-GREEN since r12: the fit + assignment + probe choice are the same
# integer-exact arithmetic as the cell-stats oracle, so the one float op
# left is the reported per-pair round(cosine, 4) (the
# dedup_embedding_cosine-proven expression). Approximation is by DESIGN
# (probed cells only); recall vs the exact ball stays pinned in pytest.
register(
    "simsearch_range_search",
    lambda spark, sf: simsearch.range_search(_emb_corpus(spark, sf)),
    f"""WITH {corpus_mod.EMB_CORPUS_SQL.strip()},
{simsearch.ivf_fit_sql("emb")},
vv AS (SELECT vec_id, embedding, {_IVF_QUANT} AS vq FROM emb),
assigned AS (SELECT vec_id AS neighbor_id, embedding AS v_vec,
                    c_id AS bucket
             FROM ({simsearch.ivf_assign_sql("vv")}) WHERE rn = 1),
qv AS (SELECT vec_id AS q_id, embedding AS q_vec, vq FROM vv
       WHERE vec_id % 100 = 0),
probes AS (SELECT q_id, q_vec, c_id AS bucket
           FROM ({simsearch.ivf_assign_sql("qv", id_col="q_id")})
           WHERE rn <= {simsearch.IVF_NPROBE_DEFAULT}),
pairs AS (SELECT p.q_id, a.neighbor_id,
                 round(list_cosine_similarity(p.q_vec, a.v_vec), 4)
                     AS cosine_sim
          FROM probes p JOIN assigned a USING (bucket)
          WHERE p.q_id <> a.neighbor_id)
SELECT DISTINCT q_id, neighbor_id, cosine_sim
FROM pairs WHERE cosine_sim >= {simsearch.RANGE_TAU}""",
)

# Content-keyed held-out split: exact clones share a split by
# construction (the leakage-safe twin of corpus_train_val_test_split).
register(
    "corpus_split_leakage_safe",
    lambda spark, sf: text_analysis.leakage_safe_split(
        tables.load(spark, sf, "documents")
    ),
    f"""SELECT doc_id, text_hash, split_key,
       CASE WHEN split_key < {text_analysis.SPLIT_TEST_PPM} THEN 'test'
            WHEN split_key < {text_analysis.SPLIT_TEST_PPM
                              + text_analysis.SPLIT_VAL_PPM} THEN 'val'
            ELSE 'train' END AS split
FROM (SELECT doc_id, md5(text) AS text_hash,
             CAST(CAST(concat('0x', substr(md5(concat('split_', md5(text))), 1, 10)) AS UBIGINT) AS BIGINT) % 1000000 AS split_key
      FROM documents)""",
)

# EWMA-smoothed per-minute value series per event type: the constant-
# fanout integer form (weights = powers of two over a bounded trailing
# window; gaps decay instead of zero-filling).
register(
    "events_value_ewma",
    lambda spark, sf: analytics_op.value_ewma(
        tables.load(spark, sf, "events")
    ),
    f"""WITH base AS (
  SELECT event_type, epoch_ms(ts) // 60000 AS bucket,
         CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT)
           // count(*) AS mean_micro
  FROM events GROUP BY 1, 2),
contrib AS (
  SELECT event_type, bucket + d AS bucket,
         mean_micro * (1 << ({analytics_op.EWMA_WINDOW} - 1 - d)) AS w_val,
         (1 << ({analytics_op.EWMA_WINDOW} - 1 - d)) AS w
  FROM base, UNNEST(range(0, {analytics_op.EWMA_WINDOW})) AS t(d)),
sm AS (SELECT event_type, bucket,
              CAST(sum(w_val) AS BIGINT) AS wv, CAST(sum(w) AS BIGINT) AS ww
       FROM contrib GROUP BY 1, 2)
SELECT base.event_type, CAST(base.bucket AS BIGINT) AS bucket,
       CAST(mean_micro AS BIGINT) AS mean_micro,
       CAST(wv // ww AS BIGINT) AS ewma_micro
FROM base JOIN sm USING (event_type, bucket)""",
)

# Per-source corpus health report: docs / distinct texts / exact-dup
# ppm / token budget share — the per-domain accounting pass of a crawl
# curation pipeline. Two-level agg; the share window runs over the
# |sources|-row frame, never the corpus.
register(
    "corpus_source_stats",
    lambda spark, sf: text_analysis.source_stats(
        tables.load(spark, sf, "documents")
    ),
    f"""WITH per AS (
    SELECT source, md5(text) AS text_hash, count(*) AS c,
           CAST(sum(len({_TOKS})) AS BIGINT) AS tok_sum
    FROM documents GROUP BY 1, 2),
s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
             count(*) AS n_distinct_texts,
             CAST(sum(c) - count(*) AS BIGINT) AS n_dup_docs,
             CAST(sum(tok_sum) AS BIGINT) AS total_tokens
      FROM per GROUP BY source),
l AS (SELECT source, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      FROM documents GROUP BY source)
SELECT s.source, n_docs, n_distinct_texts, n_dup_docs,
       CAST(n_dup_docs * 1000000 // n_docs AS BIGINT) AS dup_ppm,
       total_tokens,
       CAST(CAST(total_tokens AS HUGEINT) * 1000000
            // sum(CAST(total_tokens AS HUGEINT)) OVER ()
            AS BIGINT) AS token_share_ppm,
       n_langs
FROM s JOIN l USING (source)""",
)

# Dataset-versioning snapshot diff: content-hash FULL OUTER join of two
# corpus snapshots (v2 derived deterministically from v1), emitting only
# the added/removed/changed delta. Hash-before-join: the shuffle payload
# is (doc_id, 32-byte digest) regardless of document size.
register(
    "corpus_snapshot_diff",
    lambda spark, sf: snapshot_op.snapshot_diff(
        tables.load(spark, sf, "documents").select("doc_id", "text"),
        snapshot_op.snapshot_v2(tables.load(spark, sf, "documents")),
    ),
    f"""WITH v1 AS (SELECT doc_id, md5(text) AS v1_hash FROM documents),
v2raw AS (
    SELECT doc_id,
           CASE WHEN doc_id % {snapshot_op.CHANGED_MOD} = 0
                THEN text || ' [rev2]' ELSE text END AS text
    FROM documents WHERE doc_id % {snapshot_op.REMOVED_MOD} <> 0
    UNION ALL
    SELECT doc_id + {snapshot_op.ADDED_OFFSET}, 'new: ' || text
    FROM documents WHERE doc_id % {snapshot_op.ADDED_MOD} = 0),
v2 AS (SELECT doc_id, md5(text) AS v2_hash FROM v2raw)
SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1_hash IS NULL THEN 'added'
            WHEN v2_hash IS NULL THEN 'removed'
            WHEN v1_hash <> v2_hash THEN 'changed' END AS status,
       v1_hash, v2_hash
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
WHERE v1_hash IS NULL OR v2_hash IS NULL OR v1_hash <> v2_hash""",
)

# Deterministic hash-keyed train/val/test split: membership is a pure
# salted function of doc_id — zero shuffle, stable across engines and
# reruns, independent of every other doc_id-keyed hash decision.
register(
    "corpus_train_val_test_split",
    lambda spark, sf: text_analysis.train_val_test_split(
        tables.load(spark, sf, "documents")
    ),
    f"""SELECT doc_id, lang, split_key,
       CASE WHEN split_key < {text_analysis.SPLIT_TEST_PPM} THEN 'test'
            WHEN split_key < {text_analysis.SPLIT_TEST_PPM
                              + text_analysis.SPLIT_VAL_PPM} THEN 'val'
            ELSE 'train' END AS split
FROM (SELECT doc_id, lang,
             {text_analysis.hash40_sql(
                 "concat('split_', CAST(doc_id AS VARCHAR))")} % 1000000
                 AS split_key
      FROM documents)""",
)

# Per-label embedding-health report: min/mean/max squared L2 norm in
# integer micro-units — the pre-indexing drift/outlier check.
register(
    "embedding_norm_stats",
    lambda spark, sf: simsearch.norm_stats(_emb(spark, sf)),
    """SELECT label, count(*) AS n_vecs,
       min(n2u) AS min_norm2_micro,
       max(n2u) AS max_norm2_micro,
       CAST(CAST(sum(n2u) AS BIGINT) // count(*) AS BIGINT)
           AS mean_norm2_micro
FROM (SELECT label,
             CAST(round(list_sum(list_transform(embedding::DOUBLE[],
                                                x -> x * x)) * 1e6)
                  AS BIGINT) AS n2u
      FROM embeddings)
GROUP BY label""",
)

# Composed curation-funnel report: per-stage survivor counts through
# structural rules -> quality threshold -> decontamination -> exact
# dedup -> mixture sampling, every stage via the SHARED builders of the
# standalone operators (the funnel cannot drift from what it reports).
register(
    "corpus_curation_funnel",
    lambda spark, sf: funnel_op.curation_funnel(
        tables.load(spark, sf, "documents")
    ),
    f"""WITH cnt AS (
    SELECT doc_id, lang, md5(text) AS text_hash,
           len({_TOKS}) AS n_words,
           length(text) AS n_chars,
           coalesce(list_sum(list_transform({_TOKS}, x -> length(x))), 0)
               AS n_word_chars,
           len(list_filter({_TOKS}, x -> regexp_matches(x, '^[a-z]+$')))
               AS n_alpha,
           len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
           len(list_filter({_TOKS}, t -> t IN {_STOP_EN})) AS n_stop
    FROM documents),
flags AS (
    SELECT doc_id, lang, text_hash,
           (n_words >= {text_analysis.GOPHER_MIN_WORDS}
            AND n_words <= {text_analysis.GOPHER_MAX_WORDS}
            AND n_word_chars >= 3 * n_words
            AND n_word_chars <= 10 * n_words
            AND 5 * n_alpha >= 4 * n_words
            AND n_stop >= 2) AS structural,
           CASE WHEN n_words > 0 AND n_chars > 0 THEN
                round(0.4 * least(1.0, n_words / 400.0)
                      + 0.3 * (1.0 - n_punct / n_chars)
                      + 0.3 * least(1.0, (n_stop / n_words) * 5.0), 6)
           END AS score
    FROM cnt),
base0 AS (
    SELECT f.*,
           (f.structural AND f.score >= {text_analysis.QUALITY_GATE_MIN_SCORE!r})
               AS qkeep
    FROM flags f),
shn AS (SELECT doc_id, UNNEST(list_distinct({_SHINGLE_LIST_N})) AS shingle
        FROM documents),
bench AS (SELECT DISTINCT shingle FROM shn
          WHERE doc_id % {_BM} = 0 AND doc_id < 1000000),
hits AS (SELECT s.doc_id, count(*) AS n_overlap
         FROM shn s JOIN bench b USING (shingle)
         WHERE NOT (s.doc_id % {_BM} = 0 AND s.doc_id < 1000000)
         GROUP BY 1),
base AS (
    SELECT b0.*,
           (NOT (b0.doc_id % {_BM} = 0 AND b0.doc_id < 1000000))
               AND coalesce(h.n_overlap, 0) = 0 AS decon_ok
    FROM base0 b0 LEFT JOIN hits h USING (doc_id)),
surv3 AS (SELECT * FROM base WHERE qkeep AND decon_ok),
keepd AS (SELECT text_hash, min(doc_id) AS keep_id FROM surv3 GROUP BY 1),
st4 AS (SELECT s.*, (s.doc_id = k.keep_id) AS dedup_keep
        FROM surv3 s JOIN keepd k USING (text_hash)),
per AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS chars_s,
               {_MIX_W_CASE} AS w
        FROM documents GROUP BY lang),
bdg AS (SELECT min(chars_s * 10 // w) AS budget FROM per),
rates AS (SELECT lang, (w * budget // 10) * 1000000 // chars_s AS sample_ppm
          FROM per, bdg),
st5 AS (SELECT st4.*,
               ({text_analysis.hash40_sql("CAST(doc_id AS VARCHAR)")} % 1000000
                < r.sample_ppm) AS mix_keep
        FROM st4 JOIN rates r USING (lang)),
a1 AS (SELECT CAST(count(*) AS BIGINT) AS c0,
              CAST(sum(CASE WHEN structural THEN 1 ELSE 0 END) AS BIGINT) AS c1,
              CAST(sum(CASE WHEN qkeep THEN 1 ELSE 0 END) AS BIGINT) AS c2,
              CAST(sum(CASE WHEN qkeep AND decon_ok THEN 1 ELSE 0 END)
                   AS BIGINT) AS c3
       FROM base),
a2 AS (SELECT CAST(sum(CASE WHEN dedup_keep THEN 1 ELSE 0 END) AS BIGINT) AS c4,
              CAST(sum(CASE WHEN dedup_keep AND mix_keep THEN 1 ELSE 0 END)
                   AS BIGINT) AS c5
       FROM st5)
SELECT 0 AS stage_idx, 'raw' AS stage, c0 AS n_docs FROM a1
UNION ALL SELECT 1, 'structural', c1 FROM a1
UNION ALL SELECT 2, 'quality', c2 FROM a1
UNION ALL SELECT 3, 'decontaminated', c3 FROM a1
UNION ALL SELECT 4, 'deduped', c4 FROM a2
UNION ALL SELECT 5, 'sampled', c5 FROM a2""",
)

# Growth accounting over events: per-day new users + cumulative total —
# first-seen agg (user_id shuffle), day counts, then the running sum
# over the |days|-row frame only.
register(
    "events_new_users_daily",
    lambda spark, sf: analytics_op.new_users_daily(
        tables.load(spark, sf, "events")
    ),
    """WITH fst AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
             FROM events GROUP BY user_id),
daily AS (SELECT d0, count(*) AS n_new FROM fst GROUP BY d0)
SELECT strftime(d0, '%Y-%m-%d') AS dt,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(sum(n_new) OVER (ORDER BY d0
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_users
FROM daily""",
)

# Robust (median/MAD) anomaly twin of the z-score entry: two exact
# percentile passes broadcast back as |event_types|-row artifacts.
register(
    "events_value_mad_anomalies",
    lambda spark, sf: analytics_op.value_mad_anomalies(
        tables.load(spark, sf, "events")
    ),
    f"""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
             FROM events GROUP BY 1),
mad AS (SELECT e.event_type,
               quantile_cont(abs(e.value - m.med), 0.5) AS mad,
               any_value(m.med) AS med
        FROM events e JOIN med m USING (event_type) GROUP BY 1),
st AS (SELECT event_type, med, mad FROM mad WHERE mad > 0)
SELECT e.event_id, e.event_type, e.value,
       round((e.value - st.med) / ({analytics_op.MAD_SCALE!r} * st.mad), 6)
           AS robust_z
FROM events e JOIN st USING (event_type)
WHERE abs(round((e.value - st.med) / ({analytics_op.MAD_SCALE!r} * st.mad), 6))
      > {analytics_op.MAD_THRESHOLD!r}""",
)

# User-path mining: top-k event-type transitions within the session gap
# (Markov edge counts) — one lead() window pass + hash agg + top-k.
register(
    "events_path_transitions_topk",
    lambda spark, sf: analytics_op.path_transitions_topk(
        tables.load(spark, sf, "events")
    ),
    f"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type
            FROM events),
t AS (SELECT event_type AS from_type,
             lead(event_type) OVER w AS to_type,
             lead(ts_ms) OVER w - ts_ms AS gap_ms
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
c AS (SELECT from_type, to_type, count(*) AS n FROM t
      WHERE to_type IS NOT NULL
        AND gap_ms <= {analytics_op.TRANSITION_GAP_MS} GROUP BY 1, 2)
SELECT from_type, to_type, n,
       row_number() OVER (ORDER BY n DESC, from_type, to_type) AS rank
FROM c QUALIFY rank <= 20""",
)

# Multi-benchmark decontamination: every held-out eval set screened in
# ONE candidate explode (a per-benchmark rescan is the naive trap); the
# tagged shingle union rides as one broadcast, per-bench columns via a
# fixed-value pivot.
register(
    "corpus_multi_bench_decontaminate",
    lambda spark, sf: text_dedup.decontaminate_multi(
        tables.load(spark, sf, "documents")
    ),
    f"""WITH shn AS (SELECT doc_id, UNNEST(list_distinct({_SHINGLE_LIST_N}))
                AS shingle FROM documents),
tagged AS (
    SELECT DISTINCT shingle, 'b97' AS bench FROM shn
    WHERE doc_id % 97 = 0 AND doc_id < 1000000
    UNION ALL
    SELECT DISTINCT shingle, 'b89' AS bench FROM shn
    WHERE doc_id % 89 = 0 AND doc_id < 1000000),
cand AS (SELECT doc_id FROM documents
         WHERE NOT ((doc_id % 97 = 0 OR doc_id % 89 = 0)
                    AND doc_id < 1000000)),
hits AS (SELECT s.doc_id,
                CAST(sum(CASE WHEN bench = 'b97' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n97,
                CAST(sum(CASE WHEN bench = 'b89' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n89
         FROM shn s JOIN tagged t USING (shingle)
         WHERE NOT ((s.doc_id % 97 = 0 OR s.doc_id % 89 = 0)
                    AND s.doc_id < 1000000)
         GROUP BY 1)
SELECT c.doc_id,
       coalesce(n97, 0) AS n_overlap_b97,
       coalesce(n89, 0) AS n_overlap_b89,
       CAST(coalesce(n97, 0) > 0 OR coalesce(n89, 0) > 0 AS INT)
           AS contaminated_any
FROM cand c LEFT JOIN hits USING (doc_id)""",
)

# Language-ID calibration: (true lang, predicted lang) confusion matrix
# with per-truth ppm shares — zero joins, truth and prediction in the
# same row.
register(
    "text_lang_confusion",
    lambda spark, sf: text_analysis.lang_confusion(
        tables.load(spark, sf, "documents")
    ),
    f"""WITH p AS (
    SELECT lang,
           CASE WHEN greatest(se, sd, sf2) <= 0 THEN 'und'
                WHEN se = greatest(se, sd, sf2) THEN 'en'
                WHEN sd = greatest(se, sd, sf2) THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM (SELECT lang,
                 len(list_filter({_TOKS}, t -> t IN {_STOP_EN}))
                     / len({_TOKS}) AS se,
                 len(list_filter({_TOKS},
                     t -> t IN ('der','die','das','und','ist')))
                     / len({_TOKS}) AS sd,
                 len(list_filter({_TOKS},
                     t -> t IN ('le','la','et','les','des')))
                     / len({_TOKS}) AS sf2
          FROM documents)),
m AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY 1, 2)
SELECT lang, lang_pred, n,
       CAST(n * 1000000 // sum(n) OVER (PARTITION BY lang) AS BIGINT)
           AS share_ppm
FROM m""",
)

# Per-source contamination rollup: which crawl sources carry benchmark
# overlap — the actionable slice (drop a source, not a doc).
register(
    "corpus_contamination_by_source",
    lambda spark, sf: text_dedup.contamination_by_source(
        tables.load(spark, sf, "documents")
    ),
    f"""WITH shn AS (SELECT doc_id, UNNEST(list_distinct({_SHINGLE_LIST_N}))
                AS shingle FROM documents),
bench AS (SELECT DISTINCT shingle FROM shn
          WHERE doc_id % {_BM} = 0 AND doc_id < 1000000),
hits AS (SELECT s.doc_id, count(*) AS n_overlap
         FROM shn s JOIN bench b USING (shingle)
         WHERE NOT (s.doc_id % {_BM} = 0 AND s.doc_id < 1000000)
         GROUP BY 1),
per AS (SELECT d.source, coalesce(h.n_overlap, 0) AS n_overlap
        FROM (SELECT doc_id, source FROM documents
              WHERE NOT (doc_id % {_BM} = 0 AND doc_id < 1000000)) d
        LEFT JOIN hits h USING (doc_id))
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_overlap > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated,
       CAST(CAST(sum(CASE WHEN n_overlap > 0 THEN 1 ELSE 0 END) AS BIGINT)
            * 1000000 // count(*) AS BIGINT) AS contaminated_ppm,
       CAST(sum(n_overlap) AS BIGINT) AS total_overlaps
FROM per GROUP BY source""",
)

# Rolling 7-day active users: exact sliding-window distinct WITHOUT a
# range-frame distinct or a day x day self-join — each (user, day) pair
# fans out to the <=7 report days it supports (constant fan-out), then
# one count-distinct per day.
register(
    "events_rolling_wau",
    lambda spark, sf: analytics_op.rolling_wau(
        tables.load(spark, sf, "events")
    ),
    f"""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
              FROM events),
bounds AS (SELECT CAST(min(ts) AS DATE) AS d_min,
                  CAST(max(ts) AS DATE) AS d_max FROM events),
fan AS (SELECT user_id, d + CAST(o AS INT) AS report_d
        FROM days, UNNEST(range({analytics_op.WAU_WINDOW_DAYS})) AS t(o)),
wau AS (SELECT report_d, count(DISTINCT user_id) AS wau
        FROM fan GROUP BY 1)
SELECT strftime(report_d, '%Y-%m-%d') AS dt, CAST(wau AS BIGINT) AS wau
FROM wau, bounds
WHERE report_d >= d_min AND report_d <= d_max""",
)

# Hypertable gap filling with LOCF: dense per-(type, minute) spine from
# a bounds agg (never the raw events), missing buckets materialized,
# last observed mean carried forward by one per-series window pass.
register(
    "events_timeseries_gapfill",
    lambda spark, sf: timeseries_op.gap_fill_locf(
        tables.load(spark, sf, "events")
    ),
    f"""WITH obs AS (
    SELECT event_type,
           (epoch_ms(ts) // {timeseries_op.BUCKET_MS}) * {timeseries_op.BUCKET_MS}
               AS bucket_ms,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) / count(*) AS DOUBLE),
                 6) AS mean_value
    FROM events GROUP BY 1, 2),
bounds AS (SELECT event_type, min(bucket_ms) AS lo, max(bucket_ms) AS hi
           FROM obs GROUP BY 1),
spine AS (SELECT event_type, UNNEST(range(lo, hi + 1, {timeseries_op.BUCKET_MS}))
              AS bucket_ms
          FROM bounds)
SELECT s.event_type, s.bucket_ms,
       coalesce(o.n_events, 0) AS n_events,
       last_value(o.mean_value IGNORE NULLS) OVER (
           PARTITION BY s.event_type ORDER BY s.bucket_ms
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value,
       CAST(o.n_events IS NULL AS INT) AS is_gap
FROM spine s LEFT JOIN obs o USING (event_type, bucket_ms)""",
)

# PCA projection: fit on the bounded deterministic vec_id-ordered
# sample (same FAISS posture as the IVF/PQ quantizers), 64x64 eigh on
# the driver, projection as one Catalyst literal pass. Rows-only
# (eigen-decomposition is not single-query SQL); gated by the
# variance-dominance pytest.
register(
    "embedding_pca_project",
    lambda spark, sf: simsearch.pca_project(_emb(spark, sf)),
)

# Per-doc Shannon character entropy (garbage/randomness detector):
# exact counts -> ln on identical integers -> micro-nat round, the LM
# convention.
register(
    "text_char_entropy",
    lambda spark, sf: text_analysis.char_entropy(
        tables.load(spark, sf, "documents")
    ),
    """WITH ch AS (
    SELECT doc_id, UNNEST(list_filter(string_split(text, ''), c -> c <> ''))
        AS ch
    FROM documents),
cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_chars,
       CAST(count(*) AS BIGINT) AS n_distinct_chars,
       CAST(round((ln(CAST(sum(c) AS BIGINT))
                   - sum(c * ln(c)) / CAST(sum(c) AS BIGINT)) * 1e6)
            AS BIGINT) AS entropy_micro_nats
FROM cnt GROUP BY doc_id""",
)

# Conversion latency: first view -> first purchase at-or-after it, exact
# min/median/max over the converter set (percentile == quantile_cont).
register(
    "events_time_to_convert",
    lambda spark, sf: analytics_op.time_to_convert(
        tables.load(spark, sf, "events")
    ),
    """WITH v AS (SELECT user_id, min(ts) AS first_view FROM events
           WHERE event_type = 'view' GROUP BY 1),
conv AS (SELECT v.user_id,
                min(epoch_ms(p.ts) - epoch_ms(v.first_view)) AS ms
         FROM v JOIN events p USING (user_id)
         WHERE p.event_type = 'purchase' AND p.ts >= v.first_view
         GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_converters,
       CAST(min(ms) AS BIGINT) AS min_ms,
       round(quantile_cont(ms, 0.5), 6) AS median_ms,
       CAST(max(ms) AS BIGINT) AS max_ms
FROM conv""",
)

# Curation audit: per-source reject_reason histogram from the SAME
# single-projection rule builders as corpus_quality_gate.
register(
    "corpus_quality_reasons_by_source",
    lambda spark, sf: text_analysis.quality_reasons_by_source(
        tables.load(spark, sf, "documents")
    ),
    f"""WITH g AS (
    SELECT source,
           CASE
             WHEN NOT (n_words >= {text_analysis.GOPHER_MIN_WORDS}
                       AND n_words <= {text_analysis.GOPHER_MAX_WORDS})
               THEN 'word_count'
             WHEN NOT (n_word_chars >= 3 * n_words
                       AND n_word_chars <= 10 * n_words)
               THEN 'mean_word_len'
             WHEN NOT (5 * n_alpha >= 4 * n_words) THEN 'alpha_ratio'
             WHEN NOT (n_stop >= 2) THEN 'stopwords'
             WHEN quality_score < {text_analysis.QUALITY_GATE_MIN_SCORE!r}
               THEN 'low_quality'
             ELSE 'kept'
           END AS reason
    FROM (SELECT source, n_words, n_word_chars, n_alpha, n_stop,
                 CASE WHEN n_words > 0 AND n_chars > 0 THEN
                 round(0.4 * least(1.0, n_words / 400.0)
                       + 0.3 * (1.0 - n_punct / n_chars)
                       + 0.3 * least(1.0, (n_stop / n_words) * 5.0), 6)
                 END AS quality_score
          FROM (SELECT source,
                       len({_TOKS}) AS n_words,
                       length(text) AS n_chars,
                       coalesce(list_sum(list_transform({_TOKS},
                           x -> length(x))), 0) AS n_word_chars,
                       len(list_filter({_TOKS},
                           x -> regexp_matches(x, '^[a-z]+$'))) AS n_alpha,
                       len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
                       len(list_filter({_TOKS}, t -> t IN {_STOP_EN}))
                           AS n_stop
                FROM documents))),
m AS (SELECT source, reason, CAST(count(*) AS BIGINT) AS n
      FROM g GROUP BY 1, 2)
SELECT source, reason, n,
       CAST(n * 1000000 // sum(n) OVER (PARTITION BY source) AS BIGINT)
           AS share_ppm
FROM m""",
)

# PageRank over the near-dup pair graph: 10 fixed power-method steps in
# exact integer micro-units (rank DIV degree contributions), so Spark's
# iterative joins and the oracle's recursive CTE agree bit-for-bit —
# iterative-algorithm coverage beyond the CC closure.
register(
    "graph_pagerank_neardup",
    lambda spark, sf: text_dedup.pagerank_neardup(
        _corpus(spark, sf), _ngram_pairs(spark, sf)
    ),
    f"""WITH RECURSIVE {_CORPUS}, {_SHINGLES_CTE}, {_SHINGLES_CAPPED_CTE},
edges AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM exact_pairs_capped
    UNION
    SELECT b AS src, a AS dst FROM exact_pairs_capped
),
deg AS MATERIALIZED (SELECT src AS v, count(*) AS deg FROM edges GROUP BY src),
pr(iter, v, deg, rank) AS (
    SELECT 0, v, deg, CAST({text_dedup.PAGERANK_MICRO} AS BIGINT) FROM deg
    UNION ALL
    SELECT x.iter + 1, x.dst, dd.deg,
           CAST({15 * text_dedup.PAGERANK_MICRO // 100}
                + ({text_dedup.PAGERANK_D85} * x.in_sum) // 100 AS BIGINT)
    FROM (SELECT p.iter AS iter, e.dst AS dst,
                 sum(p.rank // p.deg) AS in_sum
          FROM pr p JOIN edges e ON e.src = p.v
          WHERE p.iter < {text_dedup.PAGERANK_ITERS}
          GROUP BY 1, 2) x
    JOIN deg dd ON dd.v = x.dst
)
SELECT v AS doc_id, rank AS rank_micro
FROM pr WHERE iter = {text_dedup.PAGERANK_ITERS}""",
)

# The pipeline's PRODUCT query: the final kept training set — language +
# quality clean with exact-dedup keep (corpus_clean), near-dup cluster
# canonical (large-star/small-star closure over the capped pair set),
# and benchmark-decontaminated — every stage individually proven, here
# composed end-to-end the way a corpus build actually ships.
def _corpus_materialize(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    clean = text_analysis.corpus_clean(_corpus(spark, sf))
    keepers = (
        text_dedup.dedup_clusters(_corpus(spark, sf), _ngram_pairs(spark, sf))
        .filter(F.col("keep") == 1)
        .select("doc_id")
    )
    not_contaminated = (
        text_dedup.decontaminate(_corpus(spark, sf))
        .filter(F.col("contaminated") == 0)
        .select("doc_id")
    )
    return clean.join(keepers, "doc_id").join(not_contaminated, "doc_id").select(
        "doc_id", "n_tokens", "quality_score"
    )


register(
    "corpus_materialize_final",
    _corpus_materialize,
    f"""WITH RECURSIVE {_CORPUS}, {_SHINGLES_CTE}, {_SHINGLES_CAPPED_CTE},
edges AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM exact_pairs_capped
    UNION ALL
    SELECT b AS src, a AS dst FROM exact_pairs_capped
),
reach(v, l) AS (
    SELECT doc_id, doc_id FROM corpus
    UNION
    SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.v
),
keepers AS (SELECT v AS doc_id FROM reach GROUP BY v HAVING v = min(l)),
shn AS (
    SELECT doc_id, UNNEST(list_distinct({_SHINGLE_LIST_N})) AS shingle
    FROM corpus
),
bench AS (
    SELECT DISTINCT shingle FROM shn
    WHERE doc_id % {_BM} = 0 AND doc_id < 1000000
),
not_contaminated AS (
    SELECT c.doc_id FROM corpus c
    WHERE NOT (c.doc_id % {_BM} = 0 AND c.doc_id < 1000000)
      AND NOT EXISTS (SELECT 1 FROM shn s JOIN bench b USING (shingle)
                      WHERE s.doc_id = c.doc_id)
),
clean AS (
    SELECT doc_id, n_tokens, quality_score
    FROM (SELECT *,
                 row_number() OVER (PARTITION BY text_hash
                                    ORDER BY doc_id) AS rn
          FROM (SELECT doc_id, n_tokens,
                       round(0.4 * least(1.0, n_tokens / 400.0)
                             + 0.3 * (1.0 - n_punct / n_chars)
                             + 0.3 * least(1.0, se * 5.0), 6)
                           AS quality_score,
                       CASE WHEN greatest(se, sd, sf2) <= 0 THEN 'und'
                            WHEN se = greatest(se, sd, sf2) THEN 'en'
                            WHEN sd = greatest(se, sd, sf2) THEN 'de'
                            ELSE 'fr' END AS lang_pred,
                       md5(text) AS text_hash
                FROM (SELECT doc_id, text,
                             len({_TOKS}) AS n_tokens,
                             length(text) AS n_chars,
                             len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
                             len(list_filter({_TOKS}, t -> t IN {_STOP_EN})) / len({_TOKS}) AS se,
                             len(list_filter({_TOKS}, t -> t IN ('der','die','das','und','ist'))) / len({_TOKS}) AS sd,
                             len(list_filter({_TOKS}, t -> t IN ('le','la','et','les','des'))) / len({_TOKS}) AS sf2
                      FROM corpus))
          WHERE lang_pred = 'en' AND quality_score >= 0.45)
    WHERE rn = 1
)
SELECT c.doc_id, c.n_tokens, c.quality_score
FROM clean c
JOIN keepers k USING (doc_id)
JOIN not_contaminated nc USING (doc_id)""",
)

# Bloom-filter twin of decontaminate_ngram: the membership test when the
# benchmark shingle set outgrows a broadcast. HASH-GREEN since r12: bit
# positions are disjoint 20-bit md5 hex slices (text_dedup._bloom_pos),
# so the oracle rebuilds the IDENTICAL filter words and probes them with
# the same all-k test — the driver value-hashes the filter itself. The
# no-false-negative + FP-bound gate stays in
# tests/test_training_ops.py::test_decontaminate_bloom.
_BLOOM_POS_LIST = ", ".join(
    text_dedup._bloom_pos_sql(i) for i in range(text_dedup.BLOOM_K)
)
# Bit 63 needs the sign-bit literal: DuckDB's << is overflow-CHECKED
# where Java's shiftleft(1L, 63) wraps to Long.MIN_VALUE.
_BLOOM_BIT = (
    "CASE WHEN {p} % 64 = 63 THEN CAST(-9223372036854775808 AS BIGINT) "
    "ELSE (CAST(1 AS BIGINT) << CAST({p} % 64 AS INT)) END"
)
register(
    "decontaminate_bloom",
    lambda spark, sf: text_dedup.decontaminate_bloom(_corpus(spark, sf)),
    f"""WITH {_CORPUS},
shn AS (
    SELECT doc_id, UNNEST(list_distinct({_SHINGLE_LIST_N})) AS shingle
    FROM corpus
),
bpos AS (
    SELECT DISTINCT UNNEST([{_BLOOM_POS_LIST}]) AS pos
    FROM (SELECT DISTINCT shingle FROM shn
          WHERE doc_id % {_BM} = 0 AND doc_id < 1000000)
),
words AS (
    SELECT pos // 64 AS word,
           bit_or({_BLOOM_BIT.format(p="pos")}) AS mask
    FROM bpos GROUP BY 1
),
csh AS (
    SELECT doc_id, shingle, UNNEST([{_BLOOM_POS_LIST}]) AS pos
    FROM shn WHERE NOT (doc_id % {_BM} = 0 AND doc_id < 1000000)
),
hitsh AS (
    SELECT c.doc_id, c.shingle
    FROM csh c JOIN words w
      ON c.pos // 64 = w.word
     AND (w.mask & ({_BLOOM_BIT.format(p="c.pos")})) <> 0
    GROUP BY c.doc_id, c.shingle
    HAVING count(*) = {text_dedup.BLOOM_K}
),
hits AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bloom_hits
    FROM hitsh GROUP BY 1
)
SELECT c.doc_id, coalesce(h.n_bloom_hits, 0) AS n_bloom_hits,
       CAST(coalesce(h.n_bloom_hits, 0) > 0 AS INT) AS contaminated
FROM (SELECT doc_id FROM corpus
      WHERE NOT (doc_id % {_BM} = 0 AND doc_id < 1000000)) c
LEFT JOIN hits h USING (doc_id)""",
)

# Corpus-mix report over the raw documents table: ONE ROLLUP pass over
# (source, lang) with GROUPING-bit level semantics identical to DuckDB.
register(
    "corpus_mix_report",
    lambda spark, sf: text_analysis.corpus_mix_report(
        tables.load(spark, sf, "documents")
    ),
    """SELECT source, lang, GROUPING(source, lang) AS level,
              count(*) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS total_chars,
              round(sum(n_chars) / count(*), 6) AS mean_chars
       FROM documents GROUP BY ROLLUP(source, lang)""",
)

# Pivoted corpus mix: wide-format per-source language counts (explicit
# pivot value list -> ONE conditional-count hash agg, no discovery scan).
register(
    "corpus_lang_pivot",
    lambda spark, sf: text_analysis.lang_source_pivot(
        tables.load(spark, sf, "documents")
    ),
    """SELECT source,
              CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
              CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
              CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
              CAST(sum(CASE WHEN lang = 'und' THEN 1 ELSE 0 END) AS BIGINT) AS n_und
       FROM documents GROUP BY source""",
)

# The inverse reshaping: melt the wide pivot back to long form (stack).
register(
    "corpus_lang_unpivot",
    lambda spark, sf: text_analysis.lang_pivot_unpivot(
        tables.load(spark, sf, "documents")
    ),
    """       SELECT source, 'en' AS lang,
              CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
       FROM documents GROUP BY source
       UNION ALL
       SELECT source, 'de' AS lang,
              CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
       FROM documents GROUP BY source
       UNION ALL
       SELECT source, 'fr' AS lang,
              CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
       FROM documents GROUP BY source
       UNION ALL
       SELECT source, 'und' AS lang,
              CAST(sum(CASE WHEN lang = 'und' THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
       FROM documents GROUP BY source""",
)

# Gopher-style repetition quality signals (Rae et al. 2021): top-2-gram
# occupancy and duplicated-3-gram fraction per doc — the repetition gate a
# pretraining corpus pipeline runs before mixing.
register(
    "text_repetition_stats",
    lambda spark, sf: text_analysis.repetition_stats(_corpus(spark, sf)),
    f"""WITH {_CORPUS},
toks AS (SELECT doc_id, {_TOKS} AS t FROM corpus),
grams AS (
    SELECT doc_id, 2 AS n,
           UNNEST(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                                 i -> t[i] || ' ' || t[i + 1])) AS g
    FROM toks WHERE len(t) >= 2
    UNION ALL
    SELECT doc_id, 3,
           UNNEST(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                                 i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
    FROM toks WHERE len(t) >= 3
),
counts AS (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY 1, 2, 3)
SELECT doc_id,
       CAST(sum(CASE WHEN n = 2 THEN c END) AS BIGINT) AS n_bigrams,
       max(CASE WHEN n = 2 THEN c END) AS top_bigram_count,
       round(max(CASE WHEN n = 2 THEN c END)
             / sum(CASE WHEN n = 2 THEN c END), 6) AS top_bigram_frac,
       round(coalesce(sum(CASE WHEN n = 3 AND c > 1 THEN c END), 0)
             / sum(CASE WHEN n = 3 THEN c END), 6) AS dup_trigram_frac
FROM counts GROUP BY doc_id""",
)

# Vocabulary build: k most frequent tokens with total + document
# frequencies; (count DESC, token) is a total order so the LIMIT is stable.
register(
    "text_vocab_topk",
    lambda spark, sf: text_analysis.vocab_topk(_corpus(spark, sf)),
    _csql(
        f"""SELECT token, count(*) AS total_count,
                   count(DISTINCT doc_id) AS doc_count
            FROM (SELECT doc_id, UNNEST({_TOKS}) AS token FROM corpus)
            GROUP BY token ORDER BY total_count DESC, token LIMIT 200"""
    ),
)

# Per-doc top-3 keywords by tf-idf; both engines rank on the 6-decimal
# rounded score with a token tie-break, so the cut is float-drift-proof.
register(
    "text_tfidf_topk",
    lambda spark, sf: text_analysis.tfidf_topk(_corpus(spark, sf)),
    f"""WITH {_CORPUS},
tok AS (SELECT doc_id, UNNEST({_TOKS}) AS token FROM corpus),
tc AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
tcn AS (SELECT *, sum(c) OVER (PARTITION BY doc_id) AS n_tok FROM tc),
dfc AS (SELECT token, count(*) AS df FROM tc GROUP BY token),
nd AS (SELECT count(*) AS n_docs FROM corpus),
scored AS (
    SELECT doc_id, token, round((c / n_tok) * ln(n_docs / df), 6) AS tfidf
    FROM tcn JOIN dfc USING (token) CROSS JOIN nd)
SELECT doc_id, token, rank, tfidf FROM (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
    FROM scored) WHERE rank <= 3""",
)

# CCNet-style unigram LM quality signal: mean token log-prob under the
# corpus's own unigram distribution. Per-token ln(p) is quantized to
# integer micro-nats BEFORE the per-doc sum, so the accumulation is exact
# integer arithmetic (float-sum order can't drift the hash).
register(
    "text_unigram_lm_score",
    lambda spark, sf: text_analysis.unigram_lm_score(_corpus(spark, sf)),
    f"""WITH {_CORPUS},
tok AS (SELECT doc_id, UNNEST({_TOKS}) AS token FROM corpus),
tc AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
tot AS (SELECT count(*) AS n_total FROM tok),
lp AS (SELECT token, CAST(round(ln(count(*) / (SELECT n_total FROM tot)) * 1e6)
                          AS BIGINT) AS logp_micro
       FROM tok GROUP BY token)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       round(CAST(sum(c * logp_micro) AS DOUBLE) / sum(c) / 1e6, 6) AS mean_logp
FROM tc JOIN lp USING (token) GROUP BY doc_id""",
)

# Bigram LM scoring: mean conditional ln P(w2|w1) per doc in exact
# integer micro-nats (the CCNet rung above the unigram form).
register(
    "text_bigram_lm_score",
    lambda spark, sf: text_analysis.bigram_lm_score(_corpus(spark, sf)),
    f"""WITH {_CORPUS},
toks AS (SELECT doc_id, {_TOKS} AS t FROM corpus),
pairs AS (
    SELECT doc_id,
           UNNEST(list_transform(generate_series(1, len(t) - 1),
                                 i -> struct_pack(a := t[i], b := t[i + 1]))) AS p
    FROM toks WHERE len(t) >= 2),
ab AS (SELECT p.a AS a, p.b AS b, count(*) AS c_ab FROM pairs GROUP BY 1, 2),
ca AS (SELECT p.a AS a, count(*) AS c_a FROM pairs GROUP BY 1),
lp AS (SELECT ab.a, ab.b,
              CAST(round(ln(c_ab / c_a) * 1e6) AS BIGINT) AS logp_micro
       FROM ab JOIN ca USING (a)),
dc AS (SELECT doc_id, p.a AS a, p.b AS b, count(*) AS c
       FROM pairs GROUP BY 1, 2, 3)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       round(CAST(sum(c * logp_micro) AS DOUBLE) / sum(c) / 1e6, 6) AS mean_logp
FROM dc JOIN lp USING (a, b) GROUP BY doc_id""",
)

# Collocation mining: top-50 adjacent pairs by PMI (ranked on the
# 6-decimal rounded score with (a, b) tie-breaks — a total cut).
register(
    "text_bigram_pmi_topk",
    lambda spark, sf: text_analysis.bigram_pmi_topk(_corpus(spark, sf)),
    f"""WITH {_CORPUS},
toks AS (SELECT doc_id, {_TOKS} AS t FROM corpus),
pairs AS (
    SELECT UNNEST(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                                 i -> struct_pack(a := t[i], b := t[i + 1]))) AS p
    FROM toks WHERE len(t) >= 2),
ab AS (SELECT p.a AS a, p.b AS b, count(*) AS c_ab FROM pairs GROUP BY 1, 2),
ct AS (SELECT t, count(*) AS c_t FROM (
           SELECT p.a AS t FROM pairs UNION ALL SELECT p.b FROM pairs)
       GROUP BY t),
n AS (SELECT count(*) AS n_pairs FROM pairs)
SELECT a, b, c_ab,
       round(ln(c_ab * 4.0 * (SELECT n_pairs FROM n)
                / (ca.c_t * cb.c_t)), 6) AS pmi
FROM ab JOIN ct ca ON ab.a = ca.t JOIN ct cb ON ab.b = cb.t
WHERE c_ab >= 5
ORDER BY pmi DESC, a, b LIMIT 50""",
)

# Rank-based quality filter: top 60% by quality WITHIN each language
# (budget-driven corpus cut; percent_rank with a doc_id tie-break so the
# kept set is total and engine-independent).
register(
    "text_quality_top_fraction",
    lambda spark, sf: text_analysis.quality_top_fraction(_corpus(spark, sf)),
    _csql(
        f"""SELECT doc_id, lang_pred, quality_score,
                   round(q_rank, 6) AS q_rank
            FROM (SELECT doc_id, lang_pred, quality_score,
                         percent_rank() OVER (
                             PARTITION BY lang_pred
                             ORDER BY quality_score DESC, doc_id) AS q_rank
                  FROM (SELECT doc_id,
                               round(0.4 * least(1.0, n_tokens / 400.0)
                                     + 0.3 * (1.0 - n_punct / n_chars)
                                     + 0.3 * least(1.0, se * 5.0), 6) AS quality_score,
                               CASE WHEN greatest(se, sd, sf2) <= 0 THEN 'und'
                                    WHEN se = greatest(se, sd, sf2) THEN 'en'
                                    WHEN sd = greatest(se, sd, sf2) THEN 'de'
                                    ELSE 'fr' END AS lang_pred
                        FROM (SELECT doc_id,
                                     len({_TOKS}) AS n_tokens,
                                     length(text) AS n_chars,
                                     len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
                                     len(list_filter({_TOKS}, t -> t IN {_STOP_EN})) / len({_TOKS}) AS se,
                                     len(list_filter({_TOKS}, t -> t IN ('der','die','das','und','ist'))) / len({_TOKS}) AS sd,
                                     len(list_filter({_TOKS}, t -> t IN ('le','la','et','les','des'))) / len({_TOKS}) AS sf2
                              FROM corpus)))
            WHERE q_rank <= 0.6"""
    ),
)

# Quantile-threshold twin of the rank cut: per-language exact order
# statistic as an AGGREGATE (quantile_cont == Spark `percentile`), then a
# broadcast threshold filter — no per-language window sort, skew-immune.
register(
    "text_quality_top_quantile",
    lambda spark, sf: text_analysis.quality_top_quantile(_corpus(spark, sf)),
    _csql(
        f""", scored AS (
                SELECT doc_id,
                       round(0.4 * least(1.0, n_tokens / 400.0)
                             + 0.3 * (1.0 - n_punct / n_chars)
                             + 0.3 * least(1.0, se * 5.0), 6) AS quality_score,
                       CASE WHEN greatest(se, sd, sf2) <= 0 THEN 'und'
                            WHEN se = greatest(se, sd, sf2) THEN 'en'
                            WHEN sd = greatest(se, sd, sf2) THEN 'de'
                            ELSE 'fr' END AS lang_pred
                FROM (SELECT doc_id,
                             len({_TOKS}) AS n_tokens,
                             length(text) AS n_chars,
                             len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
                             len(list_filter({_TOKS}, t -> t IN {_STOP_EN})) / len({_TOKS}) AS se,
                             len(list_filter({_TOKS}, t -> t IN ('der','die','das','und','ist'))) / len({_TOKS}) AS sd,
                             len(list_filter({_TOKS}, t -> t IN ('le','la','et','les','des'))) / len({_TOKS}) AS sf2
                      FROM corpus)
            ),
            thr AS (
                SELECT lang_pred,
                       round(quantile_cont(quality_score, 0.4), 6) AS q_thr
                FROM scored GROUP BY lang_pred
            )
            SELECT s.doc_id, s.lang_pred, s.quality_score, t.q_thr
            FROM scored s JOIN thr t USING (lang_pred)
            WHERE s.quality_score >= t.q_thr"""
    ),
)

_SAMPLE_RATE_CASE = (
    "CASE lang_pred "
    + " ".join(
        f"WHEN '{lg}' THEN {r}"
        for lg, r in text_analysis.SAMPLE_RATES.items()
        if lg != "und"
    )
    + f" ELSE {text_analysis.SAMPLE_RATES['und']} END"
)

register(
    "text_sample_stratified",
    lambda spark, sf: text_analysis.sample_stratified(_corpus(spark, sf)),
    _csql(
        f"""SELECT doc_id, lang_pred, round(k, 6) AS sample_key
            FROM (SELECT doc_id, lang_pred,
                         {text_analysis.hash40_sql("'smp_' || CAST(doc_id AS VARCHAR)")} / 1099511627776.0 AS k
                  FROM (SELECT doc_id,
                               CASE WHEN greatest(se, sd, sf2) <= 0 THEN 'und'
                                    WHEN se = greatest(se, sd, sf2) THEN 'en'
                                    WHEN sd = greatest(se, sd, sf2) THEN 'de'
                                    ELSE 'fr' END AS lang_pred
                        FROM (SELECT doc_id,
                                     len(list_filter({_TOKS}, t -> t IN {_STOP_EN})) / len({_TOKS}) AS se,
                                     len(list_filter({_TOKS}, t -> t IN ('der','die','das','und','ist'))) / len({_TOKS}) AS sd,
                                     len(list_filter({_TOKS}, t -> t IN ('le','la','et','les','des'))) / len({_TOKS}) AS sf2
                              FROM corpus)))
            WHERE k < {_SAMPLE_RATE_CASE}"""
    ),
)

# Fixed-SIZE per-group sample (the reservoir primitive next to the
# fixed-RATE stratified filter): exactly min(k, |group|) docs per
# source via rank over a content-independent hash — engine-
# reproducible, stable under other groups' growth, WindowGroupLimit
# plan (never a whole-group sort). Over the raw documents table.
register(
    "corpus_sample_fixed_per_source",
    lambda spark, sf: text_analysis.sample_fixed_per_group(
        tables.load(spark, sf, "documents")
    ),
    f"""SELECT doc_id, source, sample_rank FROM (
  SELECT doc_id, source,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY {text_analysis.hash40_sql("'res_' || CAST(doc_id AS VARCHAR)")},
                    doc_id) AS INT) AS sample_rank
  FROM documents) t
WHERE sample_rank <= {text_analysis.SAMPLE_K_PER_GROUP}""",
)

# EXACT flat-scan baseline: pytest-only recall fixture since r8 (the
# |Q| x |V| crossJoin is the one shape that can never survive a 100x
# scale-up); the registered ANN shapes are simsearch_ivf_topk /
# simsearch_ivfpq_topk, recall-gated against this fixture in pytest.
register_fixture(
    "simsearch_cosine_topk",
    lambda spark, sf: simsearch.cosine_topk(_emb(spark, sf)),
    """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
                  FROM embeddings WHERE vec_id % 100 = 0),
       v AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS vv
             FROM embeddings)
SELECT q_id, neighbor_id, rank, cosine_sim
FROM (SELECT q_id, neighbor_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cosine_sim DESC, neighbor_id) AS rank,
             cosine_sim
      FROM (SELECT q_id, neighbor_id,
                   round(list_cosine_similarity(qv, vv), 4) AS cosine_sim
            FROM q CROSS JOIN v WHERE q_id <> neighbor_id))
WHERE rank <= 10""",
)

# Approximate vs the FLAT ground truth (recall pinned in pytest), but
# HASH-GREEN since r13 vs an oracle replaying the same IVF path: with
# the fit + assignment + probe choice integer-exact (r12) the candidate
# set is deterministic, and the rank window orders by the proven
# round(cosine, 4) with a neighbor_id tie-break — see
# simsearch.ivf_candidates_sql (937/937 probed pairs verified
# bit-identical at sf0.01 before the flip).
_IVF_TOPK_SQL = f"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS embedding
             FROM embeddings),
{simsearch.ivf_candidates_sql("emb")}
SELECT q_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine_sim
FROM (SELECT q_id, neighbor_id, cosine_sim,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cosine_sim DESC, neighbor_id)
                 AS rank
      FROM cand)
WHERE rank <= 10"""
register(
    "simsearch_ivf_topk",
    lambda spark, sf: simsearch.ivf_topk(_emb(spark, sf)),
    _IVF_TOPK_SQL,
)

# NOTE: flat-ADC pq_topk (simsearch.pq_topk) is deliberately NOT
# registered: its ADC scan is an unbounded |Q| x |V| crossJoin — a
# recall-reference baseline (FAISS IndexPQ posture), kept as a tested
# library function (tests/test_training_ops.py::test_pq_recall_and_
# compression) but off the registered surface so the class-level
# invariant holds: no registered entry's plan contains an unbounded
# CartesianProduct (tests/test_plans.py::test_registry_no_cartesian).
# The shipped PQ shape is simsearch_ivfpq_topk below.

# IVF x PQ composed index — the terminal 100 TB ANN shape: PQ's ADC scan
# gated by IVF cell pruning (a bucket equi-join; no cross product in the
# plan, gated by tests/test_training_ops.py). HASH-GREEN since r13: the
# PQ codebook fit is integer-exact (micro-unit quantized sample, int64
# Lloyd — simsearch.pq_fit_sql replays it bit-for-bit, verified), encode
# argmin / distance tables / ADC sums are exact int64, cell choice is
# the r12 integer score, and the only float op is the proven per-pair
# round(cosine, 4) re-rank. Recall vs FLAT truth stays pinned in pytest.
_PQ_DSUB = 64 // simsearch.PQ_M
_PQ_SUB = "list_slice({u}, {{s}} * {d} + 1, {{s}} * {d} + {d})".format(
    u="{u}", d=_PQ_DSUB
)
register(
    "simsearch_ivfpq_topk",
    lambda spark, sf: simsearch.ivfpq_topk(_emb(spark, sf)),
    f"""WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS embedding
             FROM embeddings),
{simsearch.ivf_fit_sql("emb")},
{simsearch.pq_fit_sql(m=simsearch.PQ_M, k=simsearch.PQ_K, dsub=_PQ_DSUB)},
vv AS (SELECT vec_id, embedding, {_IVF_QUANT} AS vq FROM emb),
assigned AS (SELECT vec_id AS neighbor_id, c_id AS bucket
             FROM ({simsearch.ivf_assign_sql("vv")}) WHERE rn = 1),
uu AS MATERIALIZED (SELECT vec_id, {simsearch.pq_unit_sql("vq")} AS u FROM vv),
codes AS MATERIALIZED (
    SELECT uu.vec_id, b.s, b.c_id AS code
    FROM uu, pq_books b
    QUALIFY row_number() OVER (PARTITION BY uu.vec_id, b.s
        ORDER BY {simsearch._sql_il2(_PQ_SUB.format(u="uu.u", s="b.s"), "b.c")}
                 ASC, b.c_id) = 1),
qv AS (SELECT vec_id AS q_id, embedding AS q_vec, vq FROM vv
       WHERE vec_id % 100 = 0),
probes AS (SELECT q_id, c_id AS bucket
           FROM ({simsearch.ivf_assign_sql("qv", id_col="q_id")})
           WHERE rn <= 12),
qu AS MATERIALIZED (SELECT q_id, {simsearch.pq_unit_sql("vq")} AS u FROM qv),
dt AS MATERIALIZED (
    SELECT q.q_id, b.s, b.c_id,
           {simsearch._sql_il2(_PQ_SUB.format(u="q.u", s="b.s"), "b.c")} AS d2
    FROM qu q, pq_books b),
pairs0 AS MATERIALIZED (
    SELECT DISTINCT p.q_id, a.neighbor_id
    FROM probes p JOIN assigned a USING (bucket)
    WHERE p.q_id <> a.neighbor_id),
adc AS MATERIALIZED (
    SELECT pr.q_id, pr.neighbor_id, CAST(sum(d.d2) AS BIGINT) AS adc
    FROM pairs0 pr
    JOIN codes cf ON cf.vec_id = pr.neighbor_id
    JOIN dt d ON d.q_id = pr.q_id AND d.s = cf.s AND d.c_id = cf.code
    GROUP BY 1, 2),
cands AS MATERIALIZED (
    SELECT q_id, neighbor_id FROM adc
    QUALIFY row_number() OVER (PARTITION BY q_id
                               ORDER BY adc ASC, neighbor_id) <= 80),
rescored AS (
    SELECT c.q_id, c.neighbor_id,
           round(list_cosine_similarity(q.q_vec, e.embedding), 4)
               AS cosine_sim
    FROM cands c
    JOIN qv q USING (q_id)
    JOIN emb e ON e.vec_id = c.neighbor_id)
SELECT q_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine_sim
FROM (SELECT q_id, neighbor_id, cosine_sim,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cosine_sim DESC, neighbor_id)
                 AS rank
      FROM rescored)
WHERE rank <= 10""",
)

# Scalar int8 quantization of the embedding column (vector-index storage
# compression); the driver hash covers the full int vector via q_digest.
register(
    "embedding_quantize_int8",
    lambda spark, sf: simsearch.quantize_int8(_emb(spark, sf)),
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
d AS (SELECT u.i AS pos, min(u.x) AS mn, max(u.x) AS mx
      FROM e, LATERAL (SELECT UNNEST(v) AS x,
                              UNNEST(generate_series(1, len(v))) AS i) u
      GROUP BY 1),
s AS (SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs FROM d),
q AS (SELECT vec_id, v, mins, maxs,
             list_transform(generate_series(1, len(v)),
                 i -> CAST(round((v[i] - mins[i])
                                 / (maxs[i] - mins[i]) * 255) AS INT)) AS qv
      FROM e, s)
SELECT vec_id, qv[1] AS q0, qv[33] AS q32, qv[64] AS q63,
       md5(array_to_string(qv, ',')) AS q_digest,
       round(list_max(list_transform(generate_series(1, len(v)),
             i -> abs(v[i] - (mins[i] + (qv[i] / 255.0)
                              * (maxs[i] - mins[i]))))), 6) AS max_abs_err
FROM q""",
)

# Embedding near-dup: the hyperplane weights are Python-computed double
# literals embedded in BOTH the Spark plan and the oracle SQL, so the
# sign-bit buckets agree exactly.
_EMB_CORPUS = corpus_mod.EMB_CORPUS_SQL.strip()
_BUCKET_SQL = " + ".join(
    f"(CASE WHEN list_dot_product(embedding, [{', '.join(repr(w) for w in ws)}]) > 0"
    f" THEN CAST(1 AS BIGINT) ELSE 0 END * {1 << j})"
    for j, ws in enumerate(simsearch.plane_weights())
)

register(
    "dedup_embedding_cosine",
    lambda spark, sf: simsearch.cosine_near_dup_pairs(_emb_corpus(spark, sf)),
    f"""WITH {_EMB_CORPUS},
bucketed AS (SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM emb),
bkeep AS (SELECT bucket FROM bucketed GROUP BY bucket
          HAVING count(*) <= {text_dedup.MAX_BAND_BUCKET})
SELECT a, b, cosine_sim
FROM (SELECT x.vec_id AS a, y.vec_id AS b,
             round(list_cosine_similarity(x.embedding, y.embedding), 4) AS cosine_sim
      FROM bucketed x JOIN bucketed y
        ON x.bucket = y.bucket AND x.vec_id < y.vec_id
      JOIN bkeep k ON x.bucket = k.bucket)
WHERE cosine_sim >= 0.97""",
)

# The CC closure composed over the EMBEDDING near-dup pairs: the same
# large-star/small-star operator closing a different modality's pair set
# (one kept vector per semantic-duplicate cluster).
register(
    "dedup_embedding_cluster_keep",
    lambda spark, sf: text_dedup.dedup_clusters(
        _emb_corpus(spark, sf)
        .select("vec_id")
        .withColumnRenamed("vec_id", "doc_id"),
        simsearch.cosine_near_dup_pairs(_emb_corpus(spark, sf)),
    ).toDF("vec_id", "cluster_id", "keep"),
    f"""WITH RECURSIVE {_EMB_CORPUS},
bucketed AS (SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM emb),
bkeep AS (SELECT bucket FROM bucketed GROUP BY bucket
          HAVING count(*) <= {text_dedup.MAX_BAND_BUCKET}),
epairs AS MATERIALIZED (
    SELECT a, b FROM (
        SELECT x.vec_id AS a, y.vec_id AS b,
               round(list_cosine_similarity(x.embedding, y.embedding), 4)
                   AS cosine_sim
        FROM bucketed x JOIN bucketed y
          ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        JOIN bkeep k ON x.bucket = k.bucket)
    WHERE cosine_sim >= 0.97),
    -- r13 sf1-gate fix: the clone-mass cap was MISSING here (present in
    -- both the Spark operator and the dedup_embedding_cosine oracle) —
    -- below the cap the omission was invisible; sf1's hot buckets made
    -- this oracle over-merge clusters. DEDUP_SF1_r13.json caught it.
edges AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM epairs
    UNION ALL
    SELECT b AS src, a AS dst FROM epairs
),
reach(v, l) AS (
    SELECT vec_id, vec_id FROM emb
    UNION
    SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.v
)
SELECT v AS vec_id, min(l) AS cluster_id,
       CAST(v = min(l) AS INT) AS keep
FROM reach GROUP BY v""",
)

register(
    "multimodal_decode",
    lambda spark, sf: multimodal.decode_features(
        multimodal.with_binary_payload(_corpus(spark, sf))
    ),
    _csql(
        """SELECT doc_id,
                  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                       WHEN 2 THEN 'wav' ELSE 'mp4' END AS fmt,
                  strlen(text) AS byte_len,
                  md5(text) AS checksum,
                  CAST(strlen(text) % 640 AS INT) AS width,
                  CAST(strlen(text) % 480 AS INT) AS height,
                  CAST(CASE WHEN doc_id % 4 = 3 THEN 16 ELSE 1 END AS INT) AS n_frames
           FROM corpus"""
    ),
)

# Exact content dedup of media payloads: Catalyst md5 over the BINARY
# column (no Python, no codec — detection must never decode); one scan +
# one hash agg. Clone-expanded corpus guarantees true positives.
register(
    "multimodal_dedup_exact",
    lambda spark, sf: multimodal.dedup_binary_exact(
        multimodal.with_binary_payload(_corpus(spark, sf))
    ),
    _csql(
        """SELECT md5(text) AS checksum,
                  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                       WHEN 2 THEN 'wav' ELSE 'mp4' END AS fmt,
                  CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
                  CAST(count(*) AS BIGINT) AS n_copies,
                  CAST((count(*) - 1) * max(strlen(text)) AS BIGINT)
                    AS bytes_reclaimable
           FROM corpus
           GROUP BY 1, 2 HAVING count(*) >= 2"""
    ),
)

# Perceptual near-dup image pairs: dHash over the deterministic fake
# decode (Arrow stage), then Hamming-band LSH candidates verified by
# bit_count(xor) — the banded join from text_dedup.simhash_pairs reused
# on the image plane. HASH-GREEN since r13: the synthetic payload is the
# UTF-8 bytes of ASCII text, so the byte-grid sampling has an exact SQL
# twin (multimodal.dhash_sql) and the banding/cap/verify replays the
# proven dedup_simhash oracle shape. The planted-near-duplicate recall
# gate in tests/test_multimodal.py stays.
register(
    "multimodal_dedup_perceptual",
    lambda spark, sf: multimodal.dedup_perceptual(
        multimodal.with_binary_payload(_corpus(spark, sf))
    ),
    _csql(
        f"""{multimodal.dhash_sql()},
banded AS (
    SELECT doc_id, dhash, g.band, (dhash >> (16 * g.band)) & 65535 AS v
    FROM dsig
    CROSS JOIN LATERAL (SELECT UNNEST(generate_series(0, 3)) AS band) g
),
bkeep AS (SELECT band, v FROM banded GROUP BY band, v
          HAVING count(*) <= {text_dedup.MAX_BAND_BUCKET}),
cands AS (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
                    x.dhash AS ha, y.dhash AS hb
    FROM banded x JOIN banded y
      ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id
    JOIN bkeep k ON x.band = k.band AND x.v = k.v
)
SELECT a, b, bit_count(xor(ha, hb)) AS hamming
FROM cands WHERE bit_count(xor(ha, hb)) <= 3"""
    ),
)

register(
    "multimodal_resize",
    lambda spark, sf: multimodal.resize_stub(
        multimodal.with_binary_payload(_corpus(spark, sf))
    ),
    _csql(
        """SELECT doc_id,
                  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' ELSE 'jpeg' END AS fmt,
                  CAST(strlen(text) % 640 AS INT) AS width,
                  CAST(strlen(text) % 480 AS INT) AS height,
                  CAST(224 AS INT) AS target_w, CAST(224 AS INT) AS target_h,
                  least(strlen(text), 50176) AS out_len,
                  md5(substr(text, 1, 50176)) AS out_checksum,
                  round(224.0 / nullif(strlen(text) % 640, 0), 4) AS scale_x,
                  round(224.0 / nullif(strlen(text) % 480, 0), 4) AS scale_y
           FROM corpus WHERE doc_id % 4 IN (0, 1)"""
    ),
)

register(
    "multimodal_frame_sample",
    lambda spark, sf: multimodal.frame_sample(
        multimodal.decode_features(
            multimodal.with_binary_payload(_corpus(spark, sf))
        )
    ),
    _csql(
        """SELECT doc_id, md5(text) AS checksum, CAST(g.f AS INT) AS frame_idx
           FROM corpus
           CROSS JOIN LATERAL (SELECT UNNEST(generate_series(0, 15, 4)) AS f) g
           WHERE doc_id % 4 = 3"""
    ),
)


