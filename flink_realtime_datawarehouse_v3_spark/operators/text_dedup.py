"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Training-data-pipeline operators (beyond the reference surface). All are
pure Catalyst plans — hashing is md5-hex-prefix arithmetic shared with the
DuckDB oracle, so even the MinHash/SimHash pipelines hash-match exactly.

Scale design:
- exact dedup: one hash-shuffle on the text hash (group-by), minimal.
- n-gram Jaccard: inverted shingle index self-join — the classic
  all-pairs-with-common-shingle pattern; candidate count is bounded by
  shingle co-occurrence, not |docs|^2. At 100 TB you'd pre-filter with
  MinHash bands (below) before the exact verify; both stages are here.
- MinHash-LSH: k=16 permutation-free hashes ((a*x+b) & (2^40-1)), 4 bands
  x 4 rows; band join produces candidates, true Jaccard verifies.
- SimHash: 40-bit fingerprint, 4 bands of 10 bits for candidates, verify
  hamming distance <= 3 via bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_analysis import hash40, tokens

MASK40 = (1 << 40) - 1

# Deterministic odd multipliers / offsets for the minhash family
# (seeded LCG constants, fixed forever; mirrored in the oracle SQL).
MINHASH_K = 16


def _lcg_constants(k: int = MINHASH_K) -> list[tuple[int, int]]:
    out = []
    state = 0x5DEECE66D
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = ((state >> 10) % (1 << 20)) | 1  # odd, < 2^20
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % (1 << 40)
        out.append((a, b))
    return out


MINHASH_AB = _lcg_constants()


def shingles_exploded(corpus: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct n-gram token shingles per doc."""
    toks = tokens(F.col("text"))
    cnt = F.size(toks)
    arr = F.transform(
        F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return (
        corpus.select("doc_id", F.explode(F.array_distinct(arr)).alias("shingle"))
    )


def dedup_exact(corpus: DataFrame) -> DataFrame:
    """Exact dedup via text-hash group-by: one row per distinct content with
    the kept (minimum) doc_id and the duplicate count."""
    return (
        corpus.select("doc_id", F.md5(F.col("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def ngram_jaccard_pairs(
    corpus: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard >= threshold, via the
    inverted shingle index (explode -> self-join -> count/union)."""
    sh = shingles_exploded(corpus, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _minhash_sig(sh: DataFrame) -> DataFrame:
    """(doc_id, m0..m15) minhash signature from exploded shingles."""
    x = hash40(F.col("shingle"))
    aggs = [
        F.min((F.lit(a) * x + F.lit(b)).bitwiseAND(F.lit(MASK40))).alias(f"m{i}")
        for i, (a, b) in enumerate(MINHASH_AB)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    corpus: DataFrame, threshold: float = 0.5, bands: int = 4
) -> DataFrame:
    """MinHash + banded LSH candidates, verified with exact Jaccard.

    Output == ngram_jaccard_pairs minus band-misses (recall < 1 by design);
    at scale this replaces the quadratic shingle self-join with a
    band-bucket join.
    """
    sh = shingles_exploded(corpus)
    sig = _minhash_sig(sh)
    rows_per_band = MINHASH_K // bands
    band_exprs = []
    for j in range(bands):
        cols = [F.col(f"m{j * rows_per_band + r}") for r in range(rows_per_band)]
        band_exprs.append(
            F.struct(F.lit(j).alias("band"), F.md5(F.concat_ws(",", *cols)).alias("v"))
        )
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_exprs)).alias("bv")
    ).select("doc_id", F.col("bv.band").alias("band"), F.col("bv.v").alias("v"))
    a = banded.select(F.col("doc_id").alias("a"), "band", "v")
    b = banded.select(F.col("doc_id").alias("b"), "band", "v")
    cands = (
        a.join(b, ["band", "v"]).filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    # Verify ONLY the candidate pairs (the point of LSH): broadcast the
    # small candidate set into the shingle index instead of materializing
    # the full all-pairs Jaccard join.
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("a"), "shingle").join(F.broadcast(cands), "a")
    common = (
        sha.join(sh.select(F.col("doc_id").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _simhash(sh: DataFrame, bits: int = 40) -> DataFrame:
    """(doc_id, simhash) — 40-bit simhash over shingle hashes."""
    x = hash40(F.col("shingle"))
    bit_sums = [
        F.sum(
            F.shiftright(x, i).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"s{i}")
        for i in range(bits)
    ]
    summed = sh.groupBy("doc_id").agg(*bit_sums)
    simhash = None
    for i in range(bits):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1).cast("bigint")).otherwise(0) * F.lit(
            1 << i
        ).cast("bigint")
        simhash = term if simhash is None else simhash + term
    return summed.select("doc_id", simhash.alias("simhash"))


def simhash_pairs(corpus: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: 4 bands of 10 bits for candidates, verify
    bit_count(xor) <= max_hamming."""
    sig = _simhash(shingles_exploded(corpus))
    band_exprs = [
        F.struct(
            F.lit(j).alias("band"),
            F.shiftright(F.col("simhash"), 10 * j).bitwiseAND(F.lit(1023)).alias("v"),
        )
        for j in range(4)
    ]
    banded = sig.select(
        "doc_id", "simhash", F.explode(F.array(*band_exprs)).alias("bv")
    ).select("doc_id", "simhash", F.col("bv.band").alias("band"), F.col("bv.v").alias("v"))
    a = banded.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "band", "v")
    b = banded.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "band", "v")
    cands = (
        a.join(b, ["band", "v"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def dedup_clusters(
    corpus: DataFrame, pairs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Connected components over near-dup pairs -> one kept doc per cluster.

    LSH/Jaccard emit PAIRS; a real dedup pipeline must then transitively
    close them (a~b, b~c => keep one of {a,b,c}). Min-label propagation to
    fixpoint: every doc starts labelled with itself; each round a doc
    adopts the smallest label among itself and its neighbors. Converges in
    O(component diameter) rounds — near-dup components are shallow star-ish
    clusters, so 2-4 rounds in practice.

    Output: (doc_id, cluster_id = min doc_id of the component,
    keep = 1 on the canonical doc). Singletons keep themselves.

    Scale notes: each round is one shuffle join + groupBy on the edge list;
    ``localCheckpoint`` truncates the iterative lineage (else the plan
    doubles per round). The driver-side fixpoint ``count`` is the loop
    condition, not a data path — the standard shape for iterative graph
    algorithms on DataFrames (GraphFrames' connected components does the
    same with large-star/small-star re-linking, the constant-factor
    improvement to reach O(log d) rounds at 100 TB).
    """
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).localCheckpoint()
    labels = corpus.select(
        F.col("doc_id").alias("v"), F.col("doc_id").alias("label")
    ).localCheckpoint()
    changed = -1
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges.dst == labels.v)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # Carry the previous label through the projection so the fixpoint
        # check is a filter over the just-checkpointed frame — no extra
        # join job per round.
        new = (
            labels.join(nbr, labels.v == nbr.src, "left")
            .select(
                labels.v.alias("v"),
                F.col("label").alias("prev_label"),
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = new.filter(F.col("label") != F.col("prev_label")).count()
        labels = new.select("v", "label")
        if changed == 0:
            break
    if changed != 0:
        # Unconverged labels would silently violate the output contract
        # (cluster_id = component minimum, exactly one keep per cluster).
        raise RuntimeError(
            f"dedup_clusters: label propagation did not converge within "
            f"{max_iter} rounds ({changed} labels still changing); raise "
            f"max_iter (component diameter exceeds the round budget)"
        )
    return labels.select(
        F.col("v").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("v") == F.col("label")).cast("int").alias("keep"),
    )


BENCH_MOD = 97  # corpus docs with doc_id % 97 == 0 form the held-out set
DECON_N = 8  # token-shingle width for the overlap test


def decontaminate(corpus: DataFrame, n: int = DECON_N) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any n-token
    shingle with a held-out benchmark set (the standard LLM-corpus
    n-gram-overlap decontamination pass; training-data op beyond the
    reference surface).

    Here the benchmark set is the deterministic slice
    ``doc_id % BENCH_MOD == 0`` of the base documents; every other corpus
    doc is a training candidate scored by how many of its distinct
    n-shingles appear anywhere in the benchmark.

    Scale design: the benchmark is orders of magnitude smaller than the
    corpus (a few thousand eval docs vs billions of training docs), so its
    distinct-shingle set is BROADCAST and the overlap test is a map-side
    hash-semi-join over the candidates' exploded shingles — the corpus is
    scanned once, shuffled once (the per-doc count), and no shingle
    inverted index over the full corpus is built.
    """
    is_bench = (F.col("doc_id") % BENCH_MOD == 0) & (F.col("doc_id") < 1_000_000)
    bench_shingles = (
        shingles_exploded(corpus.filter(is_bench), n=n).select("shingle").distinct()
    )
    cand = corpus.filter(~is_bench)
    hits = (
        shingles_exploded(cand, n=n)
        .join(F.broadcast(bench_shingles), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        cand.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )
