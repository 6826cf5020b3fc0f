"""Round-9 driver-contract wrappers — continuation of llm_ops.py
(split at ~3.9k lines): LLM-data-pipeline operators over the documents
and embeddings fixtures, each with a DuckDB oracle unless structurally
rows-only. The reference (/root/reference, consumer.py:1-84) lands CDC
envelopes and has no corpus operators; this family is the north-star
addition designed for 100 TB (see each docstring's plan note).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup, similarity
from ..tables import load_table
from . import register

# ---------------------------------------------------------------------------
# Cross-document EXACT substring dedup (Lee et al. 2022 ExactSubstr —
# VERDICT r8 task #2: the one classic dedup tier absent from the stack).
# ---------------------------------------------------------------------------

_COMMON_SUBSTRING_ORACLE = """
WITH c AS (
  SELECT MIN(doc_id) AS doc_id, MIN(text) AS text
  FROM documents GROUP BY md5(text)
), t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM c
), g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
  FROM t, unnest(range(1, len(toks) - 6)) AS u(i)
), shared AS (
  SELECT gram FROM g GROUP BY gram
  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 50
), occ AS (
  SELECT g.* FROM g JOIN shared USING (gram)
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
         a.pos - b.pos AS diag
  FROM occ a JOIN occ b USING (gram)
  WHERE a.doc_id < b.doc_id
), d AS (
  SELECT id_a, id_b, diag, pa,
         pa - row_number() OVER (PARTITION BY id_a, id_b, diag
                                 ORDER BY pa) AS grp
  FROM p
), runs AS (
  SELECT id_a, id_b, CAST(COUNT(*) + 7 AS BIGINT) AS span
  FROM d GROUP BY id_a, id_b, diag, grp
)
SELECT id_a, id_b,
       CAST(MAX(span) AS BIGINT) AS max_shared_span,
       CAST(COUNT(*) AS BIGINT) AS n_runs
FROM runs GROUP BY 1, 2
HAVING MAX(span) >= 16
"""


@register(
    "dedup_common_substring_pairs",
    oracle=_COMMON_SUBSTRING_ORACLE,
    tags=("llm", "dedup"),
)
def dedup_common_substring_pairs(spark, sf_dir):
    """Cross-document EXACT substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" —
    ExactSubstr, the suffix-array tier): pairs of documents sharing a
    verbatim token run of >= 16 tokens, with the longest shared run
    and the number of maximal runs. Spark-natural shape instead of a
    suffix array: clone-collapse -> positional k-gram explode ->
    frequency-capped gram equi-join -> gaps-and-islands per (pair,
    position-diagonal) — every step a keyed shuffle, the window
    partitioned by (pair, diag). See
    operators/dedup.py:common_substring_pairs for the 100 TB variant
    (hashed gram keys). k=8, min_span=16, gram_doc_cap=50 in both
    engines; the cap is part of the operator's semantics (the
    boilerplate discipline every dedup tier here shares)."""
    return dedup.common_substring_pairs(
        load_table(spark, sf_dir, "documents"),
        k=8,
        min_span=16,
        gram_doc_cap=50,
    )

# ---------------------------------------------------------------------------
# OPQ — Optimized Product Quantization (VERDICT r8 task #4).
# ---------------------------------------------------------------------------

_OPQ_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
       TRUE AS distortion_monotone,
       TRUE AS opq_distortion_lt_residual,
       TRUE AS recall_gt_random_floor
FROM (
  WITH q AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
  ), d AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           round(sqrt(list_sum(list_transform(
             list_zip(a.v, b.v), p -> (p[1] - p[2]) * (p[1] - p[2])))), 5)
             AS l2_dist
    FROM q a JOIN q b ON a.vec_id < 10 AND a.vec_id <> b.vec_id
  ), r AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY l2_dist, neighbor_id) AS rank
    FROM d
  )
  SELECT query_id, neighbor_id FROM r WHERE rank <= 5
)
"""


@register("sim_ann_opq_topk", oracle=_OPQ_ORACLE, tags=("llm", "similarity", "ivf"))
def sim_ann_opq_topk(spark, sf_dir):
    """OPQ-rotated residual IVFADC (Ge et al., "Optimized Product
    Quantization for ANN Search", CVPR 2013 §3 non-parametric
    alternation, over the Jégou TPAMI'11 residual construction) — the
    remaining quality lever on the PQ stack after index/rerank/
    residual (VERDICT r8 task #4). Driver contracts pin what the
    algorithm PROVABLY delivers:

    (a) ``distortion_monotone`` — the per-iterate exact-integer
        quantization distortion is non-increasing across the OPQ-NP
        alternation (each half-step minimizes the same objective;
        iterate 0 is the unrotated residual-PQ codebook itself);
    (b) ``opq_distortion_lt_residual`` — the final rotated codebook's
        distortion is STRICTLY below residual-PQ's (measured -11% at
        both fixture SFs);
    (c) ``recall_gt_random_floor`` — end-to-end ADC recall above the
        0.25 random-scan floor on the same probes/candidates.

    Honesty note (PLANS.md r9): OPQ's guarantee is on distortion, not
    small-sample top-k recall — measured hits-of-50 are 26 vs 20
    (sf0.001) and 17 vs 20 (sf0.01) against the residual baseline,
    i.e. ±3 sampling noise at 50 query-neighbor slots, so a
    recall>=residual contract would pin noise, not the operator
    (the agg_anova_f lesson applied to contracts). Distortions are
    exact BIGINT relations under the driver hash, not driver-side
    floats; the rotation is identical under every shuffle layout
    because the Procrustes/PCA moments it is learned from are exact
    integer collects."""
    emb = load_table(spark, sf_dir, "embeddings")
    index = similarity.build_ivfpq_index(emb, pin=True)
    alt = similarity.opq_alternation(emb, index)
    exact = similarity.euclidean_topk(emb).select("query_id", "neighbor_id")
    opq = similarity.ivfpq_opq_topk(emb, index=index, alt=alt).select(
        "query_id", "neighbor_id"
    )
    hits = exact.join(opq, ["query_id", "neighbor_id"], "left_semi")
    d0, d1, d2 = (
        df.select(F.col("distortion").alias(f"d{i}"))
        for i, df in enumerate(alt["dists"])
    )
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
        .crossJoin(d0).crossJoin(d1).crossJoin(d2)
        .select(
            "n_exact_pairs",
            (
                (F.col("d0") >= F.col("d1")) & (F.col("d1") >= F.col("d2"))
            ).alias("distortion_monotone"),
            (F.col("d2") < F.col("d0")).alias("opq_distortion_lt_residual"),
            (F.col("n_hits") / F.col("n_exact_pairs") > 0.25).alias(
                "recall_gt_random_floor"
            ),
        )
    )
