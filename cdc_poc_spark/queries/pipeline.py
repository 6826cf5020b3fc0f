"""Corpus-curation pipeline queries: the end-to-end shapes a training-
data pipeline runs over a document corpus — stratified sampling,
percentile quality filtering, and the composed dedup -> filter -> split
curation flow.

Reference parity: the reference (thanminh24/CDC_POC) has no corpus
operators; these extend the engine per the north-star brief
(BASELINE.json "north_star": dedup/similarity/text analysis designed
for 100 TB). Every query here is oracle-checked against DuckDB.

Scale notes are per-query; the common theme is that each one is a
scan + map-side compute + ONE keyed shuffle (or a distributed top-k),
never a global single-partition window.
"""

from __future__ import annotations

import math

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators import text
from ..tables import MONEY, dec, load_table
from . import register

_STRATIFIED_K = 15

_STRATIFIED_ORACLE = f"""
WITH r AS (
  SELECT source, doc_id,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS rn
  FROM documents
)
SELECT source, doc_id, rn FROM r WHERE rn <= {_STRATIFIED_K}
"""


@register("pipeline_stratified_sample", oracle=_STRATIFIED_ORACLE, tags=("llm", "pipeline"))
def pipeline_stratified_sample(spark, sf_dir):
    """Deterministic K-per-stratum sample: within each source, order
    docs by md5(doc_id) (a stable uniform shuffle both engines compute
    identically — no rand()) and keep the first K. The distributed
    shape is one shuffle keyed by source + a per-partition window; no
    stratum ever needs more than K rows of state, so a 100 TB corpus
    with millions of strata streams through."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _STRATIFIED_K)
        .select("source", "doc_id", "rn")
    )


# Reuses the exact score formula of text_quality_score (llm_ops._QUALITY_ORACLE)
_QUALITY_CTE = """
d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
         CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','value'))) AS DOUBLE)
           / len(toks) AS stopword_ratio
  FROM d
),
q AS (
  SELECT doc_id,
         round((CASE WHEN n_tokens BETWEEN 20 AND 200 THEN 1.0
                     WHEN n_tokens > 200 THEN 0.5 ELSE 0.25 END) * 0.4
               + ttr * 0.3
               + (CASE WHEN stopword_ratio > 0 THEN 1.0 ELSE 0.0 END) * 0.3, 5)
           AS quality_score
  FROM s
)
"""

_PCTL_FILTER_ORACLE = f"""
WITH {_QUALITY_CTE},
r AS (
  SELECT doc_id, quality_score,
         row_number() OVER (ORDER BY quality_score DESC, doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM q
)
SELECT doc_id, quality_score FROM r WHERE rn <= CEIL(0.10 * n)
"""


@register("text_quality_percentile_filter", oracle=_PCTL_FILTER_ORACLE, tags=("llm", "text", "pipeline"))
def text_quality_percentile_filter(spark, sf_dir):
    """Keep the top 10% of the corpus by quality score (deterministic
    tie-break on doc_id). Distributed as count + TakeOrdered(k): each
    partition keeps its local top-k and only k rows reach the driver
    side of the sort — NOT a global row_number window, which would
    funnel 100 TB through one task. The count job is a metadata-cheap
    scan (count-star over parquet row groups)."""
    docs = load_table(spark, sf_dir, "documents")
    q = text.quality_score(docs).select("doc_id", "quality_score")
    n = q.count()
    k = math.ceil(0.10 * n)
    return q.orderBy(F.desc("quality_score"), F.asc("doc_id")).limit(k)


_CURATION_ORACLE = f"""
WITH {_QUALITY_CTE},
fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
  FROM documents
),
keep AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fp),
c AS (
  SELECT dd.doc_id, dd.lang, dd.text,
         CASE WHEN CAST(('0x' || substring(md5(CAST(dd.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90
              THEN 'train' ELSE 'val' END AS split
  FROM documents dd
  JOIN keep k ON dd.doc_id = k.doc_id
  JOIN q ON dd.doc_id = q.doc_id
  WHERE q.quality_score >= 0.5
)
SELECT lang, split,
       COUNT(*) AS n_docs,
       CAST(SUM(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS total_tokens
FROM c GROUP BY lang, split
"""


@register("pipeline_corpus_curation", oracle=_CURATION_ORACLE, tags=("llm", "pipeline"))
def pipeline_corpus_curation(spark, sf_dir):
    """The composed curation flow: exact dedup (token-set fingerprint,
    keep min doc_id) -> quality filter (score >= 0.5) -> deterministic
    train/val split -> per (lang, split) doc and token budget.

    Physically: score + split are computed INLINE on the main scan
    (per-row expressions — no self-join for them); the only second
    pass over documents is the fingerprint keep-set, which genuinely
    needs a groupBy(fingerprint) shuffle, and it rejoins on doc_id.
    The final agg is map-side partial over ~|langs|x2 groups. Every
    stage is keyed — nothing funnels to a single task at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    keep = (
        text.doc_fingerprint(docs)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    scored = text.quality_score(docs, keep=("lang", "text")).select(
        "doc_id", "quality_score", "lang", "text"
    )
    split = F.when(
        F.pmod(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long"),
            F.lit(100),
        )
        < 90,
        "train",
    ).otherwise("val")
    toks = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    return (
        scored.filter(F.col("quality_score") >= 0.5)
        .join(keep, "doc_id", "semi")
        .withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("total_tokens"),
        )
    )


_ZORDER_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       TRUE AS qty_localized, TRUE AS price_localized
FROM lineitem
"""


@register("pipeline_zorder_layout", oracle=_ZORDER_ORACLE, tags=("pipeline", "layout"))
def pipeline_zorder_layout(spark, sf_dir):
    """Z-order (Morton-curve) layout clustering, DRIVER-CHECKED as a
    locality contract: lineitem is clustered on (l_quantity,
    l_extendedprice) via operators.scale.zorder_by, then each output
    partition's min/max span is measured per column; the query emits
    (n_rows, mean-normalized-span < 0.5 on BOTH columns). A plain
    lexicographic sort localizes only its leading column (span ~1.0 on
    the second — asserted in tests/test_scale.py); Z-order must localize
    both, which is what makes parquet row-group min/max skipping work on
    every filter column at 100 TB. The oracle pins the row count
    (layout must lose nothing) and expects both flags TRUE."""
    from ..operators.scale import zorder_by

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice"
    )
    z = zorder_by(li, ["l_quantity", "l_extendedprice"], n_partitions=16)
    spans = (
        z.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_quantity").alias("q_lo"),
            F.max("l_quantity").alias("q_hi"),
            F.min("l_extendedprice").alias("p_lo"),
            F.max("l_extendedprice").alias("p_hi"),
        )
    )
    glo = li.agg(
        F.min("l_quantity").alias("gq_lo"),
        F.max("l_quantity").alias("gq_hi"),
        F.min("l_extendedprice").alias("gp_lo"),
        F.max("l_extendedprice").alias("gp_hi"),
    )
    return spans.crossJoin(F.broadcast(glo)).agg(
        F.sum("n").alias("n_rows"),
        (
            F.avg(
                (F.col("q_hi") - F.col("q_lo"))
                / (F.col("gq_hi") - F.col("gq_lo"))
            )
            < 0.5
        ).alias("qty_localized"),
        (
            F.avg(
                (F.col("p_hi") - F.col("p_lo"))
                / (F.col("gp_hi") - F.col("gp_lo"))
            )
            < 0.5
        ).alias("price_localized"),
    )


_SALTED_JOIN_ORACLE = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("join_salted_skew", oracle=_SALTED_JOIN_ORACLE, tags=("join", "scale"))
def join_salted_skew(spark, sf_dir):
    """The skew-mitigation join, driver-verified for OUTPUT IDENTITY
    with the plain equi-join: the fact side's key is salted
    deterministically (xxhash64 of the row, no rand() — retries and
    speculative tasks agree) and the dimension side is replicated
    `salt` ways, so one hot key spreads over `salt` tasks instead of
    stalling a single reducer. Semantics are unchanged for the
    dim-unique-per-key case, which is exactly what the oracle's plain
    JOIN asserts. At 100 TB this is the manual fallback when AQE's
    skew-join split cannot help (e.g. a broadcast-ineligible dim with
    one mega-key)."""
    from ..operators.scale import salted_join

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "user_id"
    )
    joined = salted_join(ev, cust.select("user_id", "c_mktsegment"), on="user_id", salt=8)
    from ..tables import VAL, dec

    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", VAL)).cast("double").alias("total_value"),
    )


_GLOBAL_INDEX_ORACLE = """
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY source, doc_id) - 1 AS BIGINT) AS row_idx
FROM documents
"""


@register("pipeline_global_index", oracle=_GLOBAL_INDEX_ORACLE, tags=("pipeline", "scale"))
def pipeline_global_index(spark, sf_dir):
    """Contiguous 0-based global row index in (source, doc_id) order —
    the sharding/sampling primitive — computed WITHOUT the
    single-partition `row_number() OVER ()` antipattern: range
    repartition by the order key, pin the partition assignment
    (eager localCheckpoint, so the count pass and the index pass see
    identical partitioning), then per-partition local index + the
    partition's cumulative offset. The oracle IS the global
    row_number(), so the driver verifies the distributed two-pass
    construction reproduces the single-task semantics exactly."""
    from ..operators.scale import global_index

    docs = load_table(spark, sf_dir, "documents")
    return global_index(
        docs.select("doc_id", "source"), order_cols=["source", "doc_id"]
    ).select("doc_id", F.col("row_idx").cast("long"))


# ---------------------------------------------------------------------------
# Token-budget fill: greedy quality-ordered selection up to a per-source
# token budget — the "fill the training mix" primitive.
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 1500

_BUDGET_FILL_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
), s AS (
  SELECT doc_id, source,
         len(toks) AS n_tokens,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
         CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to','value'))) AS DOUBLE)
           / len(toks) AS stopword_ratio
  FROM d
), q AS (
  SELECT doc_id, source, n_tokens,
         round((CASE WHEN n_tokens BETWEEN 20 AND 200 THEN 1.0
                     WHEN n_tokens > 200 THEN 0.5 ELSE 0.25 END) * 0.4
               + ttr * 0.3
               + (CASE WHEN stopword_ratio > 0 THEN 1.0 ELSE 0.0 END) * 0.3, 5)
           AS quality_score
  FROM s
), c AS (
  SELECT source, doc_id, quality_score, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source
                ORDER BY quality_score DESC, doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM q
)
SELECT source, doc_id, quality_score, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= {_BUDGET_TOKENS}
"""


@register("pipeline_token_budget_fill", oracle=_BUDGET_FILL_ORACLE, tags=("llm", "pipeline", "sampling"))
def pipeline_token_budget_fill(spark, sf_dir):
    """Greedy token-budget fill per source: order each source's docs by
    (quality_score DESC, doc_id) and keep the maximal prefix whose
    cumulative token count fits the budget — how a curated training mix
    is actually assembled ("best N tokens per domain"), vs the
    count-based sampling primitives. One shuffle keyed by source (the
    cumulative window); per-task state is the window sorter (spills),
    so a 100 TB corpus with millions of sources streams through at
    |sources| parallelism. Quality is the exact-rational composite
    score shared with text_quality_score, so both engines order
    identically (doc_id tiebreak for equal scores)."""
    docs = load_table(spark, sf_dir, "documents")
    q = text.quality_score(docs, keep=("source",)).select(
        "source",
        "doc_id",
        "quality_score",
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )
    w = (
        W.partitionBy("source")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        q.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= _BUDGET_TOKENS)
        .select("source", "doc_id", "quality_score", "n_tokens", "cum_tokens")
    )


# ---------------------------------------------------------------------------
# Domain-mixture rebalancing: deterministic downsample to target weights.
# ---------------------------------------------------------------------------

_MIX_ORACLE = """
WITH w AS (
  SELECT source,
         CASE WHEN TRY_CAST(substring(source, 4) AS BIGINT) % 2 = 0 THEN 2 ELSE 1 END AS tgt_w
  FROM (SELECT DISTINCT source FROM documents)
), tot AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_total,
         (SELECT SUM(tgt_w) FROM w) AS sum_w
), cap AS (
  SELECT w.source, CAST(((tot.n_total // 2) * w.tgt_w) // tot.sum_w AS BIGINT) AS cap_docs
  FROM w, tot
), r AS (
  SELECT source, doc_id,
         CAST(row_number() OVER (PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
  FROM documents
)
SELECT r.source, r.doc_id, r.rn, cap.cap_docs
FROM r JOIN cap ON r.source = cap.source
WHERE r.rn <= cap.cap_docs
"""


@register("pipeline_mixture_reweight", oracle=_MIX_ORACLE, tags=("llm", "pipeline", "sampling"))
def pipeline_mixture_reweight(spark, sf_dir):
    """Rebalance the corpus to a target domain mixture by deterministic
    downsampling: each source gets a doc quota proportional to its
    target weight (here: even-numbered sources weighted 2x odd ones,
    total budget = half the corpus), and keeps its first quota docs in
    md5(doc_id) order — the same stable uniform shuffle the stratified
    sampler uses, so re-runs and engine ports agree row-for-row. All
    quota arithmetic is exact BIGINT cross-multiplication (no float
    shares). Plan: one tiny per-source agg (broadcast caps relation,
    |sources| rows) + one window shuffle keyed by source — the md5
    order means no source ever needs more than its quota of state
    beyond the window sorter, and a 100 TB corpus rebalances in a
    single pass."""
    docs = load_table(spark, sf_dir, "documents")
    tgt = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            # try_cast + unbounded substring on BOTH sides (oracle uses
            # TRY_CAST): a source name >19 chars or with a non-numeric
            # suffix degrades identically (weight 1) in both engines
            # instead of diverging or erroring (ADVICE r4).
            F.when(
                F.expr("try_cast(substring(source, 4) AS BIGINT) % 2 = 0"), F.lit(2)
            )
            .otherwise(F.lit(1))
            .cast("long")
            .alias("tgt_w"),
        )
    )
    totals = (
        docs.agg(F.count(F.lit(1)).alias("n_total"))
        .crossJoin(tgt.agg(F.sum("tgt_w").alias("sum_w")))
    )
    caps = tgt.crossJoin(F.broadcast(totals)).select(
        "source",
        F.expr("((n_total DIV 2) * tgt_w) DIV sum_w").alias("cap_docs"),
    )
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    r = docs.select("source", "doc_id").withColumn(
        "rn", F.row_number().over(w).cast("long")
    )
    return (
        r.join(F.broadcast(caps), "source")
        .filter(F.col("rn") <= F.col("cap_docs"))
        .select("source", "doc_id", "rn", "cap_docs")
    )


# ---------------------------------------------------------------------------
# Benchmark-substring decontamination (exact containment, not n-gram).
# ---------------------------------------------------------------------------

_CONTAINS_ORACLE = """
WITH p AS (
  SELECT DISTINCT substring(text, 1, 40) AS probe
  FROM documents WHERE doc_id % 97 = 0
)
SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_probes_hit
FROM documents d JOIN p ON contains(d.text, p.probe)
GROUP BY d.doc_id
"""


@register("pipeline_contains_decontaminate", oracle=_CONTAINS_ORACLE, tags=("llm", "pipeline", "dedup"))
def pipeline_contains_decontaminate(spark, sf_dir):
    """EXACT-substring decontamination: flag every document containing
    any benchmark probe string verbatim (here: 40-char prefixes of a
    deterministic doc subset stand in for the benchmark suite). The
    n-gram-overlap decontaminator catches paraphrase-level leakage;
    this catches the verbatim case with zero false positives. Plan: the
    probe set is benchmark-sized (KBs-MBs), so it BROADCASTS and the
    corpus streams past it in one scan — a nested-loop join per row,
    but each probe test is a JVM `contains` over an in-memory array;
    for probe sets in the tens of thousands, swap the inner loop for an
    Aho-Corasick pandas UDF over the same broadcast (same plan shape,
    one automaton build per batch). Both paths live in
    operators.curation.contains_probes (method='broadcast' here;
    method='automaton' is the Aho-Corasick mapInPandas twin, asserted
    row-identical in tests); the probe collect is bounded by the
    benchmark-sized probe contract."""
    from ..operators import curation as cur

    docs = load_table(spark, sf_dir, "documents")
    probes = (
        docs.filter(F.pmod(F.col("doc_id"), F.lit(97)) == 0)
        .select(F.substring("text", 1, 40).alias("probe"))
        .distinct()
    )
    return cur.contains_probes(docs, probes, method="broadcast")


# ---------------------------------------------------------------------------
# End-to-end curation v2: near-dup canonicalization + leakage-safe split
# + quality gate, ONE component decomposition feeding every stage.
# ---------------------------------------------------------------------------

_CURATION2_ORACLE = """
WITH RECURSIVE t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
  FROM t WHERE len(toks) >= 3
), pairs AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
    AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5
), sym AS (
  SELECT ia AS u, ib AS v FROM pairs UNION SELECT ib, ia FROM pairs
), cc AS (
  SELECT u AS node, u AS comp FROM (SELECT u FROM sym UNION SELECT v FROM sym)
  UNION
  SELECT s.v, c.comp FROM cc c JOIN sym s ON s.u = c.node WHERE c.comp < s.v
), lbl AS (
  SELECT node, MIN(comp) AS cluster_id FROM cc GROUP BY node
), cl AS (
  SELECT d.doc_id, d.source, d.text,
         COALESCE(l.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN lbl l ON l.node = d.doc_id
), keep AS (
  SELECT doc_id, source, text, cluster_id FROM cl WHERE doc_id = cluster_id
), s AS (
  SELECT doc_id, source, cluster_id, string_split(text, ' ') AS toks FROM keep
), q AS (
  SELECT doc_id, source, cluster_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         round((CASE WHEN len(toks) BETWEEN 20 AND 200 THEN 1.0
                     WHEN len(toks) > 200 THEN 0.5 ELSE 0.25 END) * 0.4
               + (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.3
               + (CASE WHEN len(list_filter(toks,
                     t2 -> t2 IN ('the','a','of','and','to','value'))) > 0
                   THEN 1.0 ELSE 0.0 END) * 0.3, 5) AS quality_score
  FROM s
)
SELECT source,
       CASE WHEN CAST(('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90
            THEN 'train' ELSE 'val' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM q WHERE quality_score >= 0.5
GROUP BY source, split
"""


@register("pipeline_curation_near_dup_safe", oracle=_CURATION2_ORACLE, tags=("llm", "pipeline", "dedup"))
def pipeline_curation_near_dup_safe(spark, sf_dir):
    """Curation v2, composed end-to-end with ONE near-dup decomposition
    feeding every stage: exact-Jaccard components are computed once
    (clone-collapsed PPJoin+CC), then (1) canonicalization keeps the
    min-id doc per near-dup cluster, (2) the quality gate filters the
    survivors, and (3) the md5 split is keyed by CLUSTER id — so the
    pipeline never re-runs the similarity join the way independent
    dedup_cc_clusters + pipeline_leakage_safe_split calls would (the
    composition rule PLANS.md records for the ~5 s decomposition).
    Output: per (source, split) kept-doc and token counts."""
    from ..operators import dedup as dedup_ops

    docs = load_table(spark, sf_dir, "documents")
    comp = dedup_ops.exact_jaccard_components(docs)  # ONCE
    cl = (
        docs.select("doc_id", "source", "text")
        .join(F.broadcast(comp.withColumnRenamed("node", "doc_id")), "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("component", F.col("doc_id")))
    )
    keep = cl.filter(F.col("doc_id") == F.col("cluster_id"))
    q = text.quality_score(keep, keep=("source", "cluster_id")).filter(
        F.col("quality_score") >= 0.5
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(100),
    )
    return (
        q.withColumn("split", F.when(bucket < 90, "train").otherwise("val"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Curriculum staging: 4 difficulty stages (easy -> hard) by the corpus's
# own unigram LM, exact integer stage boundaries.
# ---------------------------------------------------------------------------

_CURRICULUM_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tok2 AS (
  SELECT doc_id, tok FROM tok WHERE tok <> ''
), counts AS (
  SELECT tok, COUNT(*) AS c FROM tok2 GROUP BY tok
), total AS (
  SELECT SUM(c) AS total FROM counts
), probs AS (
  SELECT tok, CAST(round(ln(CAST(c AS DOUBLE) / CAST(total AS DOUBLE)) * 1e6) AS BIGINT) AS q_lp
  FROM counts CROSS JOIN total
), d AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(p.q_lp) AS BIGINT) AS q_lp_sum
  FROM tok2 t JOIN probs p USING (tok) GROUP BY t.doc_id
), d2 AS (
  SELECT doc_id, n_tokens, q_lp_sum,
         CAST(FLOOR(CAST(q_lp_sum AS DOUBLE) / n_tokens) AS BIGINT) AS avg_micro_nats
  FROM d
), r AS (
  SELECT doc_id, n_tokens, q_lp_sum,
         CAST(row_number() OVER (ORDER BY avg_micro_nats DESC, doc_id) - 1 AS BIGINT) AS pos,
         COUNT(*) OVER () AS n
  FROM d2
)
SELECT CAST((4 * r.pos) // r.n AS BIGINT) AS stage, s.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(r.n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(r.q_lp_sum) AS BIGINT) AS sum_micro_nats
FROM r JOIN documents s USING (doc_id)
GROUP BY stage, s.source
"""


@register("pipeline_curriculum_stages", oracle=_CURRICULUM_ORACLE, tags=("llm", "pipeline", "curriculum"))
def pipeline_curriculum_stages(spark, sf_dir):
    """Curriculum staging: rank the corpus easy -> hard by the unigram-LM
    difficulty proxy (avg micro-nat log-prob, most-likely first) and cut
    it into 4 equal stages — the schedule a curriculum-ordered training
    run consumes. Stage boundaries are EXACT: the rank comes from the
    distributed two-pass global_index (never a single-task global
    window) over the integer (avg_micro_nats, doc_id) key, and
    stage = (4*pos) DIV n is BIGINT arithmetic, so both engines cut
    identically. Per (stage, source) doc/token/mass rollup — the report
    that shows whether a source concentrates in the hard tail."""
    from ..operators.scale import global_index

    docs = load_table(spark, sf_dir, "documents")
    lp = text.unigram_logprob(docs)
    ranked = global_index(
        lp.withColumn("neg_avg", -F.col("avg_micro_nats")),
        idx_col="pos",
        order_cols=["neg_avg", "doc_id"],
    )
    n = ranked.count()
    return (
        ranked.join(docs.select("doc_id", "source"), "doc_id")
        .withColumn("stage", F.expr(f"(4 * pos) DIV {n}"))
        .groupBy("stage", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("q_lp_sum").alias("sum_micro_nats"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge step: global adjacent-symbol pair counts (round 5)
# ---------------------------------------------------------------------------

_BPE_ORACLE = """
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), pairs AS (
  SELECT unnest(list_transform(range(1, length(w)), i -> substring(w, i, 2))) AS pair
  FROM words WHERE length(w) >= 2
), counted AS (
  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
         row_number() OVER (ORDER BY COUNT(*) DESC, pair) AS rnk
  FROM pairs GROUP BY pair
)
SELECT pair, n, CAST(rnk AS BIGINT) AS rnk FROM counted WHERE rnk <= 20
"""


@register("pipeline_bpe_merge_step", oracle=_BPE_ORACLE, tags=("llm", "pipeline", "text"))
def pipeline_bpe_merge_step(spark, sf_dir):
    """ONE BPE training step, corpus-scale: count every adjacent
    character pair across all word occurrences and rank the top-20 —
    the argmax of rank 1 is the next merge a byte-pair-encoding
    tokenizer would apply (Sennrich et al., ACL'16). The iterative
    trainer is this query in a loop with the vocabulary rewritten per
    round; the per-step plan is what must scale: explode to pairs
    (map-side, no shuffle), ONE map-side-combinable count keyed by the
    pair (symbol-pair cardinality is tiny — bounded by |alphabet|^2
    per merge round, so the shuffle is a few KB regardless of corpus
    size), then a broadcast-size top-k. Deterministic rank tiebreak on
    the pair string keeps engines and reruns bit-identical."""
    from pyspark.sql import Window

    words = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    rnk = F.row_number().over(Window.orderBy(F.desc("n"), F.asc("pair")))
    return (
        counted.withColumn("rnk", rnk.cast("long"))
        .filter(F.col("rnk") <= 20)
        .select("pair", "n", "rnk")
    )


# ---------------------------------------------------------------------------
# Deterministic proportional source interleave (training order).
# ---------------------------------------------------------------------------

_INTERLEAVE_Q = 1_000_000_000_000

_INTERLEAVE_ORACLE = f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS src_rank,
         COUNT(*) OVER (PARTITION BY source) AS n_s
  FROM documents
), k AS (
  SELECT doc_id, source, CAST(src_rank AS BIGINT) AS src_rank,
         ((2 * src_rank - 1) * {_INTERLEAVE_Q}) // (2 * n_s) AS interleave_key
  FROM r
)
SELECT doc_id, source, src_rank,
       CAST(interleave_key AS BIGINT) AS interleave_key,
       CAST(row_number() OVER (ORDER BY interleave_key, source, doc_id) AS BIGINT)
         AS global_pos
FROM k
"""


@register("pipeline_interleave_order", oracle=_INTERLEAVE_ORACLE, tags=("llm", "pipeline"))
def pipeline_interleave_order(spark, sf_dir):
    """Deterministic PROPORTIONAL source interleave — the training-order
    constructor: each source's docs are md5-shuffled, then doc r of a
    source with n docs is placed at the exact rational position
    (2r-1)/(2n) of the global order (midpoint rule), so every prefix of
    the resulting sequence contains each source in proportion to its
    size — the property batch-wise mixture sampling only achieves in
    expectation, delivered exactly and reproducibly (integer
    cross-multiplication, no floats; reshuffling an epoch = changing
    the md5 salt).

    Scale shape: per-source rank and count share ONE source-keyed
    window shuffle; the interleave key is map-side integer math; the
    global position comes from the distributed two-pass global_index —
    never a single-partition row_number (the oracle's spelling is
    DuckDB's single-node privilege)."""
    from ..operators.scale import global_index

    docs = load_table(spark, sf_dir, "documents")
    wsrc = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    wall = W.partitionBy("source")
    r = docs.select(
        "doc_id",
        "source",
        F.row_number().over(wsrc).cast("long").alias("src_rank"),
        F.count(F.lit(1)).over(wall).alias("n_s"),
    ).withColumn(
        "interleave_key",
        F.expr(f"((2 * src_rank - 1) * {_INTERLEAVE_Q}) DIV (2 * n_s)"),
    )
    out = global_index(
        r, idx_col="pos0", order_cols=["interleave_key", "source", "doc_id"]
    )
    return out.select(
        "doc_id",
        "source",
        "src_rank",
        "interleave_key",
        (F.col("pos0") + 1).alias("global_pos"),
    )


# ---------------------------------------------------------------------------
# Round-6: deterministic epoch shuffle (training data order).
# ---------------------------------------------------------------------------

_SHUFFLE_ORACLE = """
WITH k AS (
  SELECT doc_id, md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS skey
  FROM documents
), r AS (
  SELECT doc_id, skey,
         row_number() OVER (ORDER BY skey, doc_id) - 1 AS shuffle_pos
  FROM k
)
SELECT CAST(shuffle_pos AS BIGINT) AS shuffle_pos, doc_id, skey
FROM r WHERE shuffle_pos < 100
"""


@register("pipeline_epoch_shuffle", oracle=_SHUFFLE_ORACLE, tags=("llm", "pipeline"))
def pipeline_epoch_shuffle(spark, sf_dir):
    """Deterministic per-epoch training-order shuffle: position = rank
    of md5(epoch_salt || doc_id) — the reproducible global permutation
    a data loader needs (same epoch -> same order on any cluster
    layout; next epoch -> change the salt). The global rank uses the
    two-pass range-partitioned global_index (operators/scale.py), NEVER
    a single-partition row_number window — the difference between a
    permutation that works at 100 TB and one that funnels the corpus
    through one task. Emits the first 100 positions for the contract."""
    from ..operators.scale import global_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    k = docs.withColumn(
        "skey", F.md5(F.concat(F.lit("epoch1:"), F.col("doc_id").cast("string")))
    )
    r = global_index(k, idx_col="shuffle_pos", order_cols=["skey", "doc_id"])
    return r.filter(F.col("shuffle_pos") < 100).select(
        F.col("shuffle_pos").cast("long").alias("shuffle_pos"), "doc_id", "skey"
    )


_KFOLD_K = 5

_KFOLD_ORACLE = f"""
WITH f AS (
  SELECT doc_id, lang,
         CAST(('0x' || substring(md5('fold:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % {_KFOLD_K} AS fold
  FROM documents
)
SELECT CAST(fold AS BIGINT) AS fold, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM f GROUP BY fold, lang
"""


@register("pipeline_kfold_assignment", oracle=_KFOLD_ORACLE, tags=("llm", "pipeline"))
def pipeline_kfold_assignment(spark, sf_dir):
    """Deterministic 5-fold cross-validation assignment: fold =
    md5(salt || doc_id) mod k — reproducible on any cluster layout
    (the split_train_val discipline generalized to k folds), reported
    as per-(fold, lang) counts with id ranges so stratification skew
    is visible. Map-side hash + one keyed count; at 100 TB the fold
    column is also the partition key for fold-local training reads."""
    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        "doc_id",
        "lang",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _KFOLD_K
        ).alias("fold"),
    )
    return f.groupBy("fold", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


_RESERVOIR_K = 20

_RESERVOIR_ORACLE = f"""
WITH u AS (
  SELECT doc_id, n_chars,
         CAST(round(ln((CAST(('0x' || substring(md5('res:' || CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) + 1) / 4294967297.0) * 1000000) AS BIGINT)
           AS ln_u_micro
  FROM documents WHERE n_chars > 0
), k AS (
  SELECT doc_id, n_chars, ln_u_micro,
         CAST(ln_u_micro AS DOUBLE) / n_chars AS akey
  FROM u
), r AS (
  SELECT *, row_number() OVER (ORDER BY akey DESC, doc_id) AS pos FROM k
)
SELECT CAST(pos AS BIGINT) AS pos, doc_id, n_chars, ln_u_micro,
       round(akey, 9) AS akey
FROM r WHERE pos <= {_RESERVOIR_K}
"""


@register("pipeline_weighted_reservoir", oracle=_RESERVOIR_ORACLE, tags=("llm", "pipeline", "sampling"))
def pipeline_weighted_reservoir(spark, sf_dir):
    """Weighted reservoir sampling WITHOUT replacement (Efraimidis &
    Spirakis A-ES): each doc draws key = ln(u)/w (equivalent ordering
    to u^(1/w)) with weight = n_chars and a deterministic md5 uniform;
    the top-k keys ARE the weighted sample — one distributed top-k, no
    sequential reservoir state, which is why A-ES is THE distributed
    weighted sampler (and mergeable: union then re-top-k). Exactness:
    ln(u) is QUANTIZED to int64 micro-nats (single per-row expression),
    so the sort key is one identical integer division in both engines.
    Top-k via TakeOrderedAndProject — never a global sort
    materialization."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = docs.select(
        "doc_id",
        "n_chars",
        F.round(
            F.log(
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit("res:"), F.col("doc_id").cast("string"))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    + 1
                )
                / 4294967297.0
            )
            * 1_000_000
        )
        .cast("long")
        .alias("ln_u_micro"),
    )
    k = u.withColumn("akey", F.col("ln_u_micro").cast("double") / F.col("n_chars"))
    top = k.orderBy(F.desc("akey"), F.asc("doc_id")).limit(_RESERVOIR_K)
    from pyspark.sql import Window as W

    pos_w = W.orderBy(F.desc("akey"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(pos_w).cast("long").alias("pos"),
        "doc_id",
        "n_chars",
        "ln_u_micro",
        F.round("akey", 9).alias("akey"),
    )


_TEMPORAL_SPLIT_ORACLE = """
WITH d AS (
  SELECT o_orderkey,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         CAST(round(CAST(o_totalprice AS DECIMAL(15,2)) * 100) AS BIGINT)
           AS cents
  FROM orders
), b AS (
  SELECT CAST(MIN(day) AS BIGINT) AS d0, CAST(MAX(day) AS BIGINT) AS d1 FROM d
), cut AS (
  SELECT d0, d1, d0 + (d1 - d0) * 8 // 10 AS train_end FROM b
), lab AS (
  SELECT d.o_orderkey, d.day, d.cents,
         CASE WHEN d.day <= cut.train_end THEN 'train'
              WHEN d.day <= cut.train_end + 7 THEN 'purged'
              ELSE 'test' END AS split
  FROM d, cut
)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(day) AS BIGINT) AS min_day,
       CAST(MAX(day) AS BIGINT) AS max_day,
       CAST(SUM(cents) AS BIGINT) AS cents_total
FROM lab GROUP BY split
"""


@register("pipeline_temporal_split", oracle=_TEMPORAL_SPLIT_ORACLE, tags=("pipeline", "ml"))
def pipeline_temporal_split(spark, sf_dir):
    """PURGED TEMPORAL train/test split: train = the first 80% of the
    date range, then a 7-day PURGE GAP that belongs to neither side,
    then test — the leakage control for time-series models (an
    instance whose features are computed over a trailing window must
    not straddle the boundary; the purge absorbs that window). The
    group-keyed variant is pipeline_leakage_safe_split; this is the
    time-keyed one, and cdc_point_in_time_join is the row-level
    companion.

    Cutoffs are exact integer day arithmetic off the broadcast
    min/max — no quantile sort; the labeling is one map-side CASE.
    Output: per-split counts, day ranges (the purge's emptiness of
    overlap is visible), exact cents totals."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    d = orders.select(
        "o_orderkey",
        F.unix_date(F.col("o_orderdate").cast("date")).cast("long").alias("day"),
        F.round(dec("o_totalprice", MONEY) * 100).cast("long").alias("cents"),
    )
    b = d.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cut = b.select(
        F.expr("d0 + (d1 - d0) * 8 DIV 10").alias("train_end")
    )
    lab = d.crossJoin(F.broadcast(cut)).select(
        "day",
        "cents",
        F.when(F.col("day") <= F.col("train_end"), "train")
        .when(F.col("day") <= F.col("train_end") + 7, "purged")
        .otherwise("test")
        .alias("split"),
    )
    return lab.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("day").alias("min_day"),
        F.max("day").alias("max_day"),
        F.sum("cents").alias("cents_total"),
    )


_FINGERPRINT_ORACLE = """
WITH o AS (
  SELECT CAST(SUM(CAST(('0x' || substring(md5(
           CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
           || '|' || o_orderstatus || '|'
           || CAST(CAST(round(CAST(o_totalprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS VARCHAR)), 1, 15)) AS BIGINT))
         AS HUGEINT) % 9223372036854775783 AS fp,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM orders
), l AS (
  SELECT CAST(SUM(CAST(('0x' || substring(md5(
           CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_partkey AS VARCHAR)
           || '|' || CAST(l_linenumber AS VARCHAR) || '|'
           || CAST(CAST(round(CAST(l_extendedprice AS DECIMAL(15,2)) * 100)
                        AS BIGINT) AS VARCHAR)), 1, 15)) AS BIGINT))
         AS HUGEINT) % 9223372036854775783 AS fp,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM lineitem
)
SELECT 'orders' AS table_name, n_rows, CAST(fp AS BIGINT) AS fingerprint FROM o
UNION ALL
SELECT 'lineitem', n_rows, CAST(fp AS BIGINT) FROM l
"""


@register("pipeline_dataset_fingerprint", oracle=_FINGERPRINT_ORACLE, tags=("pipeline",))
def pipeline_dataset_fingerprint(spark, sf_dir):
    """ORDER-INVARIANT dataset fingerprint — the data-versioning
    primitive: each row hashes its key columns to a 60-bit integer
    (md5 prefix) and the table fingerprint is the SUM of row hashes
    mod the largest 63-bit prime. Commutative-associative, so it is
    row-order-proof, partition-layout-proof, and MERGEABLE (shard
    fingerprints add; an incremental pipeline updates it by adding new
    rows' hashes and subtracting deleted ones' — no rescan). Two
    snapshots with equal fingerprints and counts are content-identical
    with overwhelming probability; this is the cheap invariant a
    pipeline pins BEFORE and AFTER a migration/compaction that must
    not change data.

    Plan: pure map-side hash + one 1-row SUM per table (modulo applied
    after — DuckDB promotes the SUM to HUGEINT, Spark stays in long
    with natural wraparound... which would DIVERGE, so the Spark side
    sums into DECIMAL(38) before the shared mod; stated because it is
    the one place the engines' integer-overflow semantics differ)."""
    mod = 9223372036854775783  # largest prime < 2^63

    def fp_of(df, cols, name):
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(
                f"CAST(SUM(CAST(conv(substring(md5(concat_ws('|', {', '.join(cols)})), 1, 15), 16, 10) AS DECIMAL(38,0))) % {mod} AS BIGINT)"
            ).alias("fingerprint"),
        )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("k1"),
        F.col("o_custkey").cast("string").alias("k2"),
        F.col("o_orderstatus").alias("k3"),
        F.round(dec("o_totalprice", MONEY) * 100).cast("long").cast("string").alias("k4"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("k1"),
        F.col("l_partkey").cast("string").alias("k2"),
        F.col("l_linenumber").cast("string").alias("k3"),
        F.round(dec("l_extendedprice", MONEY) * 100).cast("long").cast("string").alias("k4"),
    )
    a = fp_of(orders, ["k1", "k2", "k3", "k4"], "orders")
    b = fp_of(li, ["k1", "k2", "k3", "k4"], "lineitem")
    return a.unionByName(b)


_TEMP_MIX_T = 0.7
_TEMP_MIX_BUDGET = 1000

_TEMP_MIX_ORACLE = f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
), wgt AS (
  SELECT source, n_docs,
         CAST(round(pow(CAST(n_docs AS DOUBLE), {_TEMP_MIX_T}) * 1000000)
              AS BIGINT) AS w_micro
  FROM c
), tot AS (
  SELECT CAST(SUM(w_micro) AS BIGINT) AS w_total,
         CAST(COUNT(*) AS BIGINT) AS n_sources
  FROM wgt
), base AS (
  SELECT wgt.source, wgt.n_docs, wgt.w_micro,
         CAST(wgt.w_micro * {_TEMP_MIX_BUDGET} // tot.w_total AS BIGINT) AS q0,
         CAST(wgt.w_micro * {_TEMP_MIX_BUDGET} % tot.w_total AS BIGINT) AS rem
  FROM wgt, tot
), short AS (
  SELECT CAST({_TEMP_MIX_BUDGET} - SUM(q0) AS BIGINT) AS missing FROM base
), ranked AS (
  SELECT base.*, row_number() OVER (ORDER BY rem DESC, source) AS rk
  FROM base
)
SELECT r.source, r.n_docs, r.w_micro,
       CAST(r.q0 + CASE WHEN r.rk <= s.missing THEN 1 ELSE 0 END AS BIGINT)
         AS quota
FROM ranked r, short s
"""


@register("pipeline_temperature_mixture", oracle=_TEMP_MIX_ORACLE, tags=("pipeline", "llm"))
def pipeline_temperature_mixture(spark, sf_dir):
    """TEMPERATURE-SCALED mixture quotas (the multilingual/multi-source
    sampling rule of mBERT/XLM-R: sample source i proportionally to
    n_i^alpha, alpha = 0.7): big sources are down-weighted, small ones
    boosted, without the starvation of uniform or the domination of
    proportional sampling. Quotas for a 1000-doc budget via
    LARGEST-REMAINDER apportionment — floor quotas plus one extra for
    the largest remainders (tie -> source name), so quotas sum EXACTLY
    to the budget (naive rounding can miss it by |sources|).

    Determinism: the one float (pow) is computed once per source on
    identical integers and rounded to micro-units; the apportionment
    is pure integer DIV/MOD plus a |sources|-row ranking."""
    docs = load_table(spark, sf_dir, "documents").select("source")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    wgt = c.select(
        "source",
        "n_docs",
        F.round(F.pow(F.col("n_docs").cast("double"), _TEMP_MIX_T) * 1_000_000)
        .cast("long")
        .alias("w_micro"),
    )
    tot = wgt.agg(F.sum("w_micro").alias("w_total"))
    base = wgt.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "w_micro",
        F.expr(f"CAST(w_micro * {_TEMP_MIX_BUDGET} DIV w_total AS BIGINT)").alias(
            "q0"
        ),
        F.expr(f"CAST(w_micro * {_TEMP_MIX_BUDGET} % w_total AS BIGINT)").alias(
            "rem"
        ),
    )
    short = base.agg(
        (F.lit(_TEMP_MIX_BUDGET) - F.sum("q0")).cast("long").alias("missing")
    )
    wk = W.orderBy(F.desc("rem"), "source")
    ranked = base.withColumn("rk", F.row_number().over(wk))
    return ranked.crossJoin(F.broadcast(short)).select(
        "source",
        "n_docs",
        "w_micro",
        (
            F.col("q0")
            + F.when(F.col("rk") <= F.col("missing"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota"),
    )


# ---------------------------------------------------------------------------
# Round-7: exact stratified sampling with integer largest-remainder
# quotas — the "10% eval slice, same language mix" curation op.
# ---------------------------------------------------------------------------

_STRAT_PCT = 10  # sample 10% with the stratum mix preserved exactly

_STRAT_ORACLE = f"""
WITH n AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_s FROM documents GROUP BY lang
), tot AS (
  SELECT CAST(SUM(n_s) AS BIGINT) AS n FROM n
), quota AS (
  SELECT lang, n_s,
         n_s // {100 // _STRAT_PCT}
           + CASE WHEN row_number() OVER (ORDER BY n_s % {100 // _STRAT_PCT} DESC,
                                          lang)
                  <= (SELECT n // {100 // _STRAT_PCT} FROM tot)
                     - (SELECT SUM(n_s // {100 // _STRAT_PCT}) FROM n)
                  THEN 1 ELSE 0 END AS q
  FROM n
), ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS r
  FROM documents
)
SELECT ranked.doc_id, ranked.lang
FROM ranked JOIN quota ON quota.lang = ranked.lang
WHERE ranked.r <= quota.q
"""


@register("pipeline_proportional_sample", oracle=_STRAT_ORACLE, tags=("llm", "pipeline", "curation"))
def pipeline_proportional_sample(spark, sf_dir):
    """EXACT stratified 10% sample of the corpus preserving the
    language mix: per-stratum quotas are integer largest-remainder
    (base = n_s DIV 10; the global shortfall vs N DIV 10 goes to the
    largest n_s % 10, ties to the smaller lang) — the same exact-BIGINT
    quota rule as pipeline_token_budget_fill, so the sampled set's size
    is exactly N DIV 10 and each stratum is within 1 of proportional.
    Membership is deterministic: rank within stratum by
    (md5(doc_id), doc_id) — a content-independent uniform order both
    engines compute identically; re-running on the same corpus yields
    the same sample (reproducible eval slices).

    Plan: one keyed count (|strata| rows, broadcast back), quota
    arithmetic on the tiny stratum relation, and the per-stratum rank
    via a partitionBy(lang) row_number — bounded-cardinality strata
    (languages), so no single stratum serializes the corpus; for
    unbounded or heavily skewed strata the two-pass global_index DIV
    per-stratum-offset form (pipeline_epoch_shuffle) is the drop-in."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    step = 100 // _STRAT_PCT
    n = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_s"))
    tot = n.agg(
        F.sum("n_s").cast("long").alias("n"),
        F.sum(F.expr(f"n_s DIV {step}")).cast("long").alias("base_sum"),
    )
    wq = W.orderBy(F.expr(f"n_s % {step}").desc(), F.col("lang"))
    quota = (
        n.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            (
                F.expr(f"n_s DIV {step}")
                + F.when(
                    F.row_number().over(wq)
                    <= F.expr(f"n DIV {step}") - F.col("base_sum"),
                    1,
                ).otherwise(0)
            ).alias("q"),
        )
    )
    wr = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select("doc_id", "lang", F.row_number().over(wr).alias("r"))
    return ranked.join(F.broadcast(quota), "lang").filter(
        F.col("r") <= F.col("q")
    ).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Round-8: rendezvous (HRW) sharding — stable shard assignment with the
# provable minimal-reshuffle property, checked exactly.
# ---------------------------------------------------------------------------

_HRW_K = 8  # baseline shard count; the sweep adds one


_HRW_ORACLE = f"""
WITH shards8 AS (SELECT unnest(generate_series(0, {_HRW_K - 1})) AS shard),
shards9 AS (SELECT unnest(generate_series(0, {_HRW_K})) AS shard),
w8 AS (
  SELECT d.doc_id, s.shard,
         CAST(('0x' || substring(md5('hrw' || CAST(s.shard AS VARCHAR) || ':'
                                      || CAST(d.doc_id AS VARCHAR)), 1, 12))
              AS BIGINT) AS wt
  FROM documents d, shards8 s
), a8 AS (
  SELECT doc_id, shard FROM (
    SELECT doc_id, shard,
           row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, shard) AS r
    FROM w8) WHERE r = 1
), w9 AS (
  SELECT d.doc_id, s.shard,
         CAST(('0x' || substring(md5('hrw' || CAST(s.shard AS VARCHAR) || ':'
                                      || CAST(d.doc_id AS VARCHAR)), 1, 12))
              AS BIGINT) AS wt
  FROM documents d, shards9 s
), a9 AS (
  SELECT doc_id, shard FROM (
    SELECT doc_id, shard,
           row_number() OVER (PARTITION BY doc_id ORDER BY wt DESC, shard) AS r
    FROM w9) WHERE r = 1
), moved AS (
  SELECT a8.doc_id, a9.shard AS new_shard
  FROM a8 JOIN a9 USING (doc_id) WHERE a8.shard <> a9.shard
)
SELECT CAST((SELECT COUNT(*) FROM a8) AS BIGINT) AS n_docs,
       CAST((SELECT COUNT(*) FROM moved) AS BIGINT) AS n_moved,
       (SELECT COUNT(*) FROM moved WHERE new_shard <> {_HRW_K}) = 0
         AS moves_only_to_new_shard,
       CAST((SELECT COUNT(*) FROM moved) * 1000000
            // (SELECT COUNT(*) FROM a8) AS BIGINT) AS moved_ppm
FROM (SELECT 1)
"""


@register("pipeline_rendezvous_sharding", oracle=_HRW_ORACLE, tags=("llm", "pipeline", "scale"))
def pipeline_rendezvous_sharding(spark, sf_dir):
    """RENDEZVOUS (highest-random-weight) sharding (Thaler & Ravishankar
    '98 — the consistent-placement rule behind cache rings and shard
    maps): each document goes to argmax over shards of
    hash(shard, doc) — no ring, no lookup table, any worker recomputes
    any placement independently. The query assigns the corpus to 8
    shards and again to 9, and checks THE property the scheme is
    chosen for, exactly: adding a shard moves documents ONLY to the
    new shard (for a kept shard s, the argmax over a superset that
    didn't win stays the argmax — so nothing re-shuffles between old
    shards, unlike mod-N placement where ~everything moves). Also
    reports the exact moved share in ppm (expectation 1/(k+1) ≈
    111111). Engine-portable md5-prefix weights; per-doc argmax is a
    doc-keyed window (bounded fanout k+1), never single-partition."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def assign(k: int):
        shards = F.explode(F.array(*[F.lit(s) for s in range(k)])).alias(
            "shard"
        )
        wt = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("hrw"),
                        F.col("shard").cast("string"),
                        F.lit(":"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        w = Window.partitionBy("doc_id").orderBy(F.desc("wt"), F.asc("shard"))
        return (
            docs.select("doc_id", shards)
            .select("doc_id", "shard", wt.alias("wt"))
            .withColumn("r", F.row_number().over(w))
            .filter("r = 1")
            .select("doc_id", "shard")
        )

    a8 = assign(_HRW_K)
    a9 = assign(_HRW_K + 1).withColumnRenamed("shard", "new_shard")
    moved = (
        a8.join(a9, "doc_id")
        .filter(F.col("shard") != F.col("new_shard"))
        .select("doc_id", "new_shard")
    )
    return (
        a8.agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(moved.agg(F.count(F.lit(1)).alias("n_moved")))
        .crossJoin(
            moved.filter(F.col("new_shard") != _HRW_K).agg(
                F.count(F.lit(1)).alias("bad_moves")
            )
        )
        .select(
            "n_docs",
            "n_moved",
            (F.col("bad_moves") == 0).alias("moves_only_to_new_shard"),
            F.expr("CAST(n_moved * 1000000 DIV n_docs AS BIGINT)").alias(
                "moved_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Round-8: dataset version diff — snapshot-level change accounting for a
# document corpus.
# ---------------------------------------------------------------------------

_VDIFF_ORACLE = """
WITH v_new AS (
  -- the new snapshot retired the doc_id % 19 = 0 slice
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 19 <> 0
), v_old AS (
  -- the prior snapshot: docs with doc_id % 17 = 0 hadn't been ingested
  -- yet, and docs with doc_id % 13 = 0 had a different (truncated) body
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN md5(substring(text, 1, 40))
              ELSE md5(text) END AS h
  FROM documents WHERE doc_id % 17 <> 0
), j AS (
  SELECT COALESCE(n.doc_id, o.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN n.h <> o.h THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM v_new n FULL OUTER JOIN v_old o ON o.doc_id = n.doc_id
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
FROM j GROUP BY status
"""


@register("pipeline_dataset_version_diff", oracle=_VDIFF_ORACLE, tags=("llm", "pipeline", "cdc"))
def pipeline_dataset_version_diff(spark, sf_dir):
    """DATASET VERSION DIFF — the snapshot-level change accounting a
    corpus registry runs between two dataset versions (added / removed
    / changed / unchanged, by content hash): the document-corpus
    sibling of cdc_snapshot_diff (which diffs a keyed changelog). The
    'old' version is derived deterministically from the fixture (a
    1/17 slice not yet ingested; a 1/13 slice with a truncated body),
    so the diff exercises all four statuses at every SF. Plan: content
    hash per side (one projection each — at 100 TB the hash rides the
    ingest write and this query never rescans text), one full outer
    join on the id, one rollup. Exact counts + per-status min id (a
    count-preserving misclassification breaks the hash)."""
    docs = load_table(spark, sf_dir, "documents")
    v_new = docs.filter(F.pmod("doc_id", F.lit(19)) != 0).select(
        "doc_id", F.md5("text").alias("h")
    )
    v_old = docs.filter(F.pmod("doc_id", F.lit(17)) != 0).select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(13)) == 0,
            F.md5(F.substring("text", 1, 40)),
        )
        .otherwise(F.md5("text"))
        .alias("h"),
    )
    j = v_new.withColumnRenamed("h", "hn").join(
        v_old.withColumnRenamed("h", "ho").withColumnRenamed(
            "doc_id", "old_id"
        ),
        v_new.doc_id == F.col("old_id"),
        "full_outer",
    )
    status = (
        F.when(F.col("old_id").isNull(), "added")
        .when(F.col("doc_id").isNull(), "removed")
        .when(F.col("hn") != F.col("ho"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(
            F.coalesce(F.col("doc_id"), F.col("old_id")).alias("doc_id"),
            status.alias("status"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("long").alias("first_doc_id"),
        )
    )


_KEEP_BEST_ORACLE = """
WITH f AS (
  SELECT doc_id, source,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           AS fp,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         len(string_split(text, ' ')) AS n_toks
  FROM documents
), ranked AS (
  SELECT fp, doc_id, source, n_distinct, n_toks,
         row_number() OVER (PARTITION BY fp
                            ORDER BY n_distinct DESC, n_toks DESC, doc_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY fp) AS n_members
  FROM f
)
SELECT fp, doc_id AS keep_id, source AS keep_source,
       CAST(n_distinct AS BIGINT) AS best_distinct_tokens,
       CAST(n_toks AS BIGINT) AS best_len,
       CAST(n_members AS BIGINT) AS n_members
FROM ranked WHERE rn = 1 AND n_members >= 2
"""


@register("pipeline_dedup_keep_best", oracle=_KEEP_BEST_ORACLE, tags=("llm", "pipeline", "dedup"))
def pipeline_dedup_keep_best(spark, sf_dir):
    """QUALITY-AWARE canonical selection: within each near-dup family
    (tier-2 token-set fingerprint), keep the member with the richest
    content — most distinct tokens, then longest, then smallest id —
    instead of the arbitrary min-id the plain dedup tiers use
    (dedup_canonical_docs). This is how production curation actually
    resolves families: near-dups differ by truncation/boilerplate, and
    min-id happily keeps the truncated one. The argmax is a
    row_number over the family key with a TOTAL deterministic order
    (exact integer quality axes; no floats anywhere); singleton
    families are excluded (nothing to resolve). One fingerprint
    shuffle + one windowed pass over it — same partitioning, no
    second shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    f = docs.select(
        "doc_id",
        "source",
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias("fp"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.size(toks).cast("long").alias("n_toks"),
    )
    w = W.partitionBy("fp").orderBy(
        F.desc("n_distinct"), F.desc("n_toks"), F.asc("doc_id")
    )
    return (
        f.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(W.partitionBy("fp")).cast("long"))
        .filter((F.col("rn") == 1) & (F.col("n_members") >= 2))
        .select(
            "fp",
            F.col("doc_id").alias("keep_id"),
            F.col("source").alias("keep_source"),
            F.col("n_distinct").alias("best_distinct_tokens"),
            F.col("n_toks").alias("best_len"),
            "n_members",
        )
    )


_SHARD_PLAN_ORACLE = """
WITH s AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(MAX(n_chars) AS BIGINT) AS max_doc_bytes
  FROM documents GROUP BY source
)
SELECT source, total_bytes, n_docs,
       CAST((total_bytes + 4095) // 4096 AS BIGINT) AS n_shards,
       CAST(total_bytes // ((total_bytes + 4095) // 4096) AS BIGINT)
         AS avg_shard_bytes,
       (max_doc_bytes > 4096) AS has_oversize_doc
FROM s
"""


@register("pipeline_shard_size_planner", oracle=_SHARD_PLAN_ORACLE, tags=("llm", "pipeline"))
def pipeline_shard_size_planner(spark, sf_dir):
    """Writer SHARD PLANNING: per source, the number of output shards
    a 4 KiB target-shard-size implies (ceil division), the resulting
    mean shard fill, and whether any single document exceeds the
    target (the row a writer cannot split — it must either raise the
    shard size or overflow one file). This is the maxRecordsPerFile /
    target-file-size calculation every bulk writer runs BEFORE the
    shuffle that enforces it (pipeline_zorder_layout and
    write_bucketed consume exactly this kind of plan); at 100 TB
    getting it wrong is the difference between 10k balanced files and
    one 2 TB straggler. Exact integer ceil/floor arithmetic
    throughout; one map-side-combinable rollup."""
    docs = load_table(spark, sf_dir, "documents")
    target = 4096
    s = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("total_bytes"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("n_chars").cast("long").alias("max_doc_bytes"),
    )
    n_shards = F.expr(f"(total_bytes + {target - 1}) DIV {target}")
    return s.select(
        "source",
        "total_bytes",
        "n_docs",
        n_shards.cast("long").alias("n_shards"),
        F.expr(
            f"total_bytes DIV ((total_bytes + {target - 1}) DIV {target})"
        ).cast("long").alias("avg_shard_bytes"),
        (F.col("max_doc_bytes") > target).alias("has_oversize_doc"),
    )


# ---------------------------------------------------------------------------
# Multi-round distributed BPE trainer (round 11 — VERDICT r10 task #5)
# ---------------------------------------------------------------------------

_BPE_K = 6


def _bpe_train_oracle(k: int) -> str:
    """Unrolled k-round BPE training in DuckDB SQL (the r10 sketch-proof
    pattern: the oracle replays every maintenance round in plain SQL and
    never sees the Spark loop). Each word is carried as a wrapped symbol
    string `|s1||s2||...|`; applying merge (l, r) is the literal replace
    of `|l||r|` by `|lr|`, whose leftmost-non-overlapping scan is
    EXACTLY the BPE merge rule in both engines."""
    parts = [
        """w0 AS (
  SELECT regexp_replace(w, '(.)', '|\\1|', 'g') AS wr,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) >= 2 GROUP BY w
)"""
    ]
    for r in range(1, k + 1):
        parts.append(f"""p{r} AS (
  SELECT unnest(list_transform(range(1, len(syms)),
                i -> syms[i] || ' ' || syms[i + 1])) AS pr, cnt
  FROM (SELECT string_split(substring(wr, 2, length(wr) - 2), '||') AS syms,
               cnt
        FROM w{r - 1}) t
  WHERE len(syms) >= 2
), m{r} AS (
  SELECT CAST({r} AS BIGINT) AS rnd,
         string_split(pr, ' ')[1] AS left_sym,
         string_split(pr, ' ')[2] AS right_sym,
         string_split(pr, ' ')[1] || string_split(pr, ' ')[2] AS merged,
         CAST(SUM(cnt) AS BIGINT) AS pair_count
  FROM p{r} GROUP BY pr
  ORDER BY pair_count DESC, pr LIMIT 1
), w{r} AS (
  SELECT replace(wr, '|' || m.left_sym || '||' || m.right_sym || '|',
                     '|' || m.merged || '|') AS wr, cnt
  FROM w{r - 1}, m{r} m
)""")
    selects = " UNION ALL ".join(
        f"SELECT rnd, left_sym, right_sym, merged, pair_count FROM m{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects


@register(
    "pipeline_bpe_train_k_rounds",
    oracle=_bpe_train_oracle(_BPE_K),
    tags=("llm", "pipeline", "text"),
)
def pipeline_bpe_train_k_rounds(spark, sf_dir):
    """The REAL tokenizer-training loop (VERDICT r10 task #5): k=6
    sequential BPE merge rounds with pair re-counting after each applied
    merge — `pipeline_bpe_merge_step` is one iteration of this
    (Sennrich et al., ACL'16). Emits the learned merge table
    (rnd, left_sym, right_sym, merged, pair_count).

    Distributed design, per round:
      1. the corpus is collapsed ONCE to word TYPES with counts (the
         classic BPE dictionary trick — pair statistics are identical,
         and the relation the loop iterates on is |vocab|-sized, not
         corpus-sized);
      2. each word rides as a wrapped symbol string `|s1||s2||...|`;
         pair counts come from a map-side explode of adjacent symbol
         pairs weighted by the word count, into ONE map-side-combinable
         groupBy whose key cardinality is bounded by the live symbol
         alphabet squared — a few-KB shuffle regardless of corpus size;
      3. the argmax merge (count DESC, then pair string — the ' '
         separator sorts below [a-z], so string order == (left, right)
         tuple order) is a 1-row collect (bounded driver state, like
         the sketch-budget bookkeeping in sketchq.py);
      4. applying the merge is a LITERAL `replace('|l||r|', '|lr|')` —
         leftmost-non-overlapping in Spark and DuckDB alike, which IS
         the BPE merge scan; map-side, no shuffle.
    At 100 TB only step 1 touches the corpus (one shuffle on the word
    key); all k rounds run on the collapsed type table. The oracle
    unrolls all 6 rounds in SQL; tests/test_round11_refs.py proves the
    loop against a pure-Python BPE trainer on a hand corpus.

    The fixture alphabet is [a-z ] (TESTDATA.md), so '|' never collides
    with a symbol; words shorter than 2 chars carry no pairs and are
    dropped from the type table up front."""
    docs = load_table(spark, sf_dir, "documents")
    merges, _, wt = _bpe_train_spark(docs, _BPE_K)
    wt.unpersist()
    return spark.createDataFrame(
        merges,
        "rnd long, left_sym string, right_sym string, merged string,"
        " pair_count long",
    )


def _bpe_train_spark(
    docs, k: int, keep_word: bool = False, stop_vocab: int | None = None
):
    """The shared BPE training loop (see pipeline_bpe_train_k_rounds for
    the plan discussion). Returns (merges, final word-type DataFrame,
    the cached base relation for the caller to unpersist). With
    ``keep_word`` the original word string rides along so the trained
    state can be joined back to the corpus (the encode pass). With
    ``stop_vocab`` the loop STOPS once the vocabulary (base alphabet of
    the word-type table + one new symbol per executed merge) reaches
    that size — the production stopping rule (round 13); ``k`` then
    bounds the unroll, and merges gain a sixth element
    vocab_size_after."""
    cols = ["w"] if keep_word else []
    wt = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            *cols, F.regexp_replace("w", "(.)", r"|$1|").alias("wr"), "cnt"
        )
        .cache()
    )
    base_n = None
    if stop_vocab is not None:
        base_n = (
            wt.select(
                F.explode(F.split(F.regexp_replace("wr", r"\|", ""), "")).alias("c")
            )
            .filter(F.col("c") != "")
            .agg(F.count_distinct("c").alias("bn"))
            .collect()[0]["bn"]
        )
    merges: list = []
    cur = wt
    for rnd in range(1, k + 1):
        if stop_vocab is not None and base_n + len(merges) >= stop_vocab:
            break
        pairs = (
            cur.withColumn(
                "syms",
                F.split(
                    F.expr("substring(wr, 2, length(wr) - 2)"), r"\|\|"
                ),
            )
            # size(syms) == 1 must be dropped BEFORE the transform: Spark's
            # sequence(1, 0) is the DESCENDING [1, 0] (DuckDB's range(1, 1)
            # is empty), which would emit null pairs for fully-merged words.
            .filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), i ->"
                        " concat(syms[i - 1], ' ', syms[i]))"
                    )
                ).alias("pr"),
                "cnt",
            )
        )
        best = (
            pairs.groupBy("pr")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("pr"))
            .limit(1)
            .collect()
        )
        if not best:  # degenerate corpus: no adjacent pairs left
            break
        left, right = best[0]["pr"].split(" ")
        row = (rnd, left, right, left + right, int(best[0]["n"]))
        if stop_vocab is not None:
            row = row + (int(base_n) + rnd,)
        merges.append(row)
        cur = cur.select(
            *cols,
            F.expr(
                f"replace(wr, '|{left}||{right}|', '|{left}{right}|')"
            ).alias("wr"),
            "cnt",
        )
    return merges, cur, wt


def _bpe_apply_chain(k: int) -> str:
    """The shared unrolled train-then-encode CTE chain (word string
    carried through all k merge rounds, ending at the `wmap` word ->
    token-count relation). Used by _bpe_apply_oracle (per-source
    compression) and _bpe_fertility_oracle (per-language fertility)."""
    parts = [
        """w0 AS (
  SELECT w, regexp_replace(w, '(.)', '|\\1|', 'g') AS wr,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) >= 2 GROUP BY w
)"""
    ]
    for r in range(1, k + 1):
        parts.append(f"""p{r} AS (
  SELECT unnest(list_transform(range(1, len(syms)),
                i -> syms[i] || ' ' || syms[i + 1])) AS pr, cnt
  FROM (SELECT string_split(substring(wr, 2, length(wr) - 2), '||') AS syms,
               cnt
        FROM w{r - 1}) t
  WHERE len(syms) >= 2
), m{r} AS (
  SELECT string_split(pr, ' ')[1] AS left_sym,
         string_split(pr, ' ')[2] AS right_sym
  FROM p{r} GROUP BY pr
  ORDER BY SUM(cnt) DESC, pr LIMIT 1
), w{r} AS (
  SELECT w, replace(wr, '|' || m.left_sym || '||' || m.right_sym || '|',
                        '|' || m.left_sym || m.right_sym || '|') AS wr, cnt
  FROM w{r - 1}, m{r} m
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
wmap AS (
  SELECT w, CAST(len(string_split(substring(wr, 2, length(wr) - 2), '||'))
                 AS BIGINT) AS n_tok
  FROM w{k}
)"""
    )


def _bpe_apply_oracle(k: int) -> str:
    """Unrolled train-then-ENCODE in DuckDB SQL: the same k-round chain
    as _bpe_train_oracle but carrying the word string, then the corpus
    re-tokenized through the final vocabulary and rolled up by
    source."""
    return (
        _bpe_apply_chain(k)
        + """,
allw AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
rep AS (
  SELECT source, length(allw.w) AS n_chars, COALESCE(wmap.n_tok, 1) AS n_tok
  FROM allw LEFT JOIN wmap ON wmap.w = allw.w
  WHERE length(allw.w) >= 1
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       (1000000 * CAST(SUM(n_tok) AS BIGINT)) // CAST(SUM(n_chars) AS BIGINT)
         AS tokens_per_million_chars
FROM rep GROUP BY source"""
    )


@register(
    "pipeline_bpe_apply_encode",
    oracle=_bpe_apply_oracle(_BPE_K),
    tags=("llm", "pipeline", "text"),
)
def pipeline_bpe_apply_encode(spark, sf_dir):
    """Train-then-ENCODE — the second half of the tokenizer lifecycle:
    the k=6 merges learned by the shared loop are applied to the word-
    type table, and the corpus is re-tokenized through the resulting
    vocabulary, reporting per-source compression (words, chars, encoded
    tokens, and the exact integer tokens_per_million_chars rate — char-
    level tokenization would score 1,000,000).

    Scale shape: training touches the corpus once (the word-type
    collapse); ENCODING is a broadcast-size join — the trained type
    table is |vocab| rows, so re-tokenizing 100 TB is a map-side hash
    join of words against the vocabulary plus one map-side-combinable
    per-source rollup. No per-round pass over the corpus ever happens.
    Words shorter than 2 chars encode as themselves (n_tok = 1), the
    LEFT JOIN's COALESCE arm in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    _, final, wt = _bpe_train_spark(docs, _BPE_K, keep_word=True)
    wmap = final.select(
        "w",
        F.size(
            F.split(F.expr("substring(wr, 2, length(wr) - 2)"), r"\|\|")
        ).cast("long").alias("n_tok"),
    )
    allw = (
        docs.select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 1)
    )
    rep = (
        allw.join(F.broadcast(wmap), "w", "left")
        .select(
            "source",
            F.length("w").alias("n_chars"),
            F.coalesce("n_tok", F.lit(1)).alias("n_tok"),
        )
    )
    out = (
        rep.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "tokens_per_million_chars",
            F.expr("(1000000 * n_tokens) DIV n_chars"),
        )
    )
    wt.unpersist()
    return out


def _bpe_fertility_oracle(k: int) -> str:
    """Train-then-encode chain + per-LANGUAGE fertility rollup."""
    return (
        _bpe_apply_chain(k)
        + """,
allw AS (
  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
),
rep AS (
  SELECT lang, length(allw.w) AS n_chars, COALESCE(wmap.n_tok, 1) AS n_tok
  FROM allw LEFT JOIN wmap ON wmap.w = allw.w
  WHERE length(allw.w) >= 1
),
d AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang
),
r AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         CAST(SUM(n_tok) AS BIGINT) AS n_bpe_tokens
  FROM rep GROUP BY lang
)
SELECT r.lang, d.n_docs, r.n_words, r.n_chars, r.n_bpe_tokens,
       (1000 * r.n_bpe_tokens) // r.n_words AS fertility_milli,
       (1000 * r.n_chars) // r.n_bpe_tokens AS bytes_per_bpe_token_milli,
       (1000000 * r.n_bpe_tokens) // r.n_chars AS tokens_per_million_chars
FROM r JOIN d USING (lang)"""
    )


@register(
    "pipeline_bpe_fertility_eval",
    oracle=_bpe_fertility_oracle(_BPE_K),
    tags=("llm", "pipeline", "text"),
)
def pipeline_bpe_fertility_eval(spark, sf_dir):
    """Tokenizer-training loop CLOSED against the eval stack (VERDICT
    r11 task #6): fertility is measured under the LEARNED k=6 BPE
    merges, not whitespace tokens — the r9 pipeline_tokenizer_fertility
    report recomputed with the trained vocabulary. Per language:
    document/word/byte volumes, BPE token count, fertility (BPE tokens
    per word, exact milli ratio — whitespace tokenization scores
    exactly 1000, so anything above it quantifies subword splitting),
    bytes-per-BPE-token, and tokens-per-million-chars (char-level
    tokenization would score 1,000,000). This is the number that
    decides whether the TRAINED tokenizer starves a language of
    effective context.

    Scale shape: identical to pipeline_bpe_apply_encode — training
    collapses the corpus ONCE to word types; encoding is a broadcast
    hash join of the |vocab|-row trained table against one corpus
    scan; the rollup is map-side combinable on |langs| keys. The
    oracle unrolls all 6 training rounds plus the encode join in one
    SQL statement (the pipeline.py:1629 precedent)."""
    docs = load_table(spark, sf_dir, "documents")
    _, final, wt = _bpe_train_spark(docs, _BPE_K, keep_word=True)
    wmap = final.select(
        "w",
        F.size(
            F.split(F.expr("substring(wr, 2, length(wr) - 2)"), r"\|\|")
        ).cast("long").alias("n_tok"),
    )
    allw = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 1)
    )
    rep = allw.join(F.broadcast(wmap), "w", "left").select(
        "lang",
        F.length("w").alias("n_chars"),
        F.coalesce("n_tok", F.lit(1)).alias("n_tok"),
    )
    d = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    r = rep.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.sum("n_tok").cast("long").alias("n_bpe_tokens"),
    )
    out = (
        r.join(d, "lang")
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_chars",
            "n_bpe_tokens",
            F.expr("(1000 * n_bpe_tokens) DIV n_words").alias(
                "fertility_milli"
            ),
            F.expr("(1000 * n_chars) DIV n_bpe_tokens").alias(
                "bytes_per_bpe_token_milli"
            ),
            F.expr("(1000000 * n_bpe_tokens) DIV n_chars").alias(
                "tokens_per_million_chars"
            ),
        )
    )
    wt.unpersist()
    return out


# ---------------------------------------------------------------------------
# Round 13: BPE training driven to a TARGET VOCABULARY SIZE.
# ---------------------------------------------------------------------------

#: production stopping rule: train until |vocab| = base alphabet + one
#: symbol per merge reaches this size (fixture alphabet is [a-z], so
#: 14 merges execute), bounded by _BPE_V_UNROLL guarded rounds — the
#: extra guarded rounds exercise the stop condition in BOTH engines.
_BPE_V = 40
_BPE_V_UNROLL = 20


def _bpe_train_to_vocab_oracle(v: int, max_rounds: int) -> str:
    """Unrolled vocab-driven BPE training in DuckDB SQL: the
    _bpe_train_oracle chain with every round GUARDED by the running
    vocabulary size (base alphabet + rounds executed so far < V). A
    guarded-off round yields an empty merge row and passes the word
    state through unchanged (LEFT JOIN identity arm), which is exactly
    the Spark loop's break."""
    parts = [
        """w0 AS MATERIALIZED (
  SELECT regexp_replace(w, '(.)', '|\\1|', 'g') AS wr,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) >= 2 GROUP BY w
),
basen AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT c) AS BIGINT) AS bn
  FROM (SELECT unnest(regexp_extract_all(replace(wr, '|', ''), '.')) AS c
        FROM w0)
)"""
    ]
    for r in range(1, max_rounds + 1):
        parts.append(f"""p{r} AS (
  SELECT unnest(list_transform(range(1, len(syms)),
                i -> syms[i] || ' ' || syms[i + 1])) AS pr, cnt
  FROM (SELECT string_split(substring(wr, 2, length(wr) - 2), '||') AS syms,
               cnt
        FROM w{r - 1}) t
  WHERE len(syms) >= 2
), m{r} AS MATERIALIZED (
  SELECT CAST({r} AS BIGINT) AS rnd,
         string_split(pr, ' ')[1] AS left_sym,
         string_split(pr, ' ')[2] AS right_sym,
         string_split(pr, ' ')[1] || string_split(pr, ' ')[2] AS merged,
         CAST(SUM(cnt) AS BIGINT) AS pair_count
  FROM p{r}, basen
  WHERE basen.bn + {r - 1} < {v}
  GROUP BY pr
  ORDER BY pair_count DESC, pr LIMIT 1
), w{r} AS MATERIALIZED (
  SELECT CASE WHEN m.left_sym IS NULL THEN t.wr
         ELSE replace(t.wr, '|' || m.left_sym || '||' || m.right_sym || '|',
                            '|' || m.merged || '|') END AS wr,
         t.cnt
  FROM w{r - 1} t LEFT JOIN m{r} m ON 1 = 1
)""")
    selects = " UNION ALL ".join(
        f"SELECT rnd, left_sym, right_sym, merged, pair_count,"
        f" basen.bn + {r} AS vocab_size_after FROM m{r}, basen"
        for r in range(1, max_rounds + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects


@register(
    "pipeline_bpe_train_to_vocab",
    oracle=_bpe_train_to_vocab_oracle(_BPE_V, _BPE_V_UNROLL),
    tags=("llm", "pipeline", "text"),
)
def pipeline_bpe_train_to_vocab(spark, sf_dir):
    """BPE training with the PRODUCTION stopping rule (VERDICT r12
    task #4): merges run until the vocabulary — base alphabet of the
    word-type table plus one new symbol per executed merge — reaches
    the target size V=40, not a fixed round count (k=6 was the r11
    declared contract; real tokenizer training stops at a vocab
    budget). Emits the learned merge table with the running vocabulary
    size: (rnd, left_sym, right_sym, merged, pair_count,
    vocab_size_after). The base alphabet is a CENSUS of the word-type
    table (24-26 symbols on the fixtures, SF-dependent), so V minus
    that census merges execute; the SQL oracle unrolls 20 GUARDED
    rounds — the rounds past the stop are disabled by the vocab
    condition in both engines, so the stopping rule itself is part of
    the value hash. The first 6 rows extend pipeline_bpe_train_k_rounds
    exactly (pinned in tests/test_round13_refs.py together with the
    extended pure-Python proof).

    Scale shape: unchanged from pipeline_bpe_train_k_rounds — the
    corpus collapses ONCE to word types (the only corpus-sized
    shuffle); the base-alphabet census is one pass over that collapsed
    relation; every round is a bounded-key pair groupBy + 1-row argmax
    collect + map-side literal replace. Stopping at vocab size adds
    zero distributed work: the driver tracks |base| + #merges."""
    docs = load_table(spark, sf_dir, "documents")
    merges, _, wt = _bpe_train_spark(
        docs, _BPE_V_UNROLL, stop_vocab=_BPE_V
    )
    wt.unpersist()
    return spark.createDataFrame(
        merges,
        "rnd long, left_sym string, right_sym string, merged string,"
        " pair_count long, vocab_size_after long",
    )
