"""The full curation DAG composed end-to-end (VERDICT r11 task #2) —
the production pipeline a 100 TB training-data run actually executes,
as ONE driver-hashed query:

    exact dedup -> containment dedup -> MinHash-LSH dedup ->
    SemDeDup (embedding) -> Bloom decontamination ->
    quality + language filter -> water-filling token quota ->
    greedy sequence packing

Every stage handoff is pinned by (n_in, n_dropped, n_out,
survivor_id_sum) plus one stage-specific auxiliary observable, so a
single document leaking through (or over-dropped by) ANY stage breaks
the value hash — the single query that proves the engine is a
pipeline, not a query zoo. Each stage is an already-probed registry
operator; the DuckDB oracle replays the ENTIRE chain (all eight
stages and seven survivor handoffs) in one WITH RECURSIVE statement,
reusing the shared canonical fragments from the per-stage oracles.

Reference provenance: the reference repo has no curation pipeline at
all (its surface is 151 lines of CDC plumbing — SURVEY.md §2); this
composition is the BASELINE.json north star ("add the
LLM-data-pipeline operators ... design every operator for 100 TB
scale") assembled into the shape production corpus builds take
(Gopher/RefinedWeb-style staged filtering; SemDeDup per Abbas et al.
2023).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup, text
from ..operators.curation_stages import (
    stage4_semdedup,
    stage5_decontam,
    stage6_quality,
    stage7_waterfill,
    stage8_pack,
    stage_row,
)
from ..streaming import await_done
from ..tables import load_table
from . import register
from .curation import _BDC_K, _BDC_M, _BDC_N, _PACK_BUDGET, _PACK_SHARDS
from .llm_ops import _TIERS_ORACLE
from .llm_ops4 import _SEMDEDUP_ORACLE

# Single source of truth shared with the streaming ingest gate
# (ADVICE r12: duplicated literals would silently diverge the
# foreachBatch drive from the DuckDB oracle this file interpolates
# it into).
from ..streaming.curation import QUALITY_MIN as _QUALITY_MIN

# ---------------------------------------------------------------------------
# Oracle assembly — reuse the already-driver-hashed per-stage fragments.
# ---------------------------------------------------------------------------

# Stages 1-3: the dedup-tier chain (n0, fam0, r1, t2, sh2, dom2, s2,
# r2, <LSH pipe on s2>, dom3, s3, r3) is exactly _TIERS_ORACLE's CTE
# list — slice it out of that statement (anchor-asserted so oracle
# drift fails loudly, the _MH_PIPE_ON_S2 discipline).
_T_HEAD = "\nWITH "
_T_TAIL = "\nSELECT * FROM r1 UNION ALL"
assert _TIERS_ORACLE.startswith(_T_HEAD) and _T_TAIL in _TIERS_ORACLE, (
    "_TIERS_ORACLE shape changed — re-point the curation-e2e slice"
)
_TIER_CTES = _TIERS_ORACLE[len(_T_HEAD) : _TIERS_ORACLE.index(_T_TAIL)]

# Stage 4: the SemDeDup chain (canon .. best) from _SEMDEDUP_ORACLE,
# re-scoped from the full embeddings table to the stage-3 survivors
# (vec_id = doc_id on the fixtures — TESTDATA.md; docs without an
# embedding pass through untouched, exactly like production rows whose
# embedding shard is missing).
_SD_HEAD = "\nWITH "
_SD_TAIL = "\nSELECT CAST(cell_id AS BIGINT) AS cell_id,"
assert _SEMDEDUP_ORACLE.startswith(_SD_HEAD) and _SD_TAIL in _SEMDEDUP_ORACLE
_SD_CTES = _SEMDEDUP_ORACLE[
    len(_SD_HEAD) : _SEMDEDUP_ORACLE.index(_SD_TAIL)
]
_SD_CTES_ON_S3 = _SD_CTES.replace(
    "FROM embeddings GROUP BY embedding",
    "FROM (SELECT e.* FROM embeddings e JOIN s3 ON s3.doc_id = e.vec_id)"
    " GROUP BY embedding",
)
assert _SD_CTES_ON_S3 != _SD_CTES, (
    "SemDeDup oracle anchor 'FROM embeddings GROUP BY embedding' not"
    " found — re-point the stage-4 re-scope"
)

# Stage 6 score/argmax SQL generated from the SAME stopword lists the
# Spark operator uses (the _langid_oracle pattern, llm_ops.py).
_LANGS = list(text.LANG_STOPWORDS)
_QF_SCORES = ",\n         ".join(
    "len(list_filter(toks, t -> t IN ({}))) AS score_{}".format(
        ", ".join(repr(w) for w in words), lang
    )
    for lang, words in text.LANG_STOPWORDS.items()
)
_QF_CASES = []
for _i, _lang in enumerate(_LANGS[:-1]):
    _conds = " AND ".join(
        f"score_{_lang} >= score_{_o}" for _o in _LANGS[_i + 1 :]
    )
    _QF_CASES.append(f"WHEN {_conds} THEN '{_lang}'")
_QF_PRED = "CASE " + " ".join(_QF_CASES) + f" ELSE '{_LANGS[-1]}' END"
_EN_STOPS = ", ".join(repr(w) for w in text.LANG_STOPWORDS["en"])

_E2E_ORACLE = f"""
WITH RECURSIVE {_TIER_CTES},
{_SD_CTES_ON_S3},
sd_pruned AS (SELECT cell_id, dropped_id FROM best WHERE rn = 1),
sd_drop AS (SELECT DISTINCT dropped_id AS doc_id FROM sd_pruned),
s4 AS (SELECT doc_id FROM s3
       WHERE doc_id NOT IN (SELECT doc_id FROM sd_drop)),
r4 AS (
  SELECT CAST(4 AS BIGINT) AS stage,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_in,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM sd_drop) AS n_dropped,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s4) AS n_out,
         (SELECT CAST(SUM(doc_id) AS BIGINT) FROM s4) AS survivor_id_sum,
         (SELECT CAST(COUNT(DISTINCT cell_id) AS BIGINT) FROM sd_pruned)
           AS aux
),
cont_b AS (
  SELECT DISTINCT b.doc_id
  FROM sh2 a, sh2 b
  WHERE a.doc_id <> b.doc_id
    AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / CAST(len(a.shingles) AS DOUBLE) >= 0.9 - 1e-9
),
bd_d AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
),
bd_g AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(toks[i:i+{_BDC_N - 1}], ' ') AS gram
  FROM bd_d, UNNEST(generate_series(1, len(toks) - {_BDC_N - 1})) AS t(i)
  WHERE len(toks) >= {_BDC_N}
),
bd_bench AS (SELECT DISTINCT gram FROM bd_g WHERE source = 'src0'),
bd_js AS (SELECT unnest([0, 1, 2, 3]) AS j),
bd_bits AS (
  SELECT DISTINCT
         CAST(('0x' || substring(md5('bdc' || CAST(j AS VARCHAR) || ':'
                                 || gram), 1, 8)) AS BIGINT) % {_BDC_M}
           AS pos
  FROM bd_bench, bd_js
),
bd_cand AS (
  SELECT g.doc_id, g.gram FROM bd_g g JOIN s4 USING (doc_id)
  WHERE g.source <> 'src0'
),
bd_gp AS (
  SELECT doc_id, gram,
         CAST(('0x' || substring(md5('bdc' || CAST(j AS VARCHAR) || ':'
                                 || gram), 1, 8)) AS BIGINT) % {_BDC_M}
           AS pos
  FROM bd_cand, bd_js
),
bd_susp AS (
  SELECT doc_id, gram FROM bd_gp JOIN bd_bits USING (pos)
  GROUP BY doc_id, gram HAVING COUNT(*) = {_BDC_K}
),
bd_flag AS (SELECT DISTINCT doc_id FROM bd_susp),
bd_conf AS (
  SELECT DISTINCT s.doc_id FROM bd_susp s JOIN bd_bench b USING (gram)
),
s5 AS (SELECT doc_id FROM s4
       WHERE doc_id NOT IN (SELECT doc_id FROM bd_conf)),
r5 AS (
  SELECT CAST(5 AS BIGINT) AS stage,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s4) AS n_in,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM bd_conf) AS n_dropped,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s5) AS n_out,
         (SELECT CAST(SUM(doc_id) AS BIGINT) FROM s5) AS survivor_id_sum,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM bd_flag) AS aux
),
qf_s AS (
  SELECT d.doc_id, d.lang, string_split(d.text, ' ') AS toks
  FROM documents d JOIN s5 USING (doc_id)
),
qf_m AS (
  SELECT doc_id, lang,
         len(toks) AS n_tokens,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
         CAST(len(list_filter(toks, t -> t IN ({_EN_STOPS})))
              AS DOUBLE) / len(toks) AS stopword_ratio,
         {_QF_SCORES}
  FROM qf_s
),
qf_q AS (
  SELECT doc_id, lang,
         round((CASE WHEN n_tokens BETWEEN 20 AND 200 THEN 1.0
                     WHEN n_tokens > 200 THEN 0.5 ELSE 0.25 END) * 0.4
               + ttr * 0.3
               + (CASE WHEN stopword_ratio > 0 THEN 1.0 ELSE 0.0 END)
                 * 0.3, 5) AS quality_score,
         {_QF_PRED} AS pred_lang
  FROM qf_m
),
s6 AS (SELECT doc_id FROM qf_q
       WHERE quality_score >= {_QUALITY_MIN} AND pred_lang = lang),
r6 AS (
  SELECT CAST(6 AS BIGINT) AS stage,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s5) AS n_in,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s5)
           - (SELECT CAST(COUNT(*) AS BIGINT) FROM s6) AS n_dropped,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s6) AS n_out,
         (SELECT CAST(SUM(doc_id) AS BIGINT) FROM s6) AS survivor_id_sum,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM qf_q
          WHERE quality_score < {_QUALITY_MIN}) AS aux
),
wf_tok AS (
  SELECT d.doc_id, d.source,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
  FROM documents d JOIN s6 USING (doc_id)
),
wf_caps AS (
  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS cap
  FROM wf_tok GROUP BY source
),
wf_t AS (
  SELECT CAST(SUM(cap) * 6 // 10 AS BIGINT) AS budget,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM wf_caps
),
wf_r AS (
  SELECT source, cap,
         row_number() OVER (ORDER BY cap, source) AS i,
         SUM(cap) OVER (ORDER BY cap, source) AS p_i
  FROM wf_caps
),
wf_lvl AS (
  SELECT MAX(CASE WHEN cap * (wf_t.k - i) + p_i <= wf_t.budget
             THEN i ELSE 0 END) AS i_star
  FROM wf_r, wf_t
),
wf_sol AS (
  SELECT CAST((wf_t.budget - COALESCE(
                 (SELECT p_i FROM wf_r, wf_lvl WHERE wf_r.i = wf_lvl.i_star),
                 0))
              // (wf_t.k - wf_lvl.i_star) AS BIGINT) AS level
  FROM wf_t, wf_lvl
),
wf_alloc AS (
  SELECT source, LEAST(cap, (SELECT level FROM wf_sol)) AS allocation
  FROM wf_caps
),
wf_cum AS (
  SELECT doc_id, source, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
  FROM wf_tok
),
s7 AS (
  SELECT c.doc_id FROM wf_cum c JOIN wf_alloc a USING (source)
  WHERE c.cum <= a.allocation
),
r7 AS (
  SELECT CAST(7 AS BIGINT) AS stage,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s6) AS n_in,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s6)
           - (SELECT CAST(COUNT(*) AS BIGINT) FROM s7) AS n_dropped,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s7) AS n_out,
         (SELECT CAST(SUM(doc_id) AS BIGINT) FROM s7) AS survivor_id_sum,
         (SELECT CAST(level AS BIGINT) FROM wf_sol) AS aux
),
pk_toks AS (
  SELECT source, doc_id % {_PACK_SHARDS} AS shard, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         row_number() OVER (PARTITION BY source, doc_id % {_PACK_SHARDS}
                            ORDER BY doc_id) AS rn
  FROM documents JOIN s7 USING (doc_id)
),
pk_pack AS (
  SELECT source, shard, doc_id, rn, n_tok,
         CAST(0 AS BIGINT) AS bin_id, n_tok AS fill
  FROM pk_toks WHERE rn = 1
  UNION ALL
  SELECT t.source, t.shard, t.doc_id, t.rn, t.n_tok,
         CASE WHEN p.fill + t.n_tok <= {_PACK_BUDGET}
              THEN p.bin_id ELSE p.bin_id + 1 END,
         CASE WHEN p.fill + t.n_tok <= {_PACK_BUDGET}
              THEN p.fill + t.n_tok ELSE t.n_tok END
  FROM pk_pack p
  JOIN pk_toks t ON t.source = p.source AND t.shard = p.shard
                AND t.rn = p.rn + 1
),
pk_bins AS (
  SELECT source, shard, CAST(MAX(bin_id) + 1 AS BIGINT) AS bins
  FROM pk_pack GROUP BY source, shard
),
r8 AS (
  SELECT CAST(8 AS BIGINT) AS stage,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s7) AS n_in,
         CAST(0 AS BIGINT) AS n_dropped,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s7) AS n_out,
         (SELECT CAST(SUM(doc_id) AS BIGINT) FROM s7) AS survivor_id_sum,
         (SELECT CAST(SUM(bins) AS BIGINT) FROM pk_bins) AS aux
),
names(stage, stage_name) AS (
  VALUES (1, 'exact'), (2, 'containment'), (3, 'minhash_lsh'),
         (4, 'semdedup'), (5, 'decontam'), (6, 'quality_lang'),
         (7, 'quota_waterfill'), (8, 'pack')
),
aux123 AS (
  SELECT 1 AS stage,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM (SELECT md5(text) AS h FROM documents
                GROUP BY md5(text) HAVING COUNT(*) > 1)) AS aux
  UNION ALL
  SELECT 2, (SELECT CAST(COUNT(*) AS BIGINT) FROM cont_b)
  UNION ALL
  SELECT 3, (SELECT CAST(COUNT(*) AS BIGINT)
             FROM (SELECT DISTINCT id_a, id_b FROM cp))
),
rows123 AS (
  SELECT r.tier AS stage, r.n_in, r.n_dropped, r.n_out,
         r.survivor_id_sum, a.aux
  FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
        UNION ALL SELECT * FROM r3) r
  JOIN aux123 a ON a.stage = r.tier
),
allrows AS (
  SELECT * FROM rows123
  UNION ALL SELECT * FROM r4
  UNION ALL SELECT * FROM r5
  UNION ALL SELECT * FROM r6
  UNION ALL SELECT * FROM r7
  UNION ALL SELECT * FROM r8
)
SELECT a.stage, n.stage_name, a.n_in, a.n_dropped, a.n_out,
       a.survivor_id_sum, a.aux
FROM allrows a JOIN names n USING (stage)
"""

# DuckDB inlines CTEs by default; with this many consumers per
# survivor set (and a recursive CTE downstream) the inlined plan
# re-executes whole upstream chains — measured: >20k parquet file
# handles at sf0.001 (EMFILE) before this. Force one evaluation per
# handoff/fragment CTE, mirroring the Spark side's localCheckpoints.
import re as _re

_MAT_CTES = [
    "fam0", "t2", "sh2", "dom2", "s2",
    "fam", "elig", "sh", "mh", "banded", "ranked", "cp", "dom3", "s3",
    "canon", "q", "cent", "terms", "d2", "assign", "v", "v2", "pairs",
    "dups", "directed", "best", "sd_pruned", "sd_drop", "s4", "cont_b",
    "bd_d", "bd_g", "bd_bench", "bd_bits", "bd_cand", "bd_gp",
    "bd_susp", "bd_flag", "bd_conf", "s5",
    "qf_s", "qf_m", "qf_q", "s6",
    "wf_tok", "wf_caps", "wf_r", "wf_lvl", "wf_sol", "wf_alloc",
    "wf_cum", "s7", "pk_toks", "pk_bins",
]
for _n in _MAT_CTES:
    _new = _re.sub(
        rf"(?<![A-Za-z0-9_]){_n} AS \(",
        f"{_n} AS MATERIALIZED (",
        _E2E_ORACLE,
    )
    assert _new != _E2E_ORACLE, f"CTE {_n} not found for MATERIALIZED pin"
    _E2E_ORACLE = _new


@register(
    "pipeline_curation_e2e",
    oracle=_E2E_ORACLE,
    tags=("llm", "dedup", "pipeline", "curation"),
)
def pipeline_curation_e2e(spark, sf_dir):
    """The full production curation DAG, one stage row per handoff:
    (stage, stage_name, n_in, n_dropped, n_out, survivor_id_sum, aux).

    Stages (each an already-probed registry operator; the aux column
    pins a stage-internal observable beyond the survivor set):
      1 exact        — md5 clone collapse to min-id canonicals
                       (aux = number of >1-member clone families);
      2 containment  — asymmetric 3-gram containment c(A->B) >= 0.9,
                       prefix-filtered PPJoin, contained side dropped
                       (aux = distinct CONTAINER docs — the quote-farm
                       census);
      3 minhash_lsh  — banded MinHash-LSH (portable md5 pipe, Jaccard
                       >= 0.5, inline exact verify), larger canonical
                       of each verified pair dropped (aux = verified
                       pair count);
      4 semdedup     — embedding-space SemDeDup (Abbas et al. 2023) on
                       the survivors' vectors (vec_id = doc_id;
                       unembedded docs pass through), keep-the-atypical
                       rule (aux = cells containing >= 1 drop);
      5 decontam     — two-tier Bloom screen (k=4, m=2^18) of non-src0
                       survivors against the src0 benchmark's word
                       8-grams; only Bloom-POSITIVE grams pay the exact
                       verify join, only exact-CONFIRMED docs drop
                       (aux = Bloom-flagged docs — pins FP behavior);
      6 quality_lang — composite quality_score >= 0.5 AND heuristic
                       lang-id agreeing with the recorded label
                       (aux = docs failing the quality bar alone);
      7 quota_waterfill — max-min-fair 60% token budget across sources
                       (closed-form water level over cap-sorted prefix
                       sums), then greedy doc_id-order fill per source
                       up to min(cap, level) (aux = the water level);
      8 pack         — greedy 500-token sequence packing per
                       (source, doc_id % 8) via the Arrow grouped-map
                       kernel (aux = total bins).

    Scale (100 TB): every pairwise stage is collapse-first and
    bucket-bounded (tiers 2-4); the Bloom bits broadcast so the corpus
    is screened map-side; stages 6-8 are scans + bounded-key shuffles.
    Survivor id-sets are localCheckpointed at each handoff — the
    materialization points a production pipeline would persist as
    tables between stages — so each stage computes exactly once
    instead of re-deriving the whole upstream DAG per consumer.
    The DuckDB oracle replays all eight stages in one statement,
    reusing the driver-hashed fragments from pipeline_dedup_tiers
    (_TIERS_ORACLE slice), dedup_semdedup_prune (re-scoped to s3),
    pipeline_bloom_decontaminate, text_quality_score/text_lang_id
    (generated from the same stopword lists),
    pipeline_quota_water_filling, and pipeline_pack_sequences."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # -- stage 1: exact clone collapse
    fam_full = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_members"),
    )
    s1 = fam_full.select("doc_id").localCheckpoint(eager=True)
    aux1 = fam_full.filter(F.col("n_members") > 1).agg(
        F.count(F.lit(1)).cast("long").alias("aux")
    )

    # -- shared shingle handoff for stages 2-3 (optimization r14, guide
    # §2.3): the string 3-gram shingles are derived ONCE from the
    # stage-1 survivors and pinned (one row per eligible canonical —
    # tiny); stage 2 hashes them with xxhash64, stage 3 (on the stage-2
    # survivor subset) with the portable md5 pipe. Previously each
    # stage re-ran tokenize+shingle from the raw corpus. Stage 1
    # already collapsed md5 clones, so docs_s1/docs_s2 are clone-free
    # and the operators' per-stage clone collapse was a no-op
    # (singleton families, empty cliques) — the flat forms are
    # output-identical on this input and skip the collapse groupBy,
    # its pin, and both member-expansion joins per stage.
    docs_s1 = docs.join(s1, "doc_id", "left_semi")
    sh1 = (
        dedup.with_shingles(docs_s1)
        .select("doc_id", "shingles")
        .localCheckpoint(eager=True)
    )

    # -- stage 2: asymmetric containment on canonicals
    cont = dedup.exact_containment_pairs(
        sh1, pre_shingled=True
    ).localCheckpoint(eager=True)
    dom2 = cont.select(F.col("id_a").alias("doc_id")).distinct()
    s2 = s1.join(dom2, "doc_id", "left_anti").localCheckpoint(eager=True)
    aux2 = (
        cont.select("id_b")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("aux"))
    )

    # -- stage 3: MinHash-LSH on the twice-deduped survivors
    pairs3 = dedup.minhash_lsh_dedup_pairs(
        sh1.join(s2, "doc_id", "left_semi"), portable=True, pre_shingled=True
    ).localCheckpoint(eager=True)
    dom3 = pairs3.select(F.col("id_b").alias("doc_id")).distinct()
    s3 = s2.join(dom3, "doc_id", "left_anti").localCheckpoint(eager=True)
    aux3 = (
        pairs3.select("id_a", "id_b")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("aux"))
    )

    # -- stages 4-8: the set-global tail, shared VERBATIM with the
    # round-13 streaming e2e drive (operators/curation_stages.py — the
    # stream-batch agreement contract requires one implementation).
    s4, aux4 = stage4_semdedup(emb, s3)
    s5, aux5 = stage5_decontam(docs, s4, _BDC_N, _BDC_K, _BDC_M)
    s6, aux6 = stage6_quality(docs, s5, _QUALITY_MIN)
    s7, aux7 = stage7_waterfill(docs, s6)
    aux8 = stage8_pack(docs, s7, _PACK_BUDGET, _PACK_SHARDS)

    out = stage_row(1, "exact", docs, s1, aux1)
    out = out.unionByName(stage_row(2, "containment", s1, s2, aux2))
    out = out.unionByName(stage_row(3, "minhash_lsh", s2, s3, aux3))
    out = out.unionByName(stage_row(4, "semdedup", s3, s4, aux4))
    out = out.unionByName(stage_row(5, "decontam", s4, s5, aux5))
    out = out.unionByName(stage_row(6, "quality_lang", s5, s6, aux6))
    out = out.unionByName(stage_row(7, "quota_waterfill", s6, s7, aux7))
    out = out.unionByName(stage_row(8, "pack", s7, s7, aux8, n_dropped=0))
    return out


# ---------------------------------------------------------------------------
# The curation gate at INGEST time — streaming twin of the e2e DAG's
# filter stages (round 12).
# ---------------------------------------------------------------------------

_INGEST_ORACLE = f"""
WITH tot AS (SELECT (MAX(doc_id) + 1) // 3 AS t1 FROM documents),
qd AS (
  SELECT doc_id, source, md5(text) AS h, string_split(text, ' ') AS toks
  FROM documents
),
qs AS MATERIALIZED (
  SELECT doc_id, source, h,
         round((CASE WHEN len(toks) BETWEEN 20 AND 200 THEN 1.0
                     WHEN len(toks) > 200 THEN 0.5 ELSE 0.25 END) * 0.4
               + (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
                 * 0.3
               + (CASE WHEN len(list_filter(toks,
                          t -> t IN ({_EN_STOPS}))) > 0
                  THEN 1.0 ELSE 0.0 END) * 0.3, 5) AS q
  FROM qd
),
base_adm AS MATERIALIZED (
  SELECT h, MIN(doc_id) AS doc_id
  FROM qs, tot
  WHERE doc_id < t1 AND source <> 'src0' AND q >= {_QUALITY_MIN}
  GROUP BY h
),
g AS MATERIALIZED (
  SELECT DISTINCT doc_id, source,
         array_to_string(toks[i:i+{_BDC_N - 1}], ' ') AS gram
  FROM qd, UNNEST(generate_series(1, len(toks) - {_BDC_N - 1})) AS t(i)
  WHERE len(toks) >= {_BDC_N}
),
bench AS MATERIALIZED (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
js AS (SELECT unnest([0, 1, 2, 3]) AS j),
bits AS MATERIALIZED (
  SELECT DISTINCT
         CAST(('0x' || substring(md5('bdc' || CAST(j AS VARCHAR) || ':'
                                 || gram), 1, 8)) AS BIGINT) % {_BDC_M}
           AS pos
  FROM bench, js
),
arr_g AS (SELECT g.doc_id, g.gram FROM g, tot WHERE g.doc_id >= t1),
gp AS (
  SELECT doc_id, gram,
         CAST(('0x' || substring(md5('bdc' || CAST(j AS VARCHAR) || ':'
                                 || gram), 1, 8)) AS BIGINT) % {_BDC_M}
           AS pos
  FROM arr_g, js
),
susp AS MATERIALIZED (
  SELECT doc_id, gram FROM gp JOIN bits USING (pos)
  GROUP BY doc_id, gram HAVING COUNT(*) = {_BDC_K}
),
flag AS (SELECT DISTINCT doc_id FROM susp),
conf AS MATERIALIZED (
  SELECT DISTINCT s.doc_id FROM susp s JOIN bench b USING (gram)
),
arr AS MATERIALIZED (
  SELECT qs.doc_id, qs.source, qs.h, qs.q,
         CASE WHEN qs.doc_id < 2 * tot.t1 THEN 0 ELSE 1 END AS ep
  FROM qs, tot WHERE qs.doc_id >= tot.t1
),
e0 AS MATERIALIZED (
  SELECT doc_id, h,
         source = 'src0' AS benchmark_member,
         q >= {_QUALITY_MIN} AS quality_ok,
         h IN (SELECT h FROM base_adm) AS is_clone,
         doc_id IN (SELECT doc_id FROM flag) AS bloom_flagged,
         doc_id IN (SELECT doc_id FROM conf) AS contaminated
  FROM arr WHERE ep = 0
),
e0d AS MATERIALIZED (
  SELECT *, NOT benchmark_member AND quality_ok AND NOT is_clone
            AND NOT contaminated AS admitted
  FROM e0
),
idx1 AS MATERIALIZED (
  SELECT h FROM base_adm
  UNION
  SELECT DISTINCT h FROM e0d WHERE admitted
),
e1d AS MATERIALIZED (
  SELECT doc_id, h, benchmark_member, quality_ok, is_clone,
         bloom_flagged, contaminated,
         NOT benchmark_member AND quality_ok AND NOT is_clone
           AND NOT contaminated AS admitted
  FROM (
    SELECT doc_id, h,
           source = 'src0' AS benchmark_member,
           q >= {_QUALITY_MIN} AS quality_ok,
           h IN (SELECT h FROM idx1) AS is_clone,
           doc_id IN (SELECT doc_id FROM flag) AS bloom_flagged,
           doc_id IN (SELECT doc_id FROM conf) AS contaminated
    FROM arr WHERE ep = 1
  ) x
)
SELECT doc_id, CAST(0 AS INTEGER) AS epoch, benchmark_member, quality_ok,
       is_clone, bloom_flagged, contaminated, admitted
FROM e0d
UNION ALL
SELECT doc_id, CAST(1 AS INTEGER) AS epoch, benchmark_member, quality_ok,
       is_clone, bloom_flagged, contaminated, admitted
FROM e1d
"""


@register(
    "pipeline_curation_ingest_stream",
    oracle=_INGEST_ORACLE,
    tags=("llm", "pipeline", "curation", "streaming"),
)
def pipeline_curation_ingest_stream(spark, sf_dir):
    """The curation gate IN-FLIGHT through the real checkpointed
    foreachBatch drive (streaming/curation.py — the ingest twin of
    pipeline_curation_e2e's filter stages, the same batch->stream
    promotion as the substring/Bloom/SemDeDup drives): the first third
    of the corpus is batch-curated into a STANDING md5 index
    (benchmark shard excluded, quality bar applied, clones collapsed;
    landed epoch -1); the remaining documents arrive as TWO id-ordered
    micro-batches (maxFilesPerTrigger=1), each passing four gates in
    one screen — benchmark-membership rejection, the quality bar,
    exact-clone screening against the standing index (corpus-wins;
    within-batch peers both pass), and two-tier Bloom decontamination
    (broadcast bits, only Bloom-positive grams pay the exact verify).
    Admits append their hashes under their epoch, so batch 1's clone
    gate sees batch 0's admits — a lost append or replay double-write
    shows up one epoch later in the driver hash. One disposition row
    per arrival pins every gate's verdict separately; the oracle
    replays base curation plus both epochs in SQL and never sees the
    stream.

    Scale: every gate is map-side against broadcast state (bits,
    quality exprs) or an equi-join against the bounded standing index;
    the drive inherits exactly-once from epoch-partitioned dynamic
    overwrite (the CDC log/DLQ protocol)."""
    import atexit
    import glob as _glob
    import os
    import shutil
    import tempfile

    from ..streaming.curation import curation_ingest_stream

    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    t1 = (int(mx) + 1) // 3
    base = docs.filter(F.col("doc_id") < t1).select(
        "doc_id", "source", "text"
    )
    bench = docs.filter(F.col("source") == "src0").select("doc_id", "text")
    arrivals = docs.filter(F.col("doc_id") >= t1).select(
        "doc_id", "source", "text"
    )
    work = tempfile.mkdtemp(prefix="curation_stream_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    data_dir = os.path.join(work, "data")
    os.makedirs(data_dir)
    staged = os.path.join(work, "staged")
    (
        arrivals.withColumn(
            "__b", F.when(F.col("doc_id") < 2 * t1, 0).otherwise(1)
        )
        .repartition(1)
        .write.partitionBy("__b")
        .json(staged)
    )
    for i in range(2):
        files = _glob.glob(os.path.join(staged, f"__b={i}", "part-*"))
        (pf,) = [f for f in files if not f.endswith(".crc")]
        dest = os.path.join(data_dir, f"b{i:03d}.json")
        shutil.move(pf, dest)
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(data_dir)
    )
    out_dir = os.path.join(work, "out")
    q = curation_ingest_stream(
        stream,
        base,
        bench,
        out_dir,
        os.path.join(work, "index"),
        os.path.join(work, "ckpt"),
    ).start()
    await_done(q, 600)
    return (
        spark.read.schema(
            "doc_id long, benchmark_member boolean, quality_ok boolean,"
            " is_clone boolean, bloom_flagged boolean,"
            " contaminated boolean, admitted boolean, epoch int"
        )
        .parquet(out_dir)
        .select(
            "doc_id",
            "epoch",
            "benchmark_member",
            "quality_ok",
            "is_clone",
            "bloom_flagged",
            "contaminated",
            "admitted",
        )
    )


# ---------------------------------------------------------------------------
# The STREAMING curation DAG end-to-end (round 13) — stream-batch
# agreement pinned per epoch.
# ---------------------------------------------------------------------------

# The oracle replays the BATCH DAG once per epoch, each copy scoped to
# the corpus prefix that epoch has seen — the strongest possible form
# of "the oracle is the batch DAG re-scoped" (VERDICT r12 task #2): the
# stream's derived cascade must equal the batch result at EVERY epoch,
# not just the last. Each copy is the full _E2E_ORACLE CTE chain with
# all 70 CTE names prefixed `e{k}_` (a consistent global rename — CTE
# names that double as column aliases, e.g. `canon`, rename everywhere
# at once, preserving the original shadowing structure) and the
# `documents` relation swapped for the prefix-scoped `e{k}_docsrc`.
_E2E_HEAD = "\nWITH RECURSIVE "
assert _E2E_ORACLE.startswith(_E2E_HEAD)
_E2E_FINAL = _E2E_ORACLE.rindex("SELECT a.stage")
_E2E_CTES_TXT = _E2E_ORACLE[len(_E2E_HEAD) : _E2E_FINAL].rstrip().rstrip(",")

_E2E_CTE_NAMES = []
for _m in _re.finditer(
    r"(\w+)(?:\([^)]*\))?\s+AS\s+(?:MATERIALIZED\s+)?\(", _E2E_CTES_TXT
):
    if _m.group(1) not in _E2E_CTE_NAMES:
        _E2E_CTE_NAMES.append(_m.group(1))
assert len(_E2E_CTE_NAMES) == 70, (
    f"e2e oracle CTE census changed ({len(_E2E_CTE_NAMES)}) — re-audit "
    "the stream-oracle rename list"
)
for _n in _E2E_CTE_NAMES:
    for _q in _re.finditer(r"'[^']*'", _E2E_CTES_TXT):
        assert not _re.search(rf"\b{_n}\b", _q.group(0)), (
            f"CTE name {_n!r} appears inside a string literal — the "
            f"global rename would corrupt it: {_q.group(0)!r}"
        )


def _e2e_epoch_copy(k: int) -> tuple[str, str]:
    """(renamed CTE chain, final stage-row SELECT) for epoch ``k``,
    scoped to documents with doc_id < ((max+1)*(k+1)) // 3."""
    body = _E2E_CTES_TXT
    for n in _E2E_CTE_NAMES:
        new = _re.sub(rf"\b{n}\b", f"e{k}_{n}", body)
        assert new != body, f"rename miss for CTE {n!r} in epoch copy {k}"
        body = new
    scoped = _re.sub(r"\bdocuments\b", f"e{k}_docsrc", body)
    assert scoped != body, f"no documents reference found in epoch copy {k}"
    src = (
        f"e{k}_docsrc AS MATERIALIZED (\n"
        f"  SELECT * FROM documents\n"
        f"  WHERE doc_id < (SELECT (MAX(doc_id) + 1) * {k + 1} // 3\n"
        f"                  FROM documents)\n)"
    )
    sel = (
        f"SELECT CAST({k} AS INTEGER) AS epoch, a.stage, n.stage_name,\n"
        f"       a.n_in, a.n_dropped, a.n_out, a.survivor_id_sum, a.aux\n"
        f"FROM e{k}_allrows a JOIN e{k}_names n USING (stage)"
    )
    return src + ",\n" + scoped, sel


_SE2E_PARTS = [_e2e_epoch_copy(k) for k in range(3)]
_STREAM_E2E_ORACLE = (
    "\nWITH RECURSIVE "
    + ",\n".join(p[0] for p in _SE2E_PARTS)
    + "\n"
    + "\nUNION ALL\n".join(p[1] for p in _SE2E_PARTS)
    + "\n"
)


@register(
    "pipeline_curation_stream_e2e",
    oracle=_STREAM_E2E_ORACLE,
    tags=("llm", "dedup", "pipeline", "curation", "streaming"),
)
def pipeline_curation_stream_e2e(spark, sf_dir):
    """The FULL curation DAG as a checkpointed multi-epoch streaming
    pipeline (streaming/curation_e2e.py — VERDICT r12 task #2), with
    the stream-batch agreement contract pinned at every epoch: the
    corpus arrives as THREE id-ordered micro-batches
    (maxFilesPerTrigger=1), each batch (a) lands in the corpus log and
    collapses against the standing md5 canon index, (b) pushes its new
    canonicals through the standing containment-posting and LSH-band
    indexes to append exactly the dedup pairs touching them (the
    incremental tier work — linear in arrivals), and (c) derives the
    complete 8-stage survivor cascade for the corpus seen so far
    (tiers 1-3 by set algebra over the standing pair relations; stages
    4-8 through the SAME shared implementations the batch DAG executes
    — operators/curation_stages.py). Output: one 8-stage handoff-pin
    row set PER EPOCH (24 rows); the final epoch's rows are, by the
    agreement contract, exactly pipeline_curation_e2e's rows.

    The oracle replays the batch DAG three times, each copy scoped to
    that epoch's corpus prefix — the stream never shares code or state
    with it. Exactly-once: every state relation and the per-epoch rows
    are epoch-partitioned with dynamic overwrite, standing reads filter
    to prior epochs (the ADVICE-r12 replay rule).

    Scale (100 TB): the per-arrival work (shingle/band/posting builds +
    arrival-vs-standing pair joins) is the standing-index ingest shape
    proven by streaming/{neardup,semdedup,substr}.py; the per-epoch
    derive re-runs only the set-global tail — SemDeDup's centroids and
    the Bloom benchmark legitimately move as data arrives (a doc clean
    at epoch 0 can become contaminated when new benchmark shards land),
    so exact agreement REQUIRES that recompute; production would run it
    at checkpoint cadence, with the r12 frozen-centroid ingest screen
    (streaming/semdedup.py) as the per-arrival fast path between
    rebuilds."""
    import atexit
    import glob as _glob
    import os
    import shutil
    import tempfile

    from ..streaming.curation_e2e import curation_stream_e2e

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    tfull = int(mx) + 1
    c1, c2 = tfull * 1 // 3, tfull * 2 // 3
    work = tempfile.mkdtemp(prefix="curation_stream_e2e_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    data_dir = os.path.join(work, "data")
    os.makedirs(data_dir)
    staged = os.path.join(work, "staged")
    (
        docs.select("doc_id", "source", "lang", "text")
        .withColumn(
            "__b",
            F.when(F.col("doc_id") < c1, 0)
            .when(F.col("doc_id") < c2, 1)
            .otherwise(2),
        )
        .repartition(1)
        .write.partitionBy("__b")
        .json(staged)
    )
    for i in range(3):
        files = _glob.glob(os.path.join(staged, f"__b={i}", "part-*"))
        (pf,) = [f for f in files if not f.endswith(".crc")]
        dest = os.path.join(data_dir, f"b{i:03d}.json")
        shutil.move(pf, dest)
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(
            "doc_id long, source string, lang string, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .json(data_dir)
    )
    out_dir = os.path.join(work, "out")
    q = curation_stream_e2e(
        stream,
        emb,
        out_dir,
        os.path.join(work, "state"),
        os.path.join(work, "ckpt"),
        bdc_n=_BDC_N,
        bdc_k=_BDC_K,
        bdc_m=_BDC_M,
        quality_min=_QUALITY_MIN,
        pack_budget=_PACK_BUDGET,
        pack_shards=_PACK_SHARDS,
    ).start()
    await_done(q, 600)
    return (
        spark.read.schema(
            "stage long, stage_name string, n_in long, n_dropped long,"
            " n_out long, survivor_id_sum long, aux long, epoch int"
        )
        .parquet(out_dir)
        .select(
            "epoch",
            "stage",
            "stage_name",
            "n_in",
            "n_dropped",
            "n_out",
            "survivor_id_sum",
            "aux",
        )
    )
