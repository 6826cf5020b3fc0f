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
