"""User-defined function surface: vectorized (Arrow) pandas UDF,
grouped-aggregate pandas UDF (UDAF), and a Python UDTF
(SURVEY §2.B last row — UDF/UDAF/UDTF).

The engine's stance (SURVEY §4): UDFs are the slow path — everything
expressible with built-ins uses built-ins. These queries exist to prove
the escape hatch works and stays Arrow-batched (never row-at-a-time
Python in the hot path). Each has a DuckDB oracle because the UDF
logic itself is deterministic.

Scale notes: a scalar pandas UDF streams Arrow batches through one
Python worker per core — constant memory, no driver involvement; a
grouped-agg pandas UDF shuffles by the group key first (same exchange a
built-in agg needs). Integer cent/decimal arithmetic inside the UDFs
keeps results bit-identical across batch orderings.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from ..tables import load_table
from . import register

# ---------------------------------------------------------------------------
# Scalar pandas UDF: deterministic text normalization
# ---------------------------------------------------------------------------


@pandas_udf(T.StringType())
def _norm_text(s: pd.Series) -> pd.Series:
    """lowercase, collapse whitespace runs, strip — pure vectorized
    pandas string ops on each Arrow batch."""
    return s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()


_NORM_ORACLE = """
SELECT doc_id,
       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text
FROM documents
WHERE doc_id < 200
"""


@register("udf_pandas_normalize_text", oracle=_NORM_ORACLE, tags=("udf", "text"))
def udf_pandas_normalize_text(spark, sf_dir):
    """Arrow-batched scalar pandas UDF (the sanctioned Python escape
    hatch; ~10-100x over row-at-a-time per pyspark docs)."""
    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 200")
    return docs.select("doc_id", _norm_text("text").alias("norm_text"))


# ---------------------------------------------------------------------------
# Grouped-aggregate pandas UDF (UDAF): exact weighted mean via cents
# ---------------------------------------------------------------------------


@pandas_udf(T.DoubleType())
def _weighted_price_cents(price: pd.Series, qty: pd.Series) -> float:
    """sum(price*qty)/sum(qty) with integer-cent accumulation so the
    result is independent of row order within the group."""
    cents = (price * 100).round().astype("int64")
    qty10 = (qty * 10).round().astype("int64")
    num = int((cents * qty10).sum())  # exact int arithmetic
    den = int(qty10.sum())
    return round(num / den / 100.0, 4)


_UDAF_ORACLE = """
SELECT l_returnflag,
       round(CAST(SUM(CAST(l_extendedprice * 100 AS BIGINT) * CAST(l_quantity * 10 AS BIGINT)) AS DOUBLE)
             / SUM(CAST(l_quantity * 10 AS BIGINT)) / 100.0, 4) AS wavg_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("udf_pandas_grouped_agg", oracle=_UDAF_ORACLE, tags=("udf", "agg"))
def udf_pandas_grouped_agg(spark, sf_dir):
    """Grouped-agg pandas UDF — a custom UDAF. Physically: shuffle by
    key, then one Arrow batch per group into Python."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _weighted_price_cents("l_extendedprice", "l_quantity").alias("wavg_price")
    )


# ---------------------------------------------------------------------------
# Python UDTF: one row per token with position (lateral expansion)
# ---------------------------------------------------------------------------


@udtf(
    returnType=T.StructType(
        [T.StructField("pos", T.IntegerType()), T.StructField("token", T.StringType())]
    ),
    useArrow=True,  # ArrowEvalPythonUDTF, not row-at-a-time BatchEvalPython
    # (found by tools/plan_audit.py: this was the registry's ONE
    # remaining per-row Python evaluation site)
)
class _Tokenize:
    def eval(self, doc_id: int, text: str):  # noqa: D401
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            if tok:
                yield i, tok


_UDTF_ORACLE = """
SELECT doc_id, u.pos - 1 AS pos, u.token
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents WHERE doc_id < 50
) u
WHERE u.token <> ''
"""


@register("udf_python_udtf_tokenize", oracle=_UDTF_ORACLE, tags=("udf", "udtf", "text"))
def udf_python_udtf_tokenize(spark, sf_dir):
    """Python UDTF (table function): lateral-view tokenization. The
    built-in equivalent is posexplode(split(...)) — registered here to
    exercise the UDTF machinery itself."""
    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 50")
    spark.udtf.register("tokenize_udtf", _Tokenize)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """SELECT d.doc_id, t.pos, t.token
           FROM _udtf_docs d, LATERAL tokenize_udtf(d.doc_id, d.text) t"""
    )
