"""Similarity search over an embedding column (array<float>).

Two paths:
- brute-force cosine top-k: broadcast the (small) query set against the
  corpus — exact, O(|Q| · n), the correctness baseline. All arithmetic
  in double via Catalyst higher-order functions (zip_with + aggregate);
  no UDFs.
- hyperplane-LSH buckets: sign-random-projection bucketing so each query
  probes one bucket — the sub-linear scale path. Hyperplane weights are
  hash-derived (deterministic, no stored model).

Similarities are rounded to 5 decimals at the edge: accumulation order
differs across engines at ~1e-13, and ranking must be reproducible —
ties after rounding break by vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

#: embedding as double array (float32 arithmetic is not portable)
_DBL = "transform({c}, x -> CAST(x AS DOUBLE))"


def as_double(col: str) -> F.Column:
    return F.expr(_DBL.format(c=col))


def dot(a: F.Column | str, b: F.Column | str) -> F.Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(col: F.Column | str) -> F.Column:
    return F.sqrt(dot(col, col))


def cosine_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors for the first `n_queries` vectors.

    The query side is tiny -> broadcast; the corpus is scanned once.
    At 100 TB this shape (broadcast queries × partitioned corpus +
    per-query top-k via window) is exactly the distributed brute-force
    kNN plan; the LSH variant below cuts the scan.
    """
    e = emb.select(F.col(id_col), as_double(vec_col).alias("vec")).withColumn(
        "vnorm", norm("vec")
    )
    q = (
        e.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("vnorm").alias("qnorm"),
        )
    )
    sim = F.round(
        dot("qvec", "vec") / (F.col("qnorm") * F.col("vnorm")), 5
    ).alias("cosine")
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .crossJoin(e)
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("neighbor_id"), sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane_sign(vec: str, table: int, plane: int) -> F.Column:
    """Deterministic pseudo-random hyperplane: weight for (table, plane,
    dim) is ±1 from xxhash64 parity. dot(vec, w) > 0 -> bit set."""
    proj = F.expr(
        f"aggregate(zip_with({vec}, sequence(0, size({vec}) - 1),"
        f" (x, i) -> x * (CASE WHEN pmod(xxhash64(concat('hp{table}_{plane}_', i)), 2) = 0"
        f" THEN 1.0D ELSE -1.0D END)), 0.0D, (acc, v) -> acc + v)"
    )
    return F.when(proj > 0, 1).otherwise(0)


def _bucket_col(table: int, planes: int) -> F.Column:
    bucket = None
    for p in range(planes):
        term = _hyperplane_sign("vec", table, p) * (1 << p)
        bucket = term if bucket is None else bucket + term
    return bucket


def lsh_buckets(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 4,
    tables: int = 8,
) -> DataFrame:
    """Multi-table sign-random-projection LSH: `tables` independent
    bucket assignments per vector (recall 1-(1-p^planes)^tables). One
    row per (vector, table) after explode — the shuffle key for the
    candidate join is (table_id, bucket)."""
    e = emb.select(F.col(id_col), as_double(vec_col).alias("vec"))
    buckets = F.array(
        *[
            F.struct(F.lit(t).alias("table_id"), _bucket_col(t, planes).alias("bucket"))
            for t in range(tables)
        ]
    )
    return (
        e.withColumn("tb", F.explode(buckets))
        .select(id_col, "vec", F.col("tb.table_id"), F.col("tb.bucket"))
    )


def ann_lsh_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 10,
    k: int = 5,
    planes: int = 4,
    tables: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates = union over LSH tables of
    same-bucket vectors (the equi-join on (table_id, bucket) replaces
    the full cross product — what bounds work at scale). Distinct
    candidate pairs are then scored exactly. Recall vs cosine_topk is
    asserted in tests."""
    b = lsh_buckets(emb, id_col, vec_col, planes, tables)
    q = b.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("table_id").alias("q_table"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = (
        F.broadcast(q)
        .join(
            b,
            (F.col("q_table") == F.col("table_id"))
            & (F.col("q_bucket") == F.col("bucket"))
            & (F.col("query_id") != F.col(id_col)),
        )
        .select("query_id", F.col(id_col).alias("neighbor_id"))
        .distinct()
    )
    e = emb.select(F.col(id_col), as_double(vec_col).alias("vec")).withColumn(
        "vnorm", norm("vec")
    )
    qv = e.select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("vnorm").alias("qnorm"),
    )
    sim = F.round(dot("qvec", "vec") / (F.col("qnorm") * F.col("vnorm")), 5).alias(
        "cosine"
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(e.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")
        .select("query_id", "neighbor_id", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def norm_stats_by_label(emb: DataFrame, label_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """Per-label embedding-norm profile (rounded before aggregation so
    the multiset of addends is engine-identical)."""
    e = emb.select(
        F.col(label_col), F.round(norm(as_double(vec_col)), 5).alias("r_norm")
    )
    n = F.count(F.lit(1))
    return e.groupBy(label_col).agg(
        n.alias("n_vectors"),
        F.round(F.sum("r_norm") / n, 5).alias("avg_norm"),
        F.min("r_norm").alias("min_norm"),
        F.max("r_norm").alias("max_norm"),
    )
