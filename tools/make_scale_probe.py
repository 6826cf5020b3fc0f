"""Build the NxSF scale probe: replicate the fixture tables N times with
key-offset referential integrity, written as 32-file parquet per table —
the multi-split layout a cluster scan sees (PLANS.md "10x scale probe").

Usage: python tools/make_scale_probe.py [N] [SRC_SF_DIR] [OUT_DIR]
Defaults: N=10, SRC=/root/testdata/sf0.1, OUT=/tmp/sfprobe

Replication semantics (mirrors how real corpora grow):
- dims region/nation copy once (geography does not grow with data);
- every other table gets N replicas with each KEY DOMAIN offset by
  replica * BASE(domain), where BASE is a power of 10 above the max id
  observed across the domain's columns — so FK joins stay exactly
  N-fold (orders<->lineitem, customer<->orders, events.user_id<->
  c_custkey) and no replica collides;
- non-key payloads (dates, amounts, text, vectors) repeat verbatim —
  which intentionally makes every document/embedding a 10x CLONE
  family: the adversarial shape for dedup operators (pair growth is
  quadratic in clones) that the tiered/collapse-first paths must beat.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_poc_spark.session import get_spark

#: key domains -> (table, column) members sharing one id space
DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey"), ("events", "user_id")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "eventid": [("events", "event_id")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
}
COPY_ONCE = ("region", "nation")
REPLICATE = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfprobe"
    spark = get_spark(app_name="scale-probe")

    tables = {
        t: spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        for t in COPY_ONCE + REPLICATE
    }

    base: dict[str, int] = {}
    for dom, cols in DOMAINS.items():
        mx = 0
        for t, c in cols:
            mx = max(mx, tables[t].agg(F.max(c)).collect()[0][0] or 0)
        base[dom] = 10 ** math.ceil(math.log10(mx + 2))
    col_base = {(t, c): base[dom] for dom, cols in DOMAINS.items() for t, c in cols}

    os.makedirs(out, exist_ok=True)
    for t in COPY_ONCE:
        tables[t].repartition(1).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    for t in REPLICATE:
        df = tables[t]
        keyed = [c for c in df.columns if (t, c) in col_base]
        replicas = df.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("__rep")
        )
        for c in keyed:
            replicas = replicas.withColumn(
                c, F.col(c) + F.col("__rep") * F.lit(col_base[(t, c)])
            )
        replicas.drop("__rep").repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
        print(f"{t}: x{n}")
    print(f"probe written to {out}")


if __name__ == "__main__":
    main()
