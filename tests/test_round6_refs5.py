"""Fifth batch of independent pure-Python reference checks — this time
for ROUND-6 WINDOW queries the driver is about to hash (protective,
not retrospective): Benford profile, Gini coefficient, k-core peel
profile, and the co-purchase projection.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_benford_profile_matches_python(spark):
    o = pq.read_table(SF_DIR + "/orders.parquet").to_pydict()
    digits = Counter(
        int(str(int(round(p * 100)))[0]) for p in o["o_totalprice"] if p > 0
    )
    total = sum(digits.values())
    got = {
        r["digit"]: (r["n_orders"], r["share"], r["benford_expected"])
        for r in SPECS["agg_benford_profile"].fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(digits)
    for d, n in digits.items():
        gn, gs, ge = got[d]
        assert gn == n
        assert abs(gs - n / total) < 1e-6
        assert abs(ge - math.log10(1 + 1 / d)) < 1e-6


def test_gini_matches_python(spark):
    o = pq.read_table(SF_DIR + "/orders.parquet").to_pydict()
    rev: Counter = Counter()
    for k, p in zip(o["o_custkey"], o["o_totalprice"]):
        rev[k] += int(round(p * 100))
    xs = sorted(rev.values())
    n = len(xs)
    sx = sum(xs)
    sxi = sum((i + 1) * x for i, x in enumerate(xs))
    gini = (2.0 * sxi - (n + 1.0) * sx) / (n * sx)
    row = SPECS["agg_gini_coefficient"].fn(spark, SF_DIR).collect()[0]
    assert row["n_customers"] == n
    assert abs(row["gini"] - gini) < 1e-6


def test_kcore_profile_matches_python(spark):
    o = pq.read_table(SF_DIR + "/orders.parquet").to_pydict()
    li = pq.read_table(SF_DIR + "/lineitem.parquet").to_pydict()
    cust_of = dict(zip(o["o_orderkey"], o["o_custkey"]))
    edges = {
        (cust_of[ok] * 2, s * 2 + 1)
        for ok, s in zip(li["l_orderkey"], li["l_suppkey"])
        if ok in cust_of
    }
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)

    def peel_round(a, k):
        keep = {n for n, nb in a.items() if len(nb) >= k}
        return {
            n: {m for m in nb if m in keep} for n, nb in a.items() if n in keep
        }

    expected = []
    cur = adj
    for rnd in (1, 2, 3):
        cur = peel_round(cur, 3)
        nodes = {n for n, nb in cur.items() if nb}
        n_edges_x2 = sum(len(nb) for nb in cur.values())
        expected.append((rnd, len(nodes), n_edges_x2))
    got = sorted(
        (r["round"], r["n_nodes"], r["n_edges_x2"])
        for r in SPECS["graph_kcore_profile"].fn(spark, SF_DIR).collect()
    )
    assert got == expected


def test_copurchase_projection_matches_python(spark):
    o = pq.read_table(SF_DIR + "/orders.parquet").to_pydict()
    li = pq.read_table(SF_DIR + "/lineitem.parquet").to_pydict()
    cust_of = dict(zip(o["o_orderkey"], o["o_custkey"]))
    b = {
        (cust_of[ok], s)
        for ok, s in zip(li["l_orderkey"], li["l_suppkey"])
        if ok in cust_of
    }
    by_cust = defaultdict(set)
    for c, s in b:
        by_cust[c].add(s)
    pairs: Counter = Counter()
    for c, supps in by_cust.items():
        if len(supps) > 64:  # the hub cap
            continue
        ss = sorted(supps)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                pairs[(ss[i], ss[j])] += 1
    expected = {k: v for k, v in pairs.items() if v >= 3}
    got = {
        (r["supp_a"], r["supp_b"]): r["n_shared_customers"]
        for r in SPECS["graph_copurchase_projection"].fn(spark, SF_DIR).collect()
    }
    assert got == expected
