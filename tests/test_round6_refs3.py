"""Third batch of independent pure-Python reference checks — HITS,
mutual information, winsorized mean, Hill tail index, and
capture-recapture, each recomputed from the parquet fixtures with no
shared code or SQL (the discipline that caught the Boruvka packing bug
batch 2 found).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_hits_step_matches_python(spark):
    o = pq.read_table(SF_DIR + "/orders.parquet").to_pydict()
    li = pq.read_table(SF_DIR + "/lineitem.parquet").to_pydict()
    cust_of = dict(zip(o["o_orderkey"], o["o_custkey"]))
    edges = {
        (cust_of[ok], p)
        for ok, p in zip(li["l_orderkey"], li["l_partkey"])
        if ok in cust_of
    }
    auth: Counter = Counter()
    for _, p in edges:
        auth[p] += 1
    hub: Counter = Counter()
    for c, p in edges:
        hub[c] += auth[p]
    auth2: Counter = Counter()
    for c, p in edges:
        auth2[p] += hub[c]
    m = max(auth2.values())
    ranked = sorted(((-a2, p) for p, a2 in auth2.items()))[:20]
    expected = [
        (p, auth[p], -na2, (-na2) * 1_000_000 // m) for na2, p in ranked
    ]
    got = [
        (r["part"], r["degree_auth"], r["hits_auth_raw"], r["hits_auth_ppm"])
        for r in SPECS["graph_hits_step"].fn(spark, SF_DIR).collect()
    ]
    assert got == expected


def test_mutual_information_matches_python(spark):
    o = pq.read_table(SF_DIR + "/orders.parquet").to_pydict()
    c = pq.read_table(SF_DIR + "/customer.parquet").to_pydict()
    seg = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    cell: Counter = Counter()
    for k, pri in zip(o["o_custkey"], o["o_orderpriority"]):
        cell[(seg[k], pri)] += 1
    nx: Counter = Counter()
    ny: Counter = Counter()
    for (s, p), n in cell.items():
        nx[s] += n
        ny[p] += n
    total = sum(cell.values())
    mi_w = sum(
        n * round(math.log(n * total / (nx[s] * ny[p])) * 1_000_000)
        for (s, p), n in cell.items()
    )
    row = SPECS["agg_mutual_information"].fn(spark, SF_DIR).collect()[0]
    assert row["n_cells"] == len(cell)
    assert row["mi_weighted_micro"] == mi_w
    assert abs(row["mi_nats"] - mi_w / total / 1_000_000) < 1e-6


def test_winsorized_mean_matches_python(spark):
    o = pq.read_table(SF_DIR + "/orders.parquet").to_pydict()
    c = pq.read_table(SF_DIR + "/customer.parquet").to_pydict()
    seg = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    vals = defaultdict(list)
    for k, p in zip(o["o_custkey"], o["o_totalprice"]):
        vals[seg[k]].append(round(p * 100))
    expected = {}
    for s, vs in vals.items():
        vs.sort()
        n = len(vs)
        # smallest v whose cumulative count reaches ceil(q*n): that is
        # the (ceil(q*n))-th order statistic, 1-based
        t_lo = vs[math.ceil(n / 20) - 1]
        t_hi = vs[math.ceil(19 * n / 20) - 1]
        w = [min(max(v, t_lo), t_hi) for v in vs]
        expected[s] = (n, t_lo, t_hi, sum(w), sum(w) // n)
    got = {
        r["seg"]: (
            r["n"],
            r["t_lo"],
            r["t_hi"],
            r["winsorized_cents_total"],
            r["winsorized_cents_mean"],
        )
        for r in SPECS["agg_winsorized_mean"].fn(spark, SF_DIR).collect()
    }
    assert got == expected


def test_hill_estimator_matches_python(spark):
    from cdc_poc_spark.queries.aggregates import _HILL_K

    o = pq.read_table(SF_DIR + "/orders.parquet").to_pydict()
    vs = sorted((round(p * 100) for p in o["o_totalprice"]), reverse=True)[
        :_HILL_K
    ]
    x_k = min(vs)
    s = sum(round(math.log(v / x_k) * 1_000_000) for v in vs)
    row = SPECS["agg_tail_index_hill"].fn(spark, SF_DIR).collect()[0]
    assert (row["k"], row["x_k"], row["sum_ln_micro"]) == (_HILL_K, x_k, s)
    assert abs(row["hill_alpha"] - round((_HILL_K - 1) * 1e6 / s, 4)) < 1e-9


def test_capture_recapture_matches_python(spark):
    o = pq.read_table(SF_DIR + "/orders.parquet").to_pydict()
    pool = set(o["o_custkey"])

    def samp(salt):
        return {
            k
            for k in pool
            if int(hashlib.md5(f"{salt}{k}".encode()).hexdigest()[:8], 16) % 100
            < 30
        }

    s1, s2 = samp("cap1:"), samp("cap2:")
    n1, n2, nb = len(s1), len(s2), len(s1 & s2)
    est = (n1 + 1) * (n2 + 1) // (nb + 1) - 1
    err = est - len(pool)
    sign = 1 if err >= 0 else -1
    rel = sign * (abs(err) * 1_000_000 // len(pool))
    row = SPECS["agg_capture_recapture"].fn(spark, SF_DIR).collect()[0]
    assert (
        row["true_n"],
        row["n1"],
        row["n2"],
        row["n_both"],
        row["chapman_estimate"],
        row["rel_err_ppm"],
    ) == (len(pool), n1, n2, nb, est, rel)
