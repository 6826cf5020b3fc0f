"""Independent pure-Python/numpy reference checks for the round-6
statistical and vector operators — the same discipline as the graph-ops
and CUSUM/EWMA property tests: the registered query (or operator) must
equal a from-scratch implementation that shares NO code and NO SQL with
either engine, computed directly from the parquet fixtures.

These are deliberately redundant with the DuckDB oracles: the oracle
proves Spark == DuckDB on one shared formulation; these prove the
formulation itself is the textbook statistic/assignment.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def _orders():
    return pq.read_table(SF_DIR + "/orders.parquet").to_pydict()


def _customers():
    return pq.read_table(SF_DIR + "/customer.parquet").to_pydict()


def test_mann_whitney_matches_brute_force_pair_count(spark):
    """u_x_doubled must equal the literal definition: 2*#{(x,y): x>y}
    + #{ties}, counted pairwise in Python over the same cents values."""
    o, c = _orders(), _customers()
    seg = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    xs, ys = [], []
    for k, p in zip(o["o_custkey"], o["o_totalprice"]):
        s = seg.get(k)
        v = round(p * 100)
        if s == "BUILDING":
            xs.append(v)
        elif s == "MACHINERY":
            ys.append(v)
    # brute force via value histograms (exact, no float ranks)
    cy = Counter(ys)
    u2 = 0
    for x in xs:
        for yv, n in cy.items():
            if x > yv:
                u2 += 2 * n
            elif x == yv:
                u2 += n
    row = SPECS["agg_mann_whitney_u"].fn(spark, SF_DIR).collect()[0]
    assert row["n_x"] == len(xs) and row["n_y"] == len(ys)
    assert row["u_x_doubled"] == u2
    assert row["u_x_doubled"] + row["u_y_doubled"] == 2 * len(xs) * len(ys)


def test_welch_t_matches_textbook_formula(spark):
    o, c = _orders(), _customers()
    seg = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    xs, ys = [], []
    for k, p in zip(o["o_custkey"], o["o_totalprice"]):
        s = seg.get(k)
        if s == "BUILDING":
            xs.append(round(p * 100))
        elif s == "MACHINERY":
            ys.append(round(p * 100))

    def mv(a):
        n = len(a)
        m = sum(a) / n
        var = sum((v - m) ** 2 for v in a) / (n - 1)
        return n, m, var

    n1, m1, v1 = mv(xs)
    n2, m2, v2 = mv(ys)
    a1, a2 = v1 / n1, v2 / n2
    t = (m1 - m2) / math.sqrt(a1 + a2)
    df = (a1 + a2) ** 2 / (a1**2 / (n1 - 1) + a2**2 / (n2 - 1))
    row = SPECS["agg_welch_t_test"].fn(spark, SF_DIR).collect()[0]
    assert abs(row["t_stat"] - t) < 1e-4
    assert abs(row["df_welch"] - df) < max(1e-2, df * 1e-5)


def test_poisson_bootstrap_replicates_match_python_md5(spark):
    """Every replicate's weighted mean must equal an independent Python
    recomputation of the SAME md5-derived Poisson weights — and the
    realized weight histogram must track the Poisson(1) pmf."""
    from cdc_poc_spark.queries.aggregates import _BOOT_B, _BOOT_T

    o = _orders()
    got = {
        r["rep"]: (r["n_eff"], r["mean_micro_cents"])
        for r in SPECS["agg_poisson_bootstrap"].fn(spark, SF_DIR).collect()
    }
    assert len(got) == _BOOT_B
    wcount: Counter = Counter()
    for rep in range(_BOOT_B):
        sw = swv = 0
        for key, p in zip(o["o_orderkey"], o["o_totalprice"]):
            h = hashlib.md5(f"boot{rep}:{key}".encode()).hexdigest()[:8]
            u = int(h, 16)
            w = 10
            for k, t in enumerate(_BOOT_T):
                if u < t:
                    w = k
                    break
            wcount[w] += 1
            sw += w
            swv += w * round(p * 100)
        assert got[rep] == (sw, swv * 1_000_000 // sw), f"rep {rep}"
    n = sum(wcount.values())
    for k, pk in [(0, math.exp(-1)), (1, math.exp(-1)), (2, math.exp(-1) / 2)]:
        assert abs(wcount[k] / n - pk) < 0.01, (k, wcount[k] / n, pk)


def test_pq_assignment_matches_numpy_brute_force(spark):
    import numpy as np

    from cdc_poc_spark.operators.similarity import pq_assign_codes
    from cdc_poc_spark.tables import load_table

    t = pq.read_table(SF_DIR + "/embeddings.parquet").to_pydict()
    ids = t["vec_id"]
    def _quant(v):
        # HALF_UP (away from zero), matching Spark's round() — np.round
        # is half-to-even and could disagree on exact .5 boundaries
        x = np.array(v, dtype=np.float64) * 1_000_000
        return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)

    vecs = {i: _quant(v) for i, v in zip(ids, t["embedding"])}
    m, k = 8, 16
    d = len(next(iter(vecs.values())))
    d_sub = d // m
    seeds = [vecs[i] for i in sorted(vecs)[:k]]
    expected = {}
    for i, qv in vecs.items():
        for s in range(m):
            sl = slice(s * d_sub, (s + 1) * d_sub)
            best = min(
                (int(((qv[sl] - c[sl]) ** 2).sum()), code)
                for code, c in enumerate(seeds)
            )
            expected[(i, s)] = (best[1], best[0])
    emb = load_table(spark, SF_DIR, "embeddings")
    got = {
        (r["id"], r["sub"]): (r["code"], r["dist2"])
        for r in pq_assign_codes(emb, m=m, k=k).collect()
    }
    assert got == expected


def test_point_in_time_join_matches_per_fact_lookup(spark):
    import pyarrow as pa

    tbl = pq.read_table(SF_DIR + "/events.parquet")
    # read ts as raw int64 in the file's own unit (datetime conversion
    # would truncate nanos), then scale to MICROS to match the engine's
    # ts_us convention
    unit = tbl.schema.field("ts").type.unit
    div = {"ns": 1000, "us": 1}[unit]
    ts_raw = tbl.column("ts").cast(pa.int64()).to_pylist()
    ev = tbl.to_pydict()
    rows = list(
        zip(ev["event_id"], ev["user_id"], ev["event_type"], ts_raw, ev["value"])
    )
    state = defaultdict(list)  # user -> [(ts_us, kind, event_id, cents)]
    for eid, uid, et, ts, val in rows:
        ts_us = int(ts) // div
        if et == "purchase":
            state[uid].append((ts_us, 0, eid, round(val * 100)))
    expected = {}
    for eid, uid, et, ts, val in rows:
        if et != "click":
            continue
        ts_us = int(ts) // div
        cands = [s for s in state[uid] if (s[0], s[1], s[2]) <= (ts_us, 1, eid)]
        if cands:
            st = max(cands)
            expected[eid] = (uid, ts_us, st[2], st[3], ts_us - st[0])
    got = {
        r["click_event_id"]: (
            r["user_id"],
            r["ts_us"],
            r["state_event_id"],
            r["state_cents"],
            r["staleness_us"],
        )
        for r in SPECS["cdc_point_in_time_join"].fn(spark, SF_DIR).collect()
    }
    assert got == expected
