"""Round-10 reference tests, part 5: pure-Python third implementations
for wave 6 — variance ratio, Chow break (via literal float OLS fits,
cross-checking the exact-moment rational form), sample entropy (direct
template matching), Jonckheere-Terpstra (BRUTE-FORCE over all
cross-group pairs vs the cumsum algebra), Bartlett, ECE/MCE,
diamond census and 3-round min-label WCC (direct simulation).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR


def _run(spark, name):
    return all_specs()[name].fn(spark, SF_DIR).collect()


def _cents(v: float) -> int:
    return int(
        Decimal(repr(float(v))).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        * 100
    )


def _daily_cents():
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    d = t.to_pydict()
    ts_us = t.column("ts").cast("int64").to_pylist()
    day_us = 86_400 * 10**6
    daily = Counter()
    for us, v in zip(ts_us, d["value"]):
        daily[us // day_us] += _cents(v)
    return [daily[k] for k in sorted(daily)]


def test_variance_ratio(spark):
    ys = _daily_cents()
    d1 = [b - a for a, b in zip(ys, ys[1:])]
    d5 = [ys[i] - ys[i - 5] for i in range(5, len(ys))]

    def var(xs):
        n = len(xs)
        return (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1))

    vr = (var(d5) / 5.0) / var(d1)
    n = len(ys)
    z = (vr - 1.0) / math.sqrt(2.0 * 9 * 4 / (3.0 * 5 * n))
    (row,) = _run(spark, "tw_variance_ratio_test")
    assert row["n_days"] == n and row["q"] == 5
    assert abs(row["vr"] - vr) < 2e-6
    assert abs(row["z_score"] - z) < 2e-6


def test_chow_break(spark):
    ys = _daily_cents()
    n = len(ys)
    h = n // 2

    def rss(pairs):
        m = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        sxy = sum(x * y for x, y in pairs)
        b = (m * sxy - sx * sy) / (m * sxx - sx * sx)
        a = (sy - b * sx) / m
        return sum((y - a - b * x) ** 2 for x, y in pairs)

    pts = list(zip(range(1, n + 1), ys))
    rp, r1, r2 = rss(pts), rss(pts[:h]), rss(pts[h:])
    f = ((rp - r1 - r2) / 2.0) / ((r1 + r2) / (n - 4.0))
    (row,) = _run(spark, "tw_chow_break_test")
    assert row["n_days"] == n and row["break_t"] == h
    assert abs(row["f_stat"] - f) < 1e-4


def test_sample_entropy(spark):
    ys = _daily_cents()
    n = len(ys)
    med = sorted(ys)[(n + 1) // 2 - 1]
    r = sorted(abs(y - med) for y in ys)[(n + 1) // 2 - 1]
    b_cnt = a_cnt = 0
    for i in range(n):
        for j in range(i + 1, n):
            if i + 1 < n and j + 1 < n:
                if max(abs(ys[i] - ys[j]), abs(ys[i + 1] - ys[j + 1])) <= r:
                    b_cnt += 1
            if i + 2 < n and j + 2 < n:
                if (
                    max(
                        abs(ys[i] - ys[j]),
                        abs(ys[i + 1] - ys[j + 1]),
                        abs(ys[i + 2] - ys[j + 2]),
                    )
                    <= r
                ):
                    a_cnt += 1
    (row,) = _run(spark, "tw_sample_entropy")
    assert (row["n_days"], row["r_cents"]) == (n, r)
    assert (row["count_b"], row["count_a"]) == (b_cnt, a_cnt)
    micro = int(
        Decimal(repr(1e6 * math.log(b_cnt / a_cnt))).quantize(
            Decimal("1"), rounding=ROUND_HALF_UP
        )
    )
    assert row["sampen_micro_nats"] == micro


def test_jonckheere_terpstra_brute(spark):
    t = pq.read_table(f"{SF_DIR}/orders.parquet").to_pydict()
    groups = defaultdict(list)
    for pr, tp in zip(t["o_orderpriority"], t["o_totalprice"]):
        groups[int(pr[0])].append(_cents(tp))
    jt_x2 = 0
    for g in range(1, 6):
        for h in range(g + 1, 6):
            for x in groups[g]:
                for y in groups[h]:
                    if x < y:
                        jt_x2 += 2
                    elif x == y:
                        jt_x2 += 1
    ns = [len(groups[g]) for g in range(1, 6)]
    n = sum(ns)
    mean_x4 = n * n - sum(m * m for m in ns)
    var72 = n * n * (2 * n + 3) - sum(m * m * (2 * m + 3) for m in ns)
    z = (jt_x2 / 2.0 - mean_x4 / 4.0) / math.sqrt(var72 / 72.0)
    (row,) = _run(spark, "agg_jonckheere_terpstra")
    assert (row["n_total"], row["jt_x2"], row["mean_x4"]) == (n, jt_x2, mean_x4)
    assert row["z_score"] == round(z, 6)


def test_bartlett(spark):
    t = pq.read_table(f"{SF_DIR}/events.parquet").to_pydict()
    groups = defaultdict(list)
    for et, v in zip(t["event_type"], t["value"]):
        groups[et].append(_cents(v))
    k = len(groups)
    n_tot = sum(len(g) for g in groups.values())
    # float reference (textbook formula), tolerance covers the pinned
    # micro-quantization in the query
    sp2 = sum(
        (len(g) * sum(x * x for x in g) - sum(g) ** 2) / len(g)
        for g in groups.values()
    ) / (n_tot - k)
    t_num = (n_tot - k) * math.log(sp2) - sum(
        (len(g) - 1)
        * math.log(
            (len(g) * sum(x * x for x in g) - sum(g) ** 2)
            / (len(g) * (len(g) - 1))
        )
        for g in groups.values()
    )
    c = 1.0 + (sum(1.0 / (len(g) - 1) for g in groups.values()) - 1.0 / (n_tot - k)) / (
        3.0 * (k - 1)
    )
    (row,) = _run(spark, "agg_bartlett_test")
    assert (row["k_groups"], row["n_total"]) == (k, n_tot)
    assert abs(row["bartlett_t"] - t_num / c) < 2e-3  # micro-quantized ln terms


def test_ece_mce(spark):
    t = pq.read_table(f"{SF_DIR}/events.parquet").to_pydict()
    cs = [_cents(v) for v in t["value"]]
    ys = [1 if et in ("purchase", "signup") else 0 for et in t["event_type"]]
    mc = max(cs)
    bins = defaultdict(lambda: [0, 0, 0])  # n, sum_cents, sum_y
    for c, y in zip(cs, ys):
        b = min(9, c * 10 // (mc + 1))
        bins[b][0] += 1
        bins[b][1] += c
        bins[b][2] += y
    n = sum(v[0] for v in bins.values())
    ece = sum(abs(v[2] * mc - v[1]) for v in bins.values()) * 1_000_000 // (mc * n)
    mce = max(abs(v[2] * mc - v[1]) * 10_000 // (v[0] * mc) for v in bins.values())
    (row,) = _run(spark, "ml_expected_calibration_error")
    assert (row["n_total"], row["n_bins"]) == (n, len(bins))
    assert (row["ece_micro"], row["mce_bp"]) == (ece, mce)


def _coorder_sym():
    t = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pydict()
    bo = defaultdict(set)
    for o, p in zip(t["l_orderkey"], t["l_partkey"]):
        bo[o].add(p)
    w = Counter()
    for parts in bo.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                w[(ps[i], ps[j])] += 1
    edges = [e for e, c in w.items() if c >= 2]
    sym = defaultdict(set)
    for u, v in edges:
        sym[u].add(v)
        sym[v].add(u)
    return sym


def test_diamond_census(spark):
    sym = _coorder_sym()
    deg = {u: len(vs) for u, vs in sym.items()}
    cn = Counter()
    for mid, nbrs in sym.items():
        if deg[mid] > 32:
            continue
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                # the larger endpoint is the wedge's s2.v — the hub cap
                # applies to it (and to the middle), not to s1.u
                if deg[ns[j]] <= 32:
                    cn[(ns[i], ns[j])] += 1
    (row,) = _run(spark, "graph_diamond_census")
    assert row["n_corner_pairs"] == len(cn)
    assert row["n_pairs_cn_ge2"] == sum(1 for c in cn.values() if c >= 2)
    assert row["n_diamonds"] == sum(c * (c - 1) for c in cn.values()) // 2
    assert row["max_cn"] == max(cn.values())


def test_wcc_minlabel_3round(spark):
    sym = _coorder_sym()
    lbl = {u: u for u in sym}
    for _ in range(3):
        lbl = {
            u: min([lbl[u]] + [lbl[v] for v in sym[u]]) for u in sym
        }
    sizes = Counter(Counter(lbl.values()).values())
    rows = {r["component_size"]: r["n_labels"] for r in _run(spark, "graph_wcc_minlabel_3round")}
    assert rows == dict(sizes)
