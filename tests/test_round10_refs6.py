"""Round-10 reference tests, part 6: pure-Python third implementations
for wave 7 — Jarque-Bera, Cohen's d / Hedges' g, best-F1 sweep,
turning points, Freeman centralization, self-BLEU-2 (clipped counts
computed DIRECTLY against max-other-doc counts, vs the query's
per-gram top-2 trick), Hamming recall, and the LATERAL top-k.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR
from .test_round10_refs4 import _cosine_ranked, _embeddings
from .test_round10_refs5 import _coorder_sym


def _run(spark, name):
    return all_specs()[name].fn(spark, SF_DIR).collect()


def _cents(v: float) -> int:
    return int(
        Decimal(repr(float(v))).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        * 100
    )


def _events():
    return pq.read_table(f"{SF_DIR}/events.parquet").to_pydict()


def test_jarque_bera(spark):
    ev = _events()
    groups = defaultdict(list)
    for et, v in zip(ev["event_type"], ev["value"]):
        groups[et].append(_cents(v))
    rows = {r["event_type"]: r for r in _run(spark, "agg_jarque_bera")}
    assert set(rows) == set(groups)
    for et, xs in groups.items():
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        s, k = m3 / m2**1.5, m4 / m2**2
        jb = n / 6.0 * (s * s + (k - 3.0) ** 2 / 4.0)
        row = rows[et]
        assert row["n_events"] == n
        assert abs(row["skewness"] - s) < 2e-6
        assert abs(row["kurtosis"] - k) < 2e-6
        assert abs(row["jb_stat"] - jb) < 1e-4 * max(1.0, abs(jb))


def test_cohens_d(spark):
    ev = _events()
    a = [_cents(v) for et, v in zip(ev["event_type"], ev["value"]) if et == "purchase"]
    b = [_cents(v) for et, v in zip(ev["event_type"], ev["value"]) if et == "click"]
    na, nb = len(a), len(b)
    sp2 = (
        (na * sum(x * x for x in a) - sum(a) ** 2) / na
        + (nb * sum(x * x for x in b) - sum(b) ** 2) / nb
    ) / (na + nb - 2)
    d = (sum(a) / na - sum(b) / nb) / math.sqrt(sp2)
    g = d * (1 - 3.0 / (4 * (na + nb) - 9))
    se = math.sqrt((na + nb) / (na * nb) + d * d / (2 * (na + nb)))
    (row,) = _run(spark, "ml_cohens_d_effect")
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert row["mean_diff_micro_cents"] == (
        (sum(a) * nb - sum(b) * na) * 1_000_000 // (na * nb)
    )
    for col, want in (
        ("cohens_d", d),
        ("hedges_g", g),
        ("ci_lo", d - 1.96 * se),
        ("ci_hi", d + 1.96 * se),
    ):
        assert abs(row[col] - want) < 2e-6


def test_best_f1(spark):
    ev = _events()
    cs = [_cents(v) for v in ev["value"]]
    ys = [1 if et in ("purchase", "signup") else 0 for et in ev["event_type"]]
    mc = max(cs)
    bins = [min(9, c * 10 // (mc + 1)) for c in cs]
    best = None
    for t in range(1, 10):
        tp = sum(y for b, y in zip(bins, ys) if b >= t)
        fp = sum(1 - y for b, y in zip(bins, ys) if b >= t)
        fn = sum(y for b, y in zip(bins, ys) if b < t)
        f1 = 2 * tp * 1_000_000 // (2 * tp + fp + fn)
        if best is None or f1 > best[4]:
            best = (t, tp, fp, fn, f1)
    (row,) = _run(spark, "ml_best_f1_threshold")
    assert (
        row["best_threshold_bin"],
        row["tp"],
        row["fp"],
        row["fn"],
        row["f1_micro"],
    ) == best


def test_turning_points(spark):
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    d = t.to_pydict()
    ts_us = t.column("ts").cast("int64").to_pylist()
    day_us = 86_400 * 10**6
    daily = Counter()
    for us, v in zip(ts_us, d["value"]):
        daily[us // day_us] += _cents(v)
    ys = [daily[k] for k in sorted(daily)]
    n = len(ys)
    tp = sum(
        1
        for i in range(1, n - 1)
        if (ys[i] - ys[i - 1]) * (ys[i + 1] - ys[i]) < 0
    )
    z = (tp - 2.0 * (n - 2) / 3.0) / math.sqrt((16.0 * n - 29.0) / 90.0)
    (row,) = _run(spark, "tw_turning_points_test")
    assert (row["n_days"], row["n_turning"]) == (n, tp)
    assert (row["expected_x3"], row["var_x90"]) == (2 * (n - 2), 16 * n - 29)
    assert row["z_score"] == round(z, 6)


def test_degree_centralization(spark):
    sym = _coorder_sym()
    degs = [len(v) for v in sym.values()]
    n = len(degs)
    dmax = max(degs)
    central = n * dmax - sum(degs)
    var_num = n * sum(d * d for d in degs) - sum(degs) ** 2
    (row,) = _run(spark, "graph_degree_centralization")
    assert (row["n_nodes"], row["n_edges"], row["d_max"]) == (
        n,
        sum(degs) // 2,
        dmax,
    )
    assert (row["central_num"], row["var_num"]) == (central, var_num)
    assert row["freeman_centralization"] == round(
        central / ((n - 1.0) * (n - 2.0)), 6
    )
    assert row["degree_variance"] == round(var_num / (float(n) * n), 6)


def test_self_bleu2(spark):
    t = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    toks = {
        d: [w for w in txt.split(" ") if w]
        for d, txt in zip(t["doc_id"], t["text"])
    }
    rows = {r["doc_id"]: r for r in _run(spark, "text_self_bleu2")}
    assert set(rows) == {d for d in toks if d < 20}

    def counts(ws, n):
        if n == 1:
            return Counter(ws)
        return Counter(
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        )

    for d in rows:
        row = rows[d]
        ps = {}
        for n, (ncol, pcol) in ((1, ("n_uni", "p1_micro")), (2, ("n_bi", "p2_micro"))):
            cd = counts(toks[d], n)
            # DIRECT max-over-other-docs reference counts
            other_max = Counter()
            for d2, ws2 in toks.items():
                if d2 == d:
                    continue
                for g, c in counts(ws2, n).items():
                    if g in cd and c > other_max[g]:
                        other_max[g] = c
            total = sum(cd.values())
            clip = sum(min(c, other_max[g]) for g, c in cd.items())
            assert row[ncol] == total
            assert row[pcol] == clip * 1_000_000 // total
            ps[n] = row[pcol]
        want = int(
            Decimal(repr(math.sqrt(float(ps[1] * ps[2])))).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
        assert row["selfbleu2_micro"] == want


def test_hamming_recall(spark):
    vecs, _ = _embeddings()
    full = _cosine_ranked(vecs, k=10)
    sigs = {i: [1 if x > 0 else 0 for x in v] for i, v in vecs.items()}
    rows = {r["query_id"]: r for r in _run(spark, "sim_hamming_recall_topk")}
    for q in full:
        dists = sorted(
            (sum(a != b for a, b in zip(sigs[q], sigs[c])), c)
            for c in sigs
            if c != q
        )
        ham10 = {c for _, c in dists[:10]}
        hits = len({c for _, c in full[q]} & ham10)
        assert rows[q]["n_hits"] == hits
        assert rows[q]["recall_bp"] == hits * 1000


def test_lateral_topk(spark):
    t = pq.read_table(f"{SF_DIR}/orders.parquet").to_pydict()
    per_cust = defaultdict(list)
    for ck, ok, tp in zip(t["o_custkey"], t["o_orderkey"], t["o_totalprice"]):
        if ck < 100:
            per_cust[ck].append((-_cents(tp), ok))
    want = set()
    for ck, lst in per_cust.items():
        for negp, ok in sorted(lst)[:3]:
            want.add((ck, ok, -negp))
    got = {
        (r["c_custkey"], r["o_orderkey"], r["price_cents"])
        for r in _run(spark, "sql_lateral_topk_per_customer")
    }
    assert got == want
