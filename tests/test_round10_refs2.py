"""Round-10 reference tests, part 2: pure-Python recomputation of the
statistics / timeseries / eval wave — the independent THIRD
implementation beside each Spark query and its DuckDB oracle.

Covers: Mann-Kendall (direct pairwise), Friedman, Cochran's Q,
McNemar, Cliff's delta (BRUTE-FORCE pairwise vs the rank-algebra
query), Grubbs, Hodges-Lehmann, Ljung-Box, day-of-week eta-squared,
the Holt integer recurrence (direct loop), Heaps-law OLS, lift/gains,
Brier decomposition (direct per-row), harmonic-2hop (direct BFS),
per-source TF-IDF keywords, Kish ESS, and the n-gram novelty curve.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR

US_PER_DAY = 86_400 * 10**6


def _cents(v: float) -> int:
    return int(
        Decimal(repr(float(v))).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        * 100
    )


def _events():
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    d = t.to_pydict()
    # pyarrow reads the TIMESTAMP(NANOS) column truncated to micros —
    # the same truncation DuckDB applies and Spark's ts DIV 1000 computes
    d["ts_us"] = t.column("ts").cast("int64").to_pylist()
    return d


def _run(spark, name):
    return all_specs()[name].fn(spark, SF_DIR).collect()


def _daily_totals(ev, pred=lambda et: True):
    d = defaultdict(int)
    for et, ts, v in zip(ev["event_type"], ev["ts_us"], ev["value"]):
        if pred(et):
            d[ts // US_PER_DAY] += _cents(v)
    return [c for _, c in sorted(d.items())]


def _daily_close(ev):
    """floor-mean cents per (type, day), series in day order per type."""
    sums = defaultdict(lambda: [0, 0])
    for et, ts, v in zip(ev["event_type"], ev["ts_us"], ev["value"]):
        s = sums[(et, ts // US_PER_DAY)]
        s[0] += _cents(v)
        s[1] += 1
    series = defaultdict(list)
    for (et, day), (s, n) in sorted(sums.items()):
        series[et].append(s // n)
    return series


def test_mann_kendall(spark):
    xs = _daily_totals(_events())
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(xs)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    (row,) = _run(spark, "agg_mann_kendall_trend")
    assert row["n_days"] == n and row["s_stat"] == s
    assert row["var_s_x18"] == var18
    zc = s - 1 if s > 0 else s + 1 if s < 0 else 0
    assert row["z_score"] == round(zc / math.sqrt(var18 / 18.0), 6)


def test_friedman(spark):
    ev = _events()
    tot = defaultdict(int)
    for u, et, v in zip(ev["user_id"], ev["event_type"], ev["value"]):
        tot[(u, et)] += _cents(v)
    users = defaultdict(list)
    for (u, et), s in tot.items():
        users[u].append((s, et))
    blocks = {u: sorted(v) for u, v in users.items() if len(v) == 5}
    r_sum = Counter()
    for u, vals in blocks.items():
        for r, (_, et) in enumerate(vals, 1):
            r_sum[et] += r
    b = len(blocks)
    srr = sum(r * r for r in r_sum.values())
    q = round(12.0 * srr / (b * 5 * 6) - 3.0 * b * 6, 6)
    rows = {r["event_type"]: r for r in _run(spark, "agg_friedman_test")}
    for et, rs in r_sum.items():
        assert rows[et]["r_sum"] == rs
        assert rows[et]["n_blocks"] == b
        assert rows[et]["q_statistic"] == q


def test_cochran_q(spark):
    ev = _events()
    cnt = Counter(zip(ev["user_id"], ev["event_type"]))
    tot = Counter()
    for (u, _), c in cnt.items():
        tot[u] += c
    x = {(u, et): 1 if c * 5 > tot[u] else 0 for (u, et), c in cnt.items()}
    r_u = Counter()
    c_t = Counter()
    for (u, et), v in x.items():
        r_u[u] += v
        c_t[et] += v
    scc = sum(c * c for c in c_t.values())
    sc = sum(c_t.values())
    sr = sum(r_u.values())
    srr = sum(r * r for r in r_u.values())
    (row,) = _run(spark, "agg_cochran_q")
    assert (row["scc"], row["sc"], row["sr"], row["srr"]) == (scc, sc, sr, srr)
    assert row["n_users"] == len(tot)
    assert row["q_statistic"] == round(
        4.0 * (5.0 * scc - float(sc) * sc) / (5.0 * sr - srr), 6
    )


def test_mcnemar(spark):
    ev = _events()
    us = list(ev["ts_us"])
    mid = (min(us) + max(us)) // 2
    x1, x2 = set(), set()
    for u, et, t in zip(ev["user_id"], ev["event_type"], us):
        if et == "purchase":
            (x1 if t < mid else x2).add(u)
    users = set(ev["user_id"])
    b = sum(1 for u in users if u in x1 and u not in x2)
    c = sum(1 for u in users if u not in x1 and u in x2)
    (row,) = _run(spark, "agg_mcnemar_paired")
    assert (row["b"], row["c"], row["n_users"]) == (b, c, len(users))
    exp = 0.0 if b + c == 0 else round((abs(b - c) - 1) ** 2 / (b + c), 6)
    assert row["chi2_cc"] == exp


def test_cliff_delta_bruteforce(spark):
    ev = _events()
    a = [_cents(v) for et, v in zip(ev["event_type"], ev["value"]) if et == "purchase"]
    b = [_cents(v) for et, v in zip(ev["event_type"], ev["value"]) if et == "click"]
    ca, cb = Counter(a), Counter(b)
    gt = sum(na * nb for x, na in ca.items() for y, nb in cb.items() if x > y)
    lt = sum(na * nb for x, na in ca.items() for y, nb in cb.items() if x < y)
    tied = sum(na * cb.get(x, 0) for x, na in ca.items())
    (row,) = _run(spark, "agg_cliff_delta")
    assert (row["pairs_gt"], row["pairs_lt"], row["pairs_tied"]) == (gt, lt, tied)
    assert (row["n_a"], row["n_b"]) == (len(a), len(b))
    assert row["cliff_delta"] == round((gt - lt) / (len(a) * len(b)), 6)


def test_grubbs(spark):
    ev = _events()
    ys = [_cents(v) for v in ev["value"]]
    n, sy = len(ys), sum(ys)
    dev_num = max(abs(y * n - sy) for y in ys)
    # tie-break is MIN value among max deviations
    outlier = min(y for y in ys if abs(y * n - sy) == dev_num)
    syy = sum(y * y for y in ys)
    s = math.sqrt((n * syy - sy * sy) / (n * (n - 1)))
    (row,) = _run(spark, "agg_grubbs_outlier")
    assert (row["n"], row["outlier_cents"], row["dev_num"]) == (n, outlier, dev_num)
    assert row["g_statistic"] == round(dev_num / (n * s), 6)


def test_hodges_lehmann(spark):
    ev = _events()
    pa = _daily_totals(ev, lambda et: et == "purchase")
    vb = _daily_totals(ev, lambda et: et == "view")
    diffs = sorted(x - y for x in pa for y in vb)
    (row,) = _run(spark, "agg_hodges_lehmann_shift")
    assert row["n_pairs"] == len(diffs)
    assert row["hl_shift_cents"] == diffs[(len(diffs) + 1) // 2 - 1]


def _acf_micro(xs, k):
    n = len(xs) - k
    x, y = xs[:-k], xs[k:]
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx, syy = sum(a * a for a in x), sum(b * b for b in y)
    r = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return int(
        Decimal(repr(1e6 * r)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def test_ljung_box(spark):
    series = _daily_close(_events())
    rows = {r["event_type"]: r for r in _run(spark, "tw_ljung_box")}
    for et, xs in series.items():
        n = len(xs)
        tsum = sum(
            (_acf_micro(xs, k) ** 2) // (n - k) for k in (1, 2, 3, 4, 5)
        )
        assert rows[et]["n_days"] == n
        assert rows[et]["q_ljung_box"] == round(n * (n + 2.0) * tsum / 1e12, 6)


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — Spark DIV / DuckDB //
    semantics (Python // floors, which differs for negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_holt_recurrence(spark):
    series = _daily_close(_events())
    rows = {r["event_type"]: r for r in _run(spark, "tw_holt_double_smoothing")}
    for et, xs in series.items():
        l = xs[0] * 1_000_000
        b = (xs[1] - xs[0]) * 1_000_000
        for x in xs[1:]:
            l_new = _tdiv(3 * x * 1_000_000 + 7 * (l + b), 10)
            b = _tdiv((l_new - l) + 9 * b, 10)
            l = l_new
        r = rows[et]
        assert (r["level_micro"], r["trend_micro"]) == (l, b)
        assert r["forecast_micro"] == l + b
        assert r["n_days"] == len(xs)


def test_brier_decomposition(spark):
    ev = _events()
    cs = [_cents(v) for v in ev["value"]]
    ys = [
        1 if et in ("purchase", "signup") else 0 for et in ev["event_type"]
    ]
    d = max(cs) + 1
    n, sy = len(cs), sum(ys)
    brier = sum((c / d - y) ** 2 for c, y in zip(cs, ys)) / n
    bins = defaultdict(list)
    for c, y in zip(cs, ys):
        bins[min(9, c * 10 // d)].append((c, y))
    rel = sum(
        len(v) * (sum(c for c, _ in v) / (len(v) * d) - sum(y for _, y in v) / len(v)) ** 2
        for v in bins.values()
    ) / n
    ybar = sy / n
    res = sum(
        len(v) * (sum(y for _, y in v) / len(v) - ybar) ** 2 for v in bins.values()
    ) / n
    unc = ybar * (1 - ybar)
    wbv = sum(
        sum((c / d - sum(cc for cc, _ in v) / (len(v) * d)) ** 2 for c, _ in v)
        for v in bins.values()
    ) / n
    wbc = sum(
        sum(
            (c / d - sum(cc for cc, _ in v) / (len(v) * d))
            * (y - sum(yy for _, yy in v) / len(v))
            for c, y in v
        )
        for v in bins.values()
    ) / n
    (row,) = _run(spark, "ml_brier_decomposition")
    assert (row["n"], row["sy"]) == (n, sy)
    # the engine uses exact-integer numerators with a 1e4 DIV-scale per
    # bin term; allow only that truncation (< 1e-4 relative) vs the
    # float reference
    assert abs(row["brier"] - brier) < 1e-6
    assert abs(row["reliability"] - rel) < 1e-6
    assert abs(row["resolution"] - res) < 1e-6
    assert abs(row["uncertainty"] - unc) < 1e-6
    assert abs(row["within_bin_var"] - wbv) < 1e-6
    assert abs(row["within_bin_cov"] - wbc) < 1e-6
    # the FULL Murphy identity (with the residual terms binning
    # textbooks drop) on the reference side
    assert abs(brier - (rel - res + unc + wbv - 2 * wbc)) < 1e-12


def test_lift_gains(spark):
    ev = _events()
    scored = sorted(
        zip((-_cents(v) for v in ev["value"]), ev["event_id"],
            (1 if et in ("purchase", "signup") else 0 for et in ev["event_type"]))
    )
    n = len(scored)
    p = sum(y for _, _, y in scored)
    dec_rows = defaultdict(lambda: [0, 0])
    for rk, (_, _, y) in enumerate(scored):
        dd = rk * 10 // n
        dec_rows[dd][0] += 1
        dec_rows[dd][1] += y
    rows = {r["decile"]: r for r in _run(spark, "ml_lift_gains_deciles")}
    cum_n = cum_pos = 0
    for dd in sorted(dec_rows):
        n_d, pos_d = dec_rows[dd]
        cum_n += n_d
        cum_pos += pos_d
        r = rows[dd]
        assert (r["n_d"], r["pos_d"], r["cum_n"], r["cum_pos"]) == (
            n_d, pos_d, cum_n, cum_pos,
        )
        assert r["gain_bp"] == cum_pos * 10000 // p
        assert r["lift_bp"] == cum_pos * n * 10000 // (cum_n * p)


def test_harmonic_2hop(spark):
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pydict()
    bip = set(zip(li["l_orderkey"], li["l_partkey"]))
    byo = defaultdict(set)
    for o, pp in bip:
        byo[o].add(pp)
    wc = Counter()
    for parts in byo.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                wc[(ps[i], ps[j])] += 1
    edges = {e for e, w in wc.items() if w >= 2}
    sym = defaultdict(set)
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    hubs = {nd for nd, dd in deg.items() if dd > 32}
    for u, v in edges:
        if v not in hubs:
            sym[u].add(v)
        if u not in hubs:
            sym[v].add(u)
    rows = {r["part"]: r for r in _run(spark, "graph_harmonic_2hop")}
    for u, n1set in sym.items():
        two = set()
        for mid in n1set:
            two |= sym.get(mid, set())
        two.discard(u)
        two -= n1set
        r = rows[u]
        assert r["n_dist1"] == len(n1set)
        assert r["n_dist2"] == len(two)
        assert r["harmonic_x2"] == 2 * len(n1set) + len(two)
    assert set(rows) == {u for u, s in sym.items() if s}


def _docs():
    return pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()


def test_heaps_fit(spark):
    d = _docs()
    order = sorted(zip(d["doc_id"], d["text"]))
    seen: set = set()
    cum_n = cum_v = 0
    pts = []
    for _, text in order:
        toks = text.split(" ")
        cum_n += len(toks)
        for t in toks:
            if t not in seen:
                seen.add(t)
                cum_v += 1
        pts.append((cum_n, cum_v))

    def q(x):
        return int(
            Decimal(repr(1e6 * math.log(x))).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )

    xs = [q(a) for a, _ in pts]
    ys = [q(b) for _, b in pts]
    np_ = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    (row,) = _run(spark, "text_heaps_law_fit")
    assert row["n_points"] == np_
    assert row["total_tokens"] == pts[-1][0]
    assert row["vocab_size"] == pts[-1][1]
    assert row["heaps_beta"] == round(
        (np_ * sxy - sx * sy) / (np_ * sxx - sx * sx), 6
    )
    # the synthetic corpus draws from a small FIXED vocabulary, so the
    # growth curve saturates and beta is far below natural text's
    # 0.4-0.6 — which is exactly the signal the operator exists to
    # raise ("this crawl brings almost no new vocabulary")
    assert 0 < row["heaps_beta"] < 1.05


def test_ngram_novelty_curve(spark):
    d = _docs()
    rows = {r["n"]: r for r in _run(spark, "text_ngram_novelty_curve")}
    for n in (1, 2, 3, 4):
        total = 0
        distinct = set()
        for text in d["text"]:
            toks = text.split(" ")
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                total += 1
                distinct.add(g)
        r = rows[n]
        assert (r["total_grams"], r["distinct_grams"]) == (total, len(distinct))
        assert r["distinct_ratio_bp"] == len(distinct) * 10000 // total


def test_source_tfidf_keywords(spark):
    d = _docs()
    tf = Counter()
    dfs = defaultdict(set)
    for src, text in zip(d["source"], d["text"]):
        for t in text.split(" "):
            tf[(src, t)] += 1
            dfs[t].add(src)
    n_sources = len(set(d["source"]))

    def idf_micro(df):
        return int(
            Decimal(repr(1e6 * math.log(n_sources / df))).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )

    per_src = defaultdict(list)
    for (src, t), f in tf.items():
        score = f * idf_micro(len(dfs[t]))
        if score > 0:
            per_src[src].append((-score, t, f))
    expected = {}
    for src, lst in per_src.items():
        for neg, t, f in sorted(lst)[:3]:
            expected[(src, t)] = (-neg, f)
    got = {
        (r["source"], r["tok"]): (r["score"], r["tf"])
        for r in _run(spark, "text_source_keyword_tfidf")
    }
    assert got == expected


def test_importance_ess(spark):
    d = _docs()
    ns = Counter(d["source"])
    n, k = sum(ns.values()), len(ns)
    w = {s: min(n * 1_000_000 // (k * c), 5_000_000) for s, c in ns.items()}
    snw = sum(ns[s] * w[s] for s in ns)
    snww = sum(ns[s] * w[s] * w[s] for s in ns)
    ess = round(snw * snw / snww, 6)
    rows = {r["source"]: r for r in _run(spark, "pipeline_importance_weights_ess")}
    assert set(rows) == set(ns)
    for s in ns:
        assert rows[s]["n_s"] == ns[s]
        assert rows[s]["w_micro"] == w[s]
        assert rows[s]["ess_kish"] == ess
        assert rows[s]["n_total"] == n


def test_seasonality_eta2(spark):
    ev = _events()
    per = defaultdict(lambda: defaultdict(int))
    for et, ts, v in zip(ev["event_type"], ev["ts_us"], ev["value"]):
        per[et][ts // US_PER_DAY] += _cents(v)
    rows = {r["event_type"]: r for r in _run(spark, "tw_seasonality_strength")}
    for et, days in per.items():
        xs = [(d % 7, c) for d, c in days.items()]  # weekday class
        n = len(xs)
        s = sum(c for _, c in xs)
        sxx = sum(c * c for _, c in xs)
        groups = defaultdict(list)
        for dow, c in xs:
            groups[dow].append(c)
        sb_scaled = sum(
            (sum(g) ** 2) * 1_000_000 // len(g) for g in groups.values()
        )
        s2 = s * s / n
        eta2 = round((sb_scaled / 1e6 - s2) / (sxx - s2), 6)
        r = rows[et]
        assert r["n_days"] == n
        assert abs(r["eta_squared"] - eta2) < 2e-6
