"""Round-10 reference tests, part 7: pure-Python third implementations
for wave 8 — Mood's median test, Poisson dispersion, seasonal
Mann-Kendall (direct within-weekday pair loops), SMA crossovers,
log-loss (Decimal-quantized ln table), regression metrics, power-law
MLE, and the milli-quantized silhouette (direct per-vector loop).
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


def _micro(x: float) -> int:
    return int(
        Decimal(repr(1e6 * x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def _events():
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    d = t.to_pydict()
    # pyarrow surfaces this parquet's timestamps as timestamp[us]:
    # cast(int64) is already epoch-MICROS (same convention as refs4's
    # Durbin-Watson daily bucketing)
    d["ts_us"] = t.column("ts").cast("int64").to_pylist()
    return d


def test_mood_median(spark):
    ev = _events()
    xs = [_cents(v) for v in ev["value"]]
    n = len(xs)
    med = sorted(xs)[(n + 1) // 2 - 1]
    cells = defaultdict(lambda: [0, 0])  # n_g, above
    for et, x in zip(ev["event_type"], xs):
        cells[et][0] += 1
        cells[et][1] += 1 if x > med else 0
    col_above = sum(v[1] for v in cells.values())
    chi2_micro = 0
    for n_g, o in cells.values():
        chi2_micro += _micro((o * n - n_g * col_above) ** 2 / (n * n_g * col_above))
        ob = n_g - o
        chi2_micro += _micro(
            (ob * n - n_g * (n - col_above)) ** 2 / (n * n_g * (n - col_above))
        )
    (row,) = _run(spark, "agg_mood_median_test")
    assert (row["n_total"], row["median_cents"], row["df"]) == (
        n,
        med,
        len(cells) - 1,
    )
    assert row["chi2_micro"] == chi2_micro


def test_poisson_dispersion(spark):
    ev = _events()
    day_us = 86_400 * 10**6
    daily = Counter(u // day_us for u in ev["ts_us"])
    cs = list(daily.values())
    n = len(cs)
    num = n * sum(c * c for c in cs) - sum(cs) ** 2
    (row,) = _run(spark, "agg_poisson_dispersion_test")
    assert (row["n_days"], row["n_events"], row["disp_num"]) == (
        n,
        sum(cs),
        num,
    )
    assert row["chi2"] == round(num / sum(cs), 6)
    assert row["dispersion_index"] == round(num / ((n - 1.0) * sum(cs)), 6)


def _daily_with_idx():
    ev = _events()
    day_us = 86_400 * 10**6
    daily = defaultdict(int)
    for u, v in zip(ev["ts_us"], ev["value"]):
        daily[u // day_us] += _cents(v)
    return dict(sorted(daily.items()))


def test_seasonal_mann_kendall(spark):
    daily = _daily_with_idx()
    by_wd = defaultdict(list)
    for idx, cents in daily.items():
        by_wd[(idx + 4) % 7].append(cents)  # day order preserved
    s_total = 0
    var18 = 0
    for ws in by_wd.values():
        m = len(ws)
        for i in range(m):
            for j in range(i + 1, m):
                s_total += (ws[j] > ws[i]) - (ws[j] < ws[i])
        ties = Counter(ws)
        tie_term = sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
        )
        var18 += m * (m - 1) * (2 * m + 5) - tie_term
    zc = s_total - 1 if s_total > 0 else (s_total + 1 if s_total < 0 else 0)
    z = zc / math.sqrt(var18 / 18.0)
    (row,) = _run(spark, "tw_seasonal_mann_kendall")
    assert (row["n_days"], row["s_total"], row["var_s_x18"]) == (
        len(daily),
        s_total,
        var18,
    )
    assert row["z_score"] == round(z, 6)


def test_sma_crossover(spark):
    ys = list(_daily_with_idx().values())
    signs = []
    for t in range(len(ys)):
        if t >= 19:
            s5 = sum(ys[t - 4 : t + 1])
            s20 = sum(ys[t - 19 : t + 1])
            signs.append(1 if 4 * s5 > s20 else (-1 if 4 * s5 < s20 else 0))
    golden = sum(
        1 for p, c in zip(signs, signs[1:]) if p < 0 and c > 0
    )
    death = sum(1 for p, c in zip(signs, signs[1:]) if p > 0 and c < 0)
    (row,) = _run(spark, "tw_sma_crossover_signals")
    assert (row["n_valid_days"], row["n_golden_cross"], row["n_death_cross"]) == (
        len(signs),
        golden,
        death,
    )


def test_log_loss(spark):
    ev = _events()
    cs = [_cents(v) for v in ev["value"]]
    ys = [1 if et in ("purchase", "signup") else 0 for et in ev["event_type"]]
    mc = max(cs)
    lnp = {c: _micro(math.log((c + 1.0) / (mc + 2.0))) for c in set(cs)}
    ln1p = {c: _micro(math.log((mc + 1.0 - c) / (mc + 2.0))) for c in set(cs)}
    total = sum(lnp[c] if y else ln1p[c] for c, y in zip(cs, ys))
    n = len(cs)
    npos = sum(ys)
    p = npos / n
    base = _micro(-(p * math.log(p) + (1 - p) * math.log(1 - p)))
    (row,) = _run(spark, "ml_log_loss_calibrated")
    assert (row["n_total"], row["n_pos"]) == (n, npos)
    assert row["logloss_micro_nats"] == (-total) // n
    assert row["base_entropy_micro_nats"] == base


def test_regression_metrics(spark):
    ev = _events()
    groups = defaultdict(list)
    for et, v in zip(ev["event_type"], ev["value"]):
        groups[et].append(_cents(v))
    n = sum(len(g) for g in groups.values())
    mae_sum = 0
    ss_res = 0
    for xs in groups.values():
        ng, s1 = len(xs), sum(xs)
        mae_sum += sum(abs(ng * x - s1) for x in xs) // ng
        ss_res += sum((ng * x - s1) ** 2 for x in xs) // (ng * ng)
    allx = [x for g in groups.values() for x in g]
    sstot = (n * sum(x * x for x in allx) - sum(allx) ** 2) / n
    (row,) = _run(spark, "ml_regression_metrics")
    assert (row["n_total"], row["k_groups"]) == (n, len(groups))
    assert row["mae_micro_cents"] == mae_sum * 1_000_000 // n
    assert row["rmse_cents"] == round(math.sqrt(ss_res / n), 6)
    assert row["r2"] == round(1.0 - ss_res / sstot, 6)


def test_powerlaw_mle(spark):
    from .test_round10_refs5 import _coorder_sym

    sym = _coorder_sym()
    degs = [len(v) for v in sym.values() if len(v) >= 2]
    n = len(degs)
    sum_ln = sum(_micro(math.log(d / 1.5)) for d in degs)
    (row,) = _run(spark, "graph_degree_powerlaw_mle")
    assert (row["n_tail"], row["x_min"], row["sum_ln_micro"]) == (n, 2, sum_ln)
    assert row["alpha_hat"] == round(1.0 + n * 1e6 / sum_ln, 6)


def test_silhouette(spark):
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    xm = {
        i: [
            int(
                Decimal(repr(float(x) * 1000)).quantize(
                    Decimal("1"), rounding=ROUND_HALF_UP
                )
            )
            for x in v
        ]
        for i, v in zip(t["vec_id"], t["embedding"])
    }
    lab = dict(zip(t["vec_id"], t["label"]))
    by_label = defaultdict(list)
    for i, l in lab.items():
        by_label[l].append(i)
    cent = {
        l: (
            [sum(xm[i][p] for i in ids) for p in range(64)],
            len(ids),
        )
        for l, ids in by_label.items()
    }
    sums = defaultdict(int)
    for i, v in xm.items():
        ds = {}
        for l, (s, nc) in cent.items():
            num = sum((nc * x - sv) ** 2 for x, sv in zip(v, s))
            ds[l] = math.sqrt(num) / nc
        a = ds[lab[i]]
        b = min(d for l, d in ds.items() if l != lab[i])
        sums[lab[i]] += _micro((b - a) / max(a, b))
    rows = {r["label"]: r for r in _run(spark, "sim_silhouette_by_label")}
    for l, ids in by_label.items():
        assert rows[l]["n_vecs"] == len(ids)
        # both engines' integer division truncates toward zero
        # (negative sums possible on a random embedding space):
        tv = int(sums[l] / len(ids))
        assert rows[l]["mean_silhouette_micro"] == tv
