"""Round-10 reference tests, part 3: pure-Python/numpy third
implementations for wave 4 — Cramér-von Mises, PSI, DeLong variance
(BRUTE-FORCE pairwise placements vs the rank-algebra query),
Page-Hinkley (the literal recurrence vs the closed form), Hurst R/S,
the LSH planner's S-curve, and the full PQ SDC/ADC pipeline in numpy.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
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
    d["ts_us"] = t.column("ts").cast("int64").to_pylist()
    return d


def _run(spark, name):
    return all_specs()[name].fn(spark, SF_DIR).collect()


def _micro(x: float) -> int:
    return int(
        Decimal(repr(1e6 * x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )


def test_cramer_von_mises(spark):
    ev = _events()
    rows = sorted(
        (
            (_cents(v), eid, 1 if et == "purchase" else 0)
            for eid, et, v in zip(ev["event_id"], ev["event_type"], ev["value"])
            if et in ("purchase", "click")
        )
    )
    n = sum(r[2] for r in rows)
    m = len(rows) - n
    own = {1: 0, 0: 0}
    u = 0
    for pooled, (_, _, is_a) in enumerate(rows, 1):
        own[is_a] += 1
        gap2 = (pooled - own[is_a]) ** 2
        u += (n if is_a else m) * gap2
    (row,) = _run(spark, "agg_cramer_von_mises")
    assert (row["n_a"], row["n_b"], row["u_stat"]) == (n, m, str(u))
    t = u / (n * m * (n + m)) - (4 * n * m - 1) / (6 * (n + m))
    assert row["cvm_t"] == round(t, 6)


def test_psi(spark):
    ev = _events()
    mid = (min(ev["ts_us"]) + max(ev["ts_us"])) // 2
    cs = [_cents(v) for v in ev["value"]]
    d = max(cs) + 1
    n1 = Counter()
    n2 = Counter()
    for c, t in zip(cs, ev["ts_us"]):
        (n1 if t < mid else n2)[min(9, c * 10 // d)] += 1
    bins = sorted(set(n1) | set(n2))
    k1 = {b: n1.get(b, 0) + 1 for b in bins}
    k2 = {b: n2.get(b, 0) + 1 for b in bins}
    t1, t2 = sum(k1.values()), sum(k2.values())
    s = 0
    for b in bins:
        l_micro = _micro(math.log(k1[b] * t2 / (k2[b] * t1)))
        s += (k1[b] * t2 - k2[b] * t1) * l_micro
    psi = round(s / (1e6 * t1 * t2), 6)
    rows = {r["bin"]: r for r in _run(spark, "ml_psi_population_stability")}
    assert set(rows) == set(bins)
    for b in bins:
        assert rows[b]["n_first_sm"] == k1[b]
        assert rows[b]["n_second_sm"] == k2[b]
        assert rows[b]["psi"] == psi


def test_delong_bruteforce(spark):
    """Placements by O(n·m) BRUTE FORCE vs the rank-algebra query."""
    ev = _events()
    pos = [
        _cents(v)
        for et, v in zip(ev["event_type"], ev["value"])
        if et in ("purchase", "signup")
    ]
    neg = [
        _cents(v)
        for et, v in zip(ev["event_type"], ev["value"])
        if et not in ("purchase", "signup")
    ]
    nc = Counter(neg)
    pc = Counter(pos)
    n, m = len(pos), len(neg)
    # x2-scaled placements
    p = [2 * sum(c for y, c in nc.items() if y < x) + nc.get(x, 0) for x in pos]
    q = [2 * sum(c for y, c in pc.items() if y > x) + pc.get(x, 0) for x in neg]
    sp, spp = sum(p), sum(x * x for x in p)
    sq, sqq = sum(q), sum(x * x for x in q)
    (row,) = _run(spark, "ml_auc_delong_variance")
    assert (row["n_pos"], row["n_neg"]) == (n, m)
    assert row["auc_ppm"] == sp * 1_000_000 // (2 * n * m)
    assert row["v10_var_num"] == str(n * spp - sp * sp)
    assert row["v01_var_num"] == str(m * sqq - sq * sq)
    s10 = (n * spp - sp * sp) / (n * (n - 1) * 4 * m * m)
    s01 = (m * sqq - sq * sq) / (m * (m - 1) * 4 * n * n)
    assert row["auc_se"] == round(math.sqrt(s10 / n + s01 / m), 6)


def _daily_totals(ev):
    d = defaultdict(int)
    for ts, v in zip(ev["ts_us"], ev["value"]):
        d[ts // US_PER_DAY] += _cents(v)
    return [c for _, c in sorted(d.items())]


def test_page_hinkley_recurrence(spark):
    """The literal PH recurrence equals the query's closed form."""
    xs = _daily_totals(_events())
    n, s = len(xs), sum(xs)
    ph, mx = 0, 0
    for x in xs:
        ph = max(0, ph + (x * n - s))  # x - mean, scaled by n
        mx = max(mx, ph)
    (row,) = _run(spark, "tw_page_hinkley")
    assert row["n_days"] == n
    assert row["max_ph_x_n"] == mx


def test_hurst_rs(spark):
    xs = _daily_totals(_events())
    pts = []
    for w in (5, 10, 15):
        for b in range(len(xs) // w):
            blk = xs[b * w : (b + 1) * w]
            sb = sum(blk)
            sxx = sum(x * x for x in blk)
            cum = 0
            devs = []
            for t, x in enumerate(blk, 1):
                cum += x
                devs.append(cum * w - t * sb)
            r = max(max(devs), 0) - min(min(devs), 0)
            den2 = w * sxx - sb * sb
            if r > 0 and den2 > 0:
                pts.append((_micro(math.log(w)), _micro(math.log(r / math.sqrt(den2)))))
    np_ = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    (row,) = _run(spark, "tw_hurst_rescaled_range")
    assert row["n_blocks"] == np_
    assert row["hurst_exponent"] == round(
        (np_ * sxy - sx * sy) / (np_ * sxx - sx * sx), 6
    )
    assert 0.0 < row["hurst_exponent"] < 1.2  # a meaningful exponent


def test_lsh_planner_scurve(spark):
    """Monotonicity contracts of the S-curve forecast: more bands =
    more recall at fixed b*r; and the expected recall is the exact
    floor-mean of the per-pair micro probabilities recomputed from the
    engine's own observed-pair population size."""
    rows = {
        (r["bands"], r["rows_per_band"]): r
        for r in _run(spark, "dedup_lsh_param_planner")
    }
    assert set(rows) == {(32, 1), (16, 2), (8, 4), (4, 8), (2, 16), (1, 32)}
    n_pairs = {r["n_true_pairs"] for r in rows.values()}
    assert len(n_pairs) == 1 and n_pairs.pop() > 0
    recalls = [
        rows[k]["expected_recall_micro"]
        for k in [(32, 1), (16, 2), (8, 4), (4, 8), (2, 16), (1, 32)]
    ]
    # banding coarser (fewer bands, longer rows) can only LOWER the
    # candidate probability at every j <= 1 — the forecast must be
    # monotone non-increasing along the list
    assert recalls == sorted(recalls, reverse=True)
    assert recalls[0] > 900_000  # 32 bands of 1 row catch ~everything


def test_pq_sdc_adc_numpy(spark):
    """The full SDC/ADC pipeline re-done in numpy: quantized dims,
    rank-seeded codebook, packed-min code assignment, both distance
    modes, exact distances — bit-equal error totals and recalls."""
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    ids = np.array(t["vec_id"])
    order = np.argsort(ids)
    ids = ids[order]
    vecs = [t["embedding"][i] for i in order]
    qx = np.array(
        [
            [
                int(
                    Decimal(repr(float(np.float64(np.float32(x)))))
                    .quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
                    .scaleb(6)
                )
                for x in v
            ]
            for v in vecs
        ],
        dtype=np.int64,
    )
    d = qx.shape[1]
    m, k = 8, 16
    d_sub = d // m
    cent = qx[:k]  # seeds = 16 smallest ids, code = rank
    # code assignment per (vec, sub): packed min d2*16+code
    codes = np.zeros((len(ids), m), dtype=np.int64)
    for s in range(m):
        sl = slice(s * d_sub, (s + 1) * d_sub)
        d2 = ((qx[:, None, sl] - cent[None, :, sl]) ** 2).sum(axis=2)
        key = d2 * k + np.arange(k)[None, :]
        codes[:, s] = key.min(axis=1) % k
    qids = [i for i in range(len(ids)) if ids[i] < 4]
    rows = {r["q_vec_id"]: r for r in _run(spark, "sim_pq_sdc_vs_adc")}
    for qi in qids:
        others = [i for i in range(len(ids)) if i != qi]
        ex = ((qx[others] - qx[qi][None, :]) ** 2).sum(axis=1)
        adc = np.zeros(len(others), dtype=np.int64)
        sdc = np.zeros(len(others), dtype=np.int64)
        for s in range(m):
            sl = slice(s * d_sub, (s + 1) * d_sub)
            lut = ((cent[:, sl] - qx[qi][None, sl]) ** 2).sum(axis=1)
            adc += lut[codes[others, s]]
            cc = ((cent[codes[qi, s], sl][None, :] - cent[:, sl]) ** 2).sum(axis=1)
            sdc += cc[codes[others, s]]
        r = rows[int(ids[qi])]
        assert r["n_corpus"] == len(others)
        assert r["adc_abs_err"] == int(np.abs(adc - ex).sum())
        assert r["sdc_abs_err"] == int(np.abs(sdc - ex).sum())

        def top10(dist):
            keys = sorted(zip(dist.tolist(), [int(ids[i]) for i in others]))[:10]
            return {i for _, i in keys}

        exact10 = top10(ex)
        assert r["recall10_adc"] == len(exact10 & top10(adc))
        assert r["recall10_sdc"] == len(exact10 & top10(sdc))
        assert bool(r["adc_tighter"]) == (
            int(np.abs(adc - ex).sum()) <= int(np.abs(sdc - ex).sum())
        )
