"""Round-10 reference tests, part 8: pure-Python third implementations
for wave 9 — ADF t (float OLS cross-check + exact beta), PACF(2),
Levene-mean (exact integer SSB/SSW), truncated RBO, hash uniformity
(hashlib md5 recomputation), multiclass PRF (direct argmin loop),
token Gini, and the streaming HLL registers (one-shot hashlib
recomputation PLUS a pure-python 3-way partial-merge == whole proof).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR
from .test_round10_refs4 import _cosine_ranked, _embeddings


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
    d["ts_us"] = t.column("ts").cast("int64").to_pylist()
    return d


def _daily_cents():
    ev = _events()
    day_us = 86_400 * 10**6
    daily = defaultdict(int)
    for u, v in zip(ev["ts_us"], ev["value"]):
        daily[u // day_us] += _cents(v)
    return [daily[k] for k in sorted(daily)]


def test_adf_t(spark):
    ys = _daily_cents()
    xs = ys[:-1]
    ds = [b - a for a, b in zip(ys, ys[1:])]
    n = len(xs)
    sx, sd = sum(xs), sum(ds)
    sxx = sum(x * x for x in xs)
    sxd = sum(x * d for x, d in zip(xs, ds))
    sdd = sum(d * d for d in ds)
    c = n * sxd - sx * sd
    v = n * sxx - sx * sx
    u = n * sdd - sd * sd
    rss = (u * v - c * c) / (n * v)
    t_stat = c / math.sqrt(v * (rss / (n - 2)) * n)
    (row,) = _run(spark, "tw_adf_t_stat")
    assert row["n_obs"] == n
    assert row["beta_nano"] == int(c * 1_000_000_000 / v)  # trunc toward zero
    assert abs(row["adf_t"] - t_stat) < 2e-6
    # float OLS cross-check of the exact-moment identity
    b_hat = c / v
    a_hat = (sd - b_hat * sx) / n
    res = [d - a_hat - b_hat * x for x, d in zip(xs, ds)]
    sse = sum(e * e for e in res)
    se = math.sqrt(sse / (n - 2) * n / v)
    assert abs(b_hat / se - t_stat) < 1e-9


def test_pacf_lag2(spark):
    ys = _daily_cents()
    n = len(ys)
    sy = sum(ys)
    c0 = sum((n * y - sy) ** 2 for y in ys)
    c1 = sum((n * ys[t] - sy) * (n * ys[t - 1] - sy) for t in range(1, n))
    c2 = sum((n * ys[t] - sy) * (n * ys[t - 2] - sy) for t in range(2, n))
    r1, r2 = c1 / c0, c2 / c0
    (row,) = _run(spark, "tw_pacf_lag2")
    assert row["n_days"] == n
    assert row["r1"] == round(r1, 6)
    assert row["r2"] == round(r2, 6)
    assert abs(row["pacf_lag2"] - (r2 - r1 * r1) / (1 - r1 * r1)) < 2e-6


def test_levene_mean(spark):
    ev = _events()
    groups = defaultdict(list)
    for et, v in zip(ev["event_type"], ev["value"]):
        groups[et].append(_cents(v))
    sum_tg = 0
    sum_sz1 = 0
    sum_sz2 = 0
    n = 0
    for xs in groups.values():
        ng, s1 = len(xs), sum(xs)
        zq = [abs(ng * x - s1) // ng for x in xs]
        n += ng
        sz1 = sum(zq)
        sum_sz1 += sz1
        sum_sz2 += sum(z * z for z in zq)
        sum_tg += sz1 * sz1 // ng
    k = len(groups)
    ssb = sum_tg - sum_sz1 * sum_sz1 // n
    ssw = sum_sz2 - sum_tg
    w = ((n - k) * ssb) / ((k - 1.0) * ssw)
    (row,) = _run(spark, "agg_levene_mean")
    assert (row["k_groups"], row["n_total"]) == (k, n)
    assert (row["ssb_cents2"], row["ssw_cents2"]) == (ssb, ssw)
    assert row["levene_w"] == round(w, 6)


def test_rank_biased_overlap(spark):
    vecs, _ = _embeddings()
    cos = _cosine_ranked(vecs, k=10)
    sigs = {i: [1 if x > 0 else 0 for x in v] for i, v in vecs.items()}
    rows = {r["query_id"]: r for r in _run(spark, "ml_rank_biased_overlap")}
    for q in cos:
        dists = sorted(
            (sum(a != b for a, b in zip(sigs[q], sigs[c])), c)
            for c in sigs
            if c != q
        )
        ham = {c: rank + 1 for rank, (_, c) in enumerate(dists[:10])}
        cosr = {c: r for r, c in cos[q]}
        common = {c: (cosr[c], ham[c]) for c in cosr if c in ham}
        rbo = 0
        for d in range(1, 11):
            x_d = sum(1 for rs, rt in common.values() if max(rs, rt) <= d)
            rbo += _micro(0.1 * 0.9 ** (d - 1) * x_d / d)
        assert rows[q]["n_common"] == len(common)
        assert rows[q]["rbo_micro"] == rbo


def _md5_int(s: str, lo: int, hi: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[lo:hi], 16)


def test_hash_uniformity(spark):
    ev = _events()
    n = len(ev["event_id"])
    cnt = Counter(_md5_int(str(e), 0, 8) % 1024 for e in ev["event_id"])
    cum = 0
    dev = 0
    chi_num = 0
    for b in range(1024):
        nb = cnt.get(b, 0)
        cum += nb
        dev = max(dev, abs(cum * 1024 - (b + 1) * n))
        chi_num += (1024 * nb - n) ** 2
    (row,) = _run(spark, "pipeline_hash_uniformity_check")
    assert (row["n_total"], row["n_buckets"], row["df"]) == (n, 1024, 1023)
    assert row["ks_dev_scaled"] == dev
    assert row["ks_d"] == round(dev / (n * 1024.0), 6)
    assert row["chi2_micro"] == chi_num * 1_000_000 // (1024 * 1024 * n)


def _milli(x: float) -> int:
    return int(
        Decimal(repr(float(x) * 1000)).quantize(
            Decimal("1"), rounding=ROUND_HALF_UP
        )
    )


def test_multiclass_prf(spark):
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    xm = {i: [_milli(x) for x in v] for i, v in zip(t["vec_id"], t["embedding"])}
    lab = dict(zip(t["vec_id"], t["label"]))
    by_label = defaultdict(list)
    for i, l in lab.items():
        by_label[l].append(i)
    cent = {
        l: ([sum(xm[i][p] for i in ids) for p in range(64)], len(ids))
        for l, ids in by_label.items()
    }
    conf = Counter()
    for i, v in xm.items():
        best = None
        for l in sorted(cent):
            s, nc = cent[l]
            d2 = sum((nc * x - sv) ** 2 for x, sv in zip(v, s)) / (nc * nc)
            if best is None or d2 < best[0]:
                best = (d2, l)
        conf[(lab[i], best[1])] += 1
    rows = {r["label"]: r for r in _run(spark, "ml_multiclass_confusion_prf")}
    for l in by_label:
        tp = conf.get((l, l), 0)
        n_true = sum(c for (t_, _), c in conf.items() if t_ == l)
        n_pred = sum(c for (_, p_), c in conf.items() if p_ == l)
        row = rows[l]
        assert (row["n_true"], row["tp"]) == (n_true, tp)
        assert (row["fp"], row["fn"]) == (n_pred - tp, n_true - tp)
        assert row["precision_micro"] == (
            tp * 1_000_000 // n_pred if n_pred else 0
        )
        assert row["recall_micro"] == (tp * 1_000_000 // n_true if n_true else 0)
        assert row["f1_micro"] == (
            2 * tp * 1_000_000 // (n_pred + n_true) if n_pred + n_true else 0
        )


def test_token_gini(spark):
    t = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    per_src = defaultdict(list)
    for src, did, txt in zip(t["source"], t["doc_id"], t["text"]):
        per_src[src].append((len([w for w in txt.split(" ") if w]), did))
    rows = {r["source"]: r for r in _run(spark, "pipeline_token_gini_by_source")}
    for src, lst in per_src.items():
        lst.sort()
        n = len(lst)
        tot = sum(x for x, _ in lst)
        num = sum((2 * (i + 1) - n - 1) * x for i, (x, _) in enumerate(lst))
        row = rows[src]
        assert (row["n_docs"], row["total_tokens"], row["gini_num"]) == (
            n,
            tot,
            num,
        )
        assert row["gini_ppm"] == num * 1_000_000 // (n * tot)


def _hll_registers(user_ids):
    reg = {}
    for u in user_ids:
        hx = hashlib.md5(str(u).encode()).hexdigest()
        b = int(hx[0:8], 16) % 256
        w = int(hx[8:16], 16)
        r = 32 if w == 0 else min(32, 32 - int(math.floor(math.log2(w))))
        reg[b] = max(reg.get(b, 0), r)
    return reg


def test_hll_register_stream(spark):
    ev = _events()
    reg = _hll_registers(ev["user_id"])
    z = sum(
        (1 << (32 - reg[b])) if b in reg else (1 << 32) for b in range(256)
    )
    exact = len(set(ev["user_id"]))
    est = (0.7213 / (1.0 + 1.079 / 256)) * 256.0 * 256.0 * 4294967296.0 / z
    (row,) = _run(spark, "pipeline_hll_register_stream")
    assert row["n_events"] == len(ev["user_id"])
    assert row["n_users_exact"] == exact
    assert row["n_registers_hit"] == len(reg)
    assert row["z_scaled"] == z
    assert float(row["hll_estimate"]) == round(est, 2)
    assert row["rel_err_le_20pct"] == (abs(est - exact) / exact <= 0.2)
    # partial-merge == whole: split the stream 3 ways arbitrarily and
    # max-merge the per-part registers — the algebra the streaming
    # drive relies on, proven independently of both engines
    parts = [ev["user_id"][i::3] for i in range(3)]
    merged = {}
    for p in parts:
        for b, r in _hll_registers(p).items():
            merged[b] = max(merged.get(b, 0), r)
    assert merged == reg
