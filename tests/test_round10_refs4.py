"""Round-10 reference tests, part 4: pure-Python third implementations
for wave 5 — nDCG@10 (with the ideal ranking computed by an ACTUAL
SORT, vs the query's closed-form grade-count allocation), MAP/MRR,
sign-bit Hamming top-k (numpy popcount), Matryoshka prefix recall,
Yule's K, Good-Turing, Chao1, and Durbin-Watson (exact-bigint residual
recurrence — the same Δ-clearing identity, derived independently).
"""

from __future__ import annotations

import math
from collections import Counter
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


def _r5(x: float) -> float:
    return float(
        Decimal(repr(float(x))).quantize(Decimal("0.00001"), rounding=ROUND_HALF_UP)
    )


def _round_half_up(x: float) -> int:
    return int(Decimal(repr(float(x))).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _embeddings():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    vecs = {i: [float(x) for x in v] for i, v in zip(t["vec_id"], t["embedding"])}
    labels = dict(zip(t["vec_id"], t["label"]))
    return vecs, labels


def _cosine_ranked(vecs, dims=None, k=10):
    """Left-to-right sequential dot products (both engines' fold order),
    round(5) then rank with neighbor-id tie-breaks."""
    ids = sorted(vecs)
    sliced = {
        i: (v if dims is None else v[:dims]) for i, v in vecs.items()
    }
    norms = {}
    for i in ids:
        s = 0.0
        for x in sliced[i]:
            s += x * x
        norms[i] = math.sqrt(s)
    out = {}
    for q in ids:
        if q >= 10:
            continue
        scored = []
        for c in ids:
            if c == q:
                continue
            d = 0.0
            for a, b in zip(sliced[q], sliced[c]):
                d += a * b
            scored.append((-_r5(d / (norms[q] * norms[c])), c))
        scored.sort()
        out[q] = [(rank + 1, c) for rank, (_, c) in enumerate(scored[:k])]
    return out


def _gain(ql, cl):
    d = abs(ql - cl)
    return {0: 7, 1: 3, 2: 1}.get(d, 0)


def test_ndcg_at_k(spark):
    vecs, labels = _embeddings()
    ranked = _cosine_ranked(vecs)
    rows = {r["query_id"]: r for r in _run(spark, "ml_ndcg_at_k")}
    assert set(rows) == set(ranked)
    for q, top in ranked.items():
        dcg = sum(
            _round_half_up(_gain(labels[q], labels[c]) * 1e6 / math.log2(r + 1))
            for r, c in top
        )
        # ideal ranking by an ACTUAL SORT of all candidate gains (the
        # query computes it in closed form from grade counts):
        gains = sorted(
            (_gain(labels[q], labels[c]) for c in vecs if c != q), reverse=True
        )
        idcg = sum(
            _round_half_up(g * 1e6 / math.log2(r + 1))
            for r, g in enumerate(gains[:10], 1)
        )
        c3 = sum(1 for c in vecs if c != q and labels[c] == labels[q])
        row = rows[q]
        assert (row["dcg_micro"], row["idcg_micro"], row["n_same_label"]) == (
            dcg,
            idcg,
            c3,
        )
        assert row["ndcg_at_10"] == round(dcg / idcg, 6)


def test_map_mrr(spark):
    vecs, labels = _embeddings()
    ranked = _cosine_ranked(vecs)
    rows = {r["query_id"]: r for r in _run(spark, "ml_map_mrr_retrieval")}
    for q, top in ranked.items():
        rels = [(r, labels[c] == labels[q]) for r, c in top]
        hits = 0
        sum_prec = 0
        first = None
        for r, rel in rels:
            if rel:
                hits += 1
                sum_prec += hits * 1_000_000 // r
                if first is None:
                    first = r
        r_total = sum(1 for c in vecs if c != q and labels[c] == labels[q])
        row = rows[q]
        assert row["n_rel_top10"] == hits
        assert row["r_total"] == r_total
        assert row["ap_micro"] == sum_prec // min(r_total, 10)
        assert row["rr_micro"] == (1_000_000 // first if first else 0)


def test_hamming_sign_topk(spark):
    vecs, _ = _embeddings()
    sigs = {
        i: [1 if x > 0 else 0 for x in v] for i, v in vecs.items()
    }
    rows = _run(spark, "sim_hamming_sign_topk")
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["hamming"])
        )
    for q in range(10):
        dists = sorted(
            (
                sum(a != b for a, b in zip(sigs[q], sigs[c])),
                c,
            )
            for c in sigs
            if c != q
        )
        expect = [(rank + 1, c, h) for rank, (h, c) in enumerate(dists[:5])]
        assert sorted(got[q]) == expect


def test_matryoshka_prefix_recall(spark):
    vecs, _ = _embeddings()
    full = _cosine_ranked(vecs)
    pre = _cosine_ranked(vecs, dims=32)
    rows = {r["query_id"]: r for r in _run(spark, "sim_matryoshka_prefix_recall")}
    for q in full:
        hits = len(
            {c for _, c in full[q]} & {c for _, c in pre[q]}
        )
        assert rows[q]["n_hits"] == hits
        assert rows[q]["recall_bp"] == hits * 1000


def _tokens_by_source():
    t = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    out = {}
    for src, text in zip(t["source"], t["text"]):
        out.setdefault(src, []).extend(w for w in text.split(" ") if w)
    return out


def test_yule_k(spark):
    toks = _tokens_by_source()
    rows = {r["source"]: r for r in _run(spark, "text_yule_k")}
    assert set(rows) == set(toks)
    for src, ws in toks.items():
        c = Counter(ws)
        n = sum(c.values())
        m2 = sum(v * v for v in c.values())
        row = rows[src]
        assert (row["n_tokens"], row["vocab"], row["m2"]) == (n, len(c), m2)
        assert row["yule_k"] == round(10000.0 * (m2 - n) / (float(n) * n), 6)


def test_good_turing(spark):
    toks = [w for ws in _tokens_by_source().values() for w in ws]
    c = Counter(toks)
    vr = Counter(c.values())
    n = len(toks)
    rows = {r["r"]: r for r in _run(spark, "text_good_turing_smoothing")}
    assert set(rows) == set(range(6))
    assert rows[0]["v_r"] == n
    assert rows[0]["v_r_plus1"] == vr.get(1, 0)
    assert rows[0]["r_star_micro"] == vr.get(1, 0) * 1_000_000 // n
    for r in range(1, 6):
        row = rows[r]
        assert row["v_r"] == vr.get(r, 0)
        assert row["v_r_plus1"] == vr.get(r + 1, 0)
        if vr.get(r, 0) == 0:
            assert row["r_star_micro"] == 0
        else:
            assert row["r_star_micro"] == (r + 1) * vr.get(r + 1, 0) * 1_000_000 // vr[r]


def test_chao1(spark):
    toks = _tokens_by_source()
    rows = {r["source"]: r for r in _run(spark, "text_chao1_vocab_richness")}
    for src, ws in toks.items():
        c = Counter(ws)
        f1 = sum(1 for v in c.values() if v == 1)
        f2 = sum(1 for v in c.values() if v == 2)
        n = sum(c.values())
        row = rows[src]
        assert (row["s_obs"], row["f1"], row["f2"], row["n_tokens"]) == (
            len(c),
            f1,
            f2,
            n,
        )
        assert row["chao1_micro"] == len(c) * 1_000_000 + f1 * (f1 - 1) * 1_000_000 // (
            2 * (f2 + 1)
        )
        assert row["coverage_bp"] == 10_000 - f1 * 10_000 // n


def test_durbin_watson(spark):
    """Independent derivation: exact-bigint Δ-scaled residuals from the
    raw events (python ints never overflow), DW as one float ratio."""
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    d = t.to_pydict()
    ts_us = t.column("ts").cast("int64").to_pylist()
    day_us = 86_400 * 10**6
    daily = Counter()
    for us, v in zip(ts_us, d["value"]):
        daily[us // day_us] += _cents(v)
    ys = [daily[k] for k in sorted(daily)]
    n = len(ys)
    ts_ = list(range(1, n + 1))
    sx, sy = sum(ts_), sum(ys)
    sxx = sum(x * x for x in ts_)
    sxy = sum(x * y for x, y in zip(ts_, ys))
    delta = n * sxx - sx * sx
    anum = sy * sxx - sx * sxy
    bnum = n * sxy - sx * sy
    es = [delta * y - anum - bnum * x for x, y in zip(ts_, ys)]
    num = sum((a - b) ** 2 for a, b in zip(es[1:], es[:-1]))
    den = sum(e * e for e in es)
    (row,) = _run(spark, "tw_durbin_watson")
    assert row["n_days"] == n
    assert row["dw"] == round(float(num) / float(den), 6)
    assert row["rho1"] == round(1.0 - float(num) / (2.0 * float(den)), 6)
    # sanity: the float-OLS residual DW agrees to ~1e-9 (the identity
    # is exact; this guards the derivation itself, not the engines)
    b = bnum / delta
    a = anum / delta
    ef = [y - a - b * x for x, y in zip(ts_, ys)]
    dw_f = sum((p - q) ** 2 for p, q in zip(ef[1:], ef[:-1])) / sum(
        e * e for e in ef
    )
    assert abs(dw_f - row["dw"]) < 1e-6
