"""Round-8 reference tests, batch 2: pure Python / numpy recomputation
of the batch-C/D/E numerical contracts — the independent third
implementation (see test_round8_refs.py for the program's rationale).

1. ml_covariance_matrix — exact integer-quantized covariance re-done in
   numpy int64 (every cell).
2. agg_spearman_rho / agg_kendall_tau — rank statistics re-done with
   Python ints + Decimal rounding.
3. mm_content_defined_chunks — the rolling-boundary chunker re-done
   with hashlib over Python strings (boundaries, chunks, dedup
   accounting).
4. ml_knn_vote_pipeline (né ml_knn_classifier_accuracy) — leave-one-out majority vote re-done in
   Python floats with the engine's round-then-tiebreak convention.
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow.parquet as pq

from .conftest import SF_DIR


def _rhu(v: float) -> int:
    return int(Decimal(repr(float(v))).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _round(v: float, places: int) -> float:
    q = Decimal("1") if places == 0 else Decimal("0." + "0" * (places - 1) + "1")
    return float(Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# 1. covariance matrix
# ---------------------------------------------------------------------------


def _py_covariance(sf_dir: str, q: int = 1_000_000):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    raw = t.column("embedding").to_pylist()
    X = np.array(
        [[_rhu(float(x) * q) for x in v] for v in raw], dtype=np.int64
    )
    n, d = X.shape
    s = X.sum(axis=0, dtype=np.int64)  # per-dim exact sums (fits: 1e6*2e4)
    out = {}
    for j1 in range(d):
        # int64 products fit: |qx| <= ~2^21, product <= 2^42, n sums ok
        prods = (X[:, j1][:, None] * X[:, j1:]).sum(axis=0, dtype=np.int64)
        for off, sxy in enumerate(prods):
            j2 = j1 + off
            cov = (float(sxy) - float(s[j1]) * float(s[j2]) / float(n)) / (
                float(n) - 1
            )
            out[(j1, j2)] = _round(cov, 2)
    return out


def test_covariance_matrix_matches_numpy(spark):
    from cdc_poc_spark.queries import all_specs

    rows = all_specs()["ml_covariance_matrix"].fn(spark, SF_DIR).collect()
    got = {(r.j1, r.j2): r.cov_micro2 for r in rows}
    expected = _py_covariance(SF_DIR)
    assert got == expected
    d = max(j for j, _ in expected) + 1
    assert len(expected) == d * (d + 1) // 2
    # diagonal is a variance: strictly positive on a real fixture
    assert all(expected[(j, j)] > 0 for j in range(d))


# ---------------------------------------------------------------------------
# 2. rank statistics
# ---------------------------------------------------------------------------


def _py_features(sf_dir: str):
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal", "c_nationkey"]
    )
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    bal = {
        k: _rhu(round(float(b), 2) * 100)
        for k, b in zip(
            cust.column("c_custkey").to_pylist(), cust.column("c_acctbal").to_pylist()
        )
    }
    spend: dict[int, int] = {}
    for k, p in zip(
        orders.column("o_custkey").to_pylist(),
        orders.column("o_totalprice").to_pylist(),
    ):
        spend[k] = spend.get(k, 0) + _rhu(round(float(p), 2) * 100)
    return bal, spend, cust


def _py_spearman(sf_dir: str):
    bal, spend, _ = _py_features(sf_dir)
    keys = sorted(k for k in bal if k in spend)
    rx = {
        k: i + 1
        for i, k in enumerate(sorted(keys, key=lambda k: (bal[k], k)))
    }
    ry = {
        k: i + 1
        for i, k in enumerate(sorted(keys, key=lambda k: (spend[k], k)))
    }
    n = float(len(keys))
    sx = float(sum(rx.values()))
    sy = float(sum(ry.values()))
    sxx = float(sum(v * v for v in rx.values()))
    syy = float(sum(v * v for v in ry.values()))
    sxy = float(sum(rx[k] * ry[k] for k in keys))
    rho = (n * sxy - sx * sy) / (
        ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    )
    return int(n), _round(rho, 6)


def test_spearman_matches_pure_python(spark):
    from cdc_poc_spark.queries import all_specs

    [row] = all_specs()["agg_spearman_rho"].fn(spark, SF_DIR).collect()
    n, rho = _py_spearman(SF_DIR)
    assert (row.n_rows, row.spearman_rho) == (n, rho)
    assert abs(rho) < 1 and n > 10


def _py_kendall(sf_dir: str):
    bal, _, cust = _py_features(sf_dir)
    nat = pq.read_table(
        f"{SF_DIR}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    name_of = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )
    groups: dict[str, list[int]] = {}
    for k, nk in zip(
        cust.column("c_custkey").to_pylist(), cust.column("c_nationkey").to_pylist()
    ):
        groups.setdefault(name_of[nk], []).append(bal[k])
    feats = {g: (sum(v), len(v)) for g, v in groups.items()}
    names = sorted(feats)
    conc = disc = 0
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            (ba, ca), (bb, cb) = feats[names[i]], feats[names[j]]
            sgn = (ba - bb) * (ca - cb)
            conc += sgn > 0
            disc += sgn < 0
    n_pairs = len(names) * (len(names) - 1) // 2
    return len(names), conc, disc, _round((conc - disc) / n_pairs, 6)


def test_kendall_matches_pure_python(spark):
    from cdc_poc_spark.queries import all_specs

    [row] = all_specs()["agg_kendall_tau"].fn(spark, SF_DIR).collect()
    k, c, d, tau = _py_kendall(SF_DIR)
    assert (row.n_groups, row.concordant, row.discordant, row.kendall_tau_a) == (
        k, c, d, tau,
    )
    assert c + d > 0


# ---------------------------------------------------------------------------
# 3. content-defined chunking
# ---------------------------------------------------------------------------

_CDC_MOD = 32  # lockstep with queries/llm_ops._CDC_MOD


def _py_cdc_chunks(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    payloads = {}
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        hx = text.encode("utf-8").hex().upper()
        if len(hx) >= 8 and (hx not in payloads or did < payloads[hx]):
            payloads[hx] = did
    total, distinct, max_bytes = 0, set(), 0
    for hx in payloads:
        L = len(hx) // 2
        bounds = [
            i
            for i in range(4, L + 1)
            if int(hashlib.md5(hx[2 * i - 8 : 2 * i].encode()).hexdigest()[:8], 16)
            % _CDC_MOD
            == 0
        ]
        if not bounds or bounds[-1] != L:
            bounds.append(L)
        prev = 0
        for b in bounds:
            chunk = hx[2 * prev : 2 * b]
            total += 1
            distinct.add(chunk)
            max_bytes = max(max_bytes, b - prev)
            prev = b
    return len(payloads), total, len(distinct), max_bytes


def test_content_defined_chunks_matches_pure_python(spark):
    from cdc_poc_spark.queries import all_specs

    [row] = all_specs()["mm_content_defined_chunks"].fn(spark, SF_DIR).collect()
    n_payloads, total, distinct, max_bytes = _py_cdc_chunks(SF_DIR)
    assert (row.n_payloads, row.total_chunks, row.distinct_chunks, row.max_chunk_bytes) == (
        n_payloads, total, distinct, max_bytes,
    )
    assert row.distinct_ratio_ppm == distinct * 1_000_000 // total
    # the fixture must actually exercise dedup (shared chunks exist)
    assert distinct < total


# ---------------------------------------------------------------------------
# 4. kNN classifier
# ---------------------------------------------------------------------------


def _py_knn_accuracy(sf_dir: str, n_queries=50, k=5):
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    ids = t.column("vec_id").to_pylist()
    raw = t.column("embedding").to_pylist()
    labels = dict(zip(ids, t.column("label").to_pylist()))
    vecs = {}
    for n in range(len(ids)):
        v = [float(x) for x in raw[n]]
        acc = 0.0
        for x in v:
            acc += x * x
        vecs[ids[n]] = (v, acc ** 0.5)

    def cos(a, b):
        va, na = vecs[a]
        vb, nb = vecs[b]
        acc = 0.0
        for x, y in zip(va, vb):
            acc += x * y
        return _round(acc / (na * nb), 5)

    correct = n_q = 0
    for qid in sorted(i for i in vecs if i < n_queries):
        scored = sorted(
            ((-cos(qid, nid), nid) for nid in vecs if nid != qid)
        )[:k]
        votes: dict[str, int] = {}
        for _, nid in scored:
            votes[labels[nid]] = votes.get(labels[nid], 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        n_q += 1
        correct += pred == labels[qid]
    return n_q, correct, _round(correct / n_q, 6)


def test_knn_classifier_matches_pure_python(spark):
    from cdc_poc_spark.queries import all_specs

    [row] = all_specs()["ml_knn_vote_pipeline"].fn(spark, SF_DIR).collect()
    n_q, correct, acc = _py_knn_accuracy(SF_DIR)
    assert (row.n_queries, row.n_correct, row.accuracy) == (n_q, correct, acc)
    # The fixture's labels carry NO geometric signal (measured: mean
    # within-label cosine 0.001 vs global 0.000; top-1 same-label rate
    # 0.07 ~ the 1/10 random floor), so accuracy hovers at random —
    # the contract here is the EXACT vote pipeline (values match the
    # independent implementation above), not label recoverability.
    assert 0.0 <= acc <= 1.0 and n_q == 50
