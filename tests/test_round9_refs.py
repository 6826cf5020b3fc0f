"""Round-9 reference tests: pure-Python recomputation of the round's
new operator contracts — the independent THIRD implementation beside
the Spark query and its DuckDB oracle (the discipline that caught real
bugs in rounds 6-8).

1. dedup_common_substring_pairs — the Lee-et-al-2022 ExactSubstr tier
   re-done the DIRECT way: for every candidate doc pair, the longest
   common token run via an O(len_a * len_b) dynamic program over the
   raw token lists (no grams, no diagonals, no caps) — proving the
   gram/diagonal/islands decomposition emits exactly the pairs whose
   true longest common run >= min_span, with the exact run length,
   whenever no gram exceeds the frequency cap (asserted on the
   fixture).
"""

from __future__ import annotations

import pytest

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR

K, MIN_SPAN, CAP = 8, 16, 50


def _collapsed_docs() -> dict[int, list[str]]:
    t = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    byhash: dict[str, tuple[int, str]] = {}
    for did, text in zip(t["doc_id"], t["text"]):
        h = hashlib.md5(text.encode()).hexdigest()
        if h not in byhash or did < byhash[h][0]:
            byhash[h] = (did, text)
    return {did: text.split(" ") for did, text in byhash.values()}


def _longest_common_run(a: list[str], b: list[str]) -> int:
    """Classic O(|a|*|b|) longest-common-substring DP over tokens."""
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best


def test_common_substring_pairs_vs_dp(spark):
    docs = _collapsed_docs()
    # candidate pairs from shared k-grams (the only pairs that CAN have
    # a run >= K), plus the cap precondition for exactness
    grams: dict[str, set[int]] = defaultdict(set)
    for did, toks in docs.items():
        for i in range(len(toks) - K + 1):
            grams[" ".join(toks[i : i + K])].add(did)
    assert max((len(d) for d in grams.values()), default=0) <= CAP, (
        "fixture has a gram over the frequency cap — the DP equivalence "
        "precondition does not hold; re-derive expected pairs cap-aware"
    )
    cand = set()
    for ds in grams.values():
        ds = sorted(ds)
        for x in range(len(ds)):
            for y in range(x + 1, len(ds)):
                cand.add((ds[x], ds[y]))
    expected = {}
    for ia, ib in cand:
        run = _longest_common_run(docs[ia], docs[ib])
        if run >= MIN_SPAN:
            expected[(ia, ib)] = run
    got = {
        (r["id_a"], r["id_b"]): r["max_shared_span"]
        for r in all_specs()["dedup_common_substring_pairs"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expected
    assert expected, "fixture produced no qualifying pairs — test is vacuous"


# ---------------------------------------------------------------------------
# 2. sim_ann_opq_topk — the full OPQ-NP pipeline (coarse quantizer,
# residuals, identity-init alternation with Procrustes R-updates,
# fixed-point rotation, integer Lloyd codebooks, per-probed-cell ADC)
# re-done in numpy; asserts the exact per-iterate BIGINT distortions
# AND row-for-row equality of the final top-k (ids + exact integer ADC
# distances) against the Spark relations.
# ---------------------------------------------------------------------------


def _py_opq(sf_dir: str, n_np: int = 2, n_lloyd: int = 2):
    import numpy as np

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.array(t["vec_id"])
    order = np.argsort(ids)
    ids = ids[order]
    X = np.array([list(v) for v in t["embedding"]], dtype=np.float64)[order]
    # Spark F.round is HALF_UP (away from zero); np.round is half-even
    qX = (np.sign(X) * np.floor(np.abs(X) * 1_000_000 + 0.5)).astype(np.int64)

    def tdiv(a, b):  # Spark's `a DIV b`: truncation toward zero
        return (np.sign(a) * (np.abs(a) // b)).astype(np.int64)
    n, d = qX.shape
    m, k_codes, ncell, rs = 8, 16, 16, 1 << 20
    dsub = d // m

    def assign(cents):
        d2 = ((qX[:, None, :] - cents[None, :, :]).astype(np.float64) ** 2).sum(2)
        return np.argmin(d2 * ncell + np.arange(ncell)[None, :], 1)

    c0 = qX[:ncell].copy()
    a0 = assign(c0)
    c1 = np.array(
        [
            tdiv(qX[a0 == c].sum(0), max((a0 == c).sum(), 1))
            if (a0 == c).any()
            else c0[c]
            for c in range(ncell)
        ]
    )
    cell = assign(c1)
    R0 = qX - c1[cell]

    rq = np.round(np.eye(d) * rs).astype(np.int64)

    def rotate(v):
        return tdiv(v @ rq.T, rs)

    def train(y):
        cb = np.stack([y[:k_codes][:, s * dsub : (s + 1) * dsub] for s in range(m)])
        codes = None
        for _ in range(n_lloyd + 1):
            codes = np.zeros((n, m), dtype=int)
            for s in range(m):
                d2 = ((y[:, None, s * dsub : (s + 1) * dsub] - cb[s][None]) ** 2).sum(2)
                codes[:, s] = np.argmin(d2 * k_codes + np.arange(k_codes)[None, :], 1)
            if _ == n_lloyd:
                break
            for s in range(m):
                for c in range(k_codes):
                    mem = y[codes[:, s] == c, s * dsub : (s + 1) * dsub]
                    if len(mem):
                        cb[s, c] = tdiv(mem.sum(0), len(mem))
        return cb, codes

    dists = []
    y = cb = codes = None
    for it in range(n_np + 1):
        y = rotate(R0)
        cb, codes = train(y)
        xhat = np.concatenate([cb[s][codes[:, s]] for s in range(m)], 1)
        dists.append(int(((y - xhat) ** 2).sum()))
        if it == n_np:
            break
        a = (xhat.T @ R0).astype(np.float64)
        u, _s, vt = np.linalg.svd(a)
        rq = np.round((u @ vt) * rs).astype(np.int64)

    # ADC top-k on the final rotation/codebook
    d2c = ((qX[:, None, :] - c1[None, :, :]).astype(np.float64) ** 2).sum(2)
    nq, k = 10, 5
    rows = set()
    for qi in range(nq):
        probes = sorted(range(ncell), key=lambda c: (d2c[qi][c], c))[:4]
        cand = []
        for c in probes:
            qr = tdiv((qX[qi] - c1[c]) @ rq.T, rs)
            dt = np.stack(
                [
                    ((qr[s * dsub : (s + 1) * dsub][None] - cb[s]) ** 2).sum(1)
                    for s in range(m)
                ]
            )
            for i in np.where(cell == c)[0]:
                if i == qi:
                    continue
                adc = int(sum(dt[s][codes[i, s]] for s in range(m)))
                cand.append((adc, int(ids[i])))
        cand.sort()
        for r, (adc, nb) in enumerate(cand[:k], 1):
            rows.add((int(ids[qi]), nb, adc, r))
    return dists, rows


@pytest.mark.slow
def test_opq_pipeline_vs_numpy(spark):
    from cdc_poc_spark.operators import similarity
    from cdc_poc_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    idx = similarity.build_ivfpq_index(emb, pin=True)
    alt = similarity.opq_alternation(emb, idx)
    got_d = [df.collect()[0]["distortion"] for df in alt["dists"]]
    got_rows = {
        (r["query_id"], r["neighbor_id"], r["adc_dist2"], r["rank"])
        for r in similarity.ivfpq_opq_topk(emb, index=idx, alt=alt).collect()
    }
    exp_d, exp_rows = _py_opq(SF_DIR)
    assert got_d == exp_d, f"distortions differ: {got_d} vs {exp_d}"
    assert got_d[0] >= got_d[1] >= got_d[2] and got_d[2] < got_d[0]
    assert got_rows == exp_rows
