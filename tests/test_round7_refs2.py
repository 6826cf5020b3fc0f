"""Round-7 reference tests, batch 2 (VERDICT r6 "Next round" #5): pure
Python / numpy recomputation of the three most intricate staged
numerical contracts — the class of check that caught two real bugs in
round 6 where the cross-engine oracle was structurally blind (both
engines can agree on a wrong constant; an independent third
implementation cannot).

1. ml_decision_stump — exact integer Gini split search re-done with
   Python ints over the raw parquet rows.
2. sim_random_projection_jl — md5-parity sign matrix, integer
   projection, and exact ratio_ppm re-done with hashlib + ints.
3. similarity.ivfpq_topk — the FULL deterministic IVF-PQ pipeline
   (rank seeds, integer Lloyd steps, packed-min argmins, ADC tables)
   re-done in numpy; row-for-row equality including adc_dist2.

Shared rounding/division rules verified against the engine first
(committed probe): Spark round() on DOUBLE is HALF_UP on the shortest
decimal repr (matches Decimal(repr(v))); `a DIV b` truncates toward
zero (-7 DIV 2 = -3) — all operands here are nonnegative, so // is
equivalent where used.
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow.parquet as pq

from .conftest import SF_DIR


def _rhu(v: float) -> int:
    """Spark F.round(double): HALF_UP on the shortest decimal repr."""
    return int(Decimal(repr(float(v))).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _cents(v: float) -> int:
    """dec(col, DECIMAL(p,2)) * 100 -> exact integer cents (HALF_UP)."""
    return int(
        Decimal(repr(float(v))).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP) * 100
    )


# ---------------------------------------------------------------------------
# 1. decision stump
# ---------------------------------------------------------------------------


def _py_stump(sf_dir: str):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderpriority"],
    ).to_pydict()
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).to_pydict()
    bal = dict(zip(cust["c_custkey"], cust["c_acctbal"]))
    rows = [
        (
            _cents(p),
            _cents(bal[ck]),
            1 if pr in ("1-URGENT", "2-HIGH") else 0,
        )
        for ck, p, pr in zip(
            orders["o_custkey"], orders["o_totalprice"], orders["o_orderpriority"]
        )
    ]
    n, npos = len(rows), sum(r[2] for r in rows)
    best = None
    for feature, idx in (("price_cents", 0), ("cust_bal_cents", 1)):
        hist: dict[int, list[int]] = {}
        for r in rows:
            c = hist.setdefault(r[idx], [0, 0])
            c[0] += 1
            c[1] += r[2]
        nl = pl = 0
        for v in sorted(hist):
            nl += hist[v][0]
            pl += hist[v][1]
            if nl >= n:
                continue
            nr, pr_ = n - nl, npos - pl
            gini = (nl * nl - pl * pl - (nl - pl) * (nl - pl)) * 1_000_000 // nl + (
                nr * nr - pr_ * pr_ - (nr - pr_) * (nr - pr_)
            ) * 1_000_000 // nr
            key = (gini, feature, v)
            if best is None or key < best[:3]:
                best = (gini, feature, v, nl, pl, nr, pr_)
    return best


def test_decision_stump_matches_pure_python(spark):
    from cdc_poc_spark.queries import all_specs

    row = all_specs()["ml_decision_stump"].fn(spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    gini, feature, threshold, nl, pl, nr, pr_ = _py_stump(SF_DIR)
    assert (
        r.feature,
        r.threshold,
        r.gini_num_micro,
        r.n_left,
        r.pos_left,
        r.n_right,
        r.pos_right,
    ) == (feature, threshold, gini, nl, pl, nr, pr_)


# ---------------------------------------------------------------------------
# 2. JL random projection
# ---------------------------------------------------------------------------

_JL_K = 16


def _py_jl(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        i: [_rhu(float(x) * 1_000_000) for x in v]
        for i, v in zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    }
    d = len(next(iter(vecs.values())))
    sgn = [
        [
            1 if int(hashlib.md5(f"jl{oi}:{j}".encode()).hexdigest()[:8], 16) % 2 == 0
            else -1
            for j in range(d)
        ]
        for oi in range(_JL_K)
    ]
    proj = {
        i: [sum(s * x for s, x in zip(sgn[oi], q)) for oi in range(_JL_K)]
        for i, q in vecs.items()
    }
    out = {}
    qa = [i for i in vecs if i < 10]
    sb = [i for i in vecs if i % 29 == 0]
    for a in qa:
        for b in sb:
            if a == b:
                continue
            d2 = sum((x - y) * (x - y) for x, y in zip(vecs[a], vecs[b]))
            if d2 == 0:
                continue
            p2 = sum((x - y) * (x - y) for x, y in zip(proj[a], proj[b]))
            out[(a, b)] = (d2, p2 * 1_000_000 // (_JL_K * d2))
    return out


def test_jl_projection_matches_pure_python(spark):
    from cdc_poc_spark.queries import all_specs

    rows = all_specs()["sim_random_projection_jl"].fn(spark, SF_DIR).collect()
    got = {(r.id_a, r.id_b): (r.d_orig2, r.ratio_ppm) for r in rows}
    expected = _py_jl(SF_DIR)
    assert got == expected
    assert expected, "fixture must produce pairs"
    # sanity on the CONTRACT itself: ratios concentrate around 1e6
    ratios = [v[1] for v in expected.values()]
    assert 200_000 < min(ratios) and max(ratios) < 5_000_000


# ---------------------------------------------------------------------------
# 3. IVF-PQ: full-pipeline numpy equality
# ---------------------------------------------------------------------------


def _py_ivfpq(
    sf_dir: str,
    n_queries=10,
    k=5,
    n_cells=16,
    n_probe=4,
    m=8,
    pq_k=16,
    q=1_000_000,
):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    raw = t.column("embedding").to_pylist()
    order = np.argsort(ids, kind="stable")
    ids = [ids[i] for i in order]
    Q = {
        ids[n]: np.array([_rhu(float(x) * q) for x in raw[order[n]]], dtype=np.int64)
        for n in range(len(ids))
    }
    d = len(next(iter(Q.values())))
    d_sub = int(d / m)
    sub_of = np.array([int(j / d_sub) for j in range(d)])

    def assign_cells(cents: dict[int, np.ndarray]):
        cell_d, assigned = {}, {}
        for i, v in Q.items():
            best = None
            for c in sorted(cents):
                d2 = int(((v - cents[c]) ** 2).sum())
                cell_d[(i, c)] = d2
                key = d2 * n_cells + c
                if best is None or key < best:
                    best = key
            assigned[i] = best % n_cells
        return cell_d, assigned

    seeds = {rank: Q[i].copy() for rank, i in enumerate(sorted(Q)[:n_cells])}
    _, a0 = assign_cells(seeds)
    refined = {}
    for c in set(a0.values()):
        members = np.stack([Q[i] for i in Q if a0[i] == c])
        # SUM(qx) DIV COUNT(*) — truncation toward zero (sums may be <0)
        s = members.sum(axis=0, dtype=np.int64)
        cnt = len(members)
        refined[c] = np.where(s >= 0, s // cnt, -((-s) // cnt)).astype(np.int64)
    cell_d, assigned = assign_cells(refined)

    def pq_assign(cents: dict[tuple[int, int], np.ndarray]):
        """cents: (sub, code) -> centroid restricted to that sub's dims."""
        codes = {}
        for i, v in Q.items():
            for sub in range(m):
                sl = v[sub_of == sub]
                best = None
                for (s_, code), cv in cents.items():
                    if s_ != sub:
                        continue
                    d2 = int(((sl - cv) ** 2).sum())
                    key = d2 * pq_k + code
                    if best is None or key < best:
                        best = key
                codes[(i, sub)] = best % pq_k
        return codes

    pq_seeds = {
        (sub, rank): Q[i][sub_of == sub]
        for rank, i in enumerate(sorted(Q)[:pq_k])
        for sub in range(m)
    }
    codes0 = pq_assign(pq_seeds)
    pq_refined = {}
    for sub in range(m):
        for code in set(c for (i, s_), c in codes0.items() if s_ == sub):
            members = np.stack(
                [Q[i][sub_of == sub] for i in Q if codes0[(i, sub)] == code]
            )
            s = members.sum(axis=0, dtype=np.int64)
            cnt = len(members)
            pq_refined[(sub, code)] = np.where(
                s >= 0, s // cnt, -((-s) // cnt)
            ).astype(np.int64)
    codes = pq_assign(pq_refined)

    # ADC distance tables vs the REFINED codebooks (as the operator does)
    dtable = {}
    for qid in [i for i in Q if i < n_queries]:
        for (sub, code), cv in pq_refined.items():
            sl = Q[qid][sub_of == sub]
            dtable[(qid, sub, code)] = int(((sl - cv) ** 2).sum())

    out = []
    for qid in sorted(i for i in Q if i < n_queries):
        probes = sorted(
            (c for c in refined), key=lambda c: (cell_d[(qid, c)], c)
        )[:n_probe]
        cands = [i for i in Q if assigned[i] in probes and i != qid]
        scored = []
        for nid in cands:
            adc = sum(dtable[(qid, sub, codes[(nid, sub)])] for sub in range(m))
            scored.append((adc, nid))
        for rank, (adc, nid) in enumerate(sorted(scored)[:k], start=1):
            out.append((qid, nid, adc, rank))
    return sorted(out)


def test_ivfpq_full_pipeline_matches_numpy(spark):
    from cdc_poc_spark.operators.similarity import ivfpq_topk
    from cdc_poc_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = ivfpq_topk(emb).collect()
    got = sorted((r.query_id, r.neighbor_id, r.adc_dist2, r.rank) for r in rows)
    expected = _py_ivfpq(SF_DIR)
    assert got == expected
    assert len(expected) >= 40  # 10 queries x up to 5 — fixture is real
