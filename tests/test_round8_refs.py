"""Round-8 reference tests (VERDICT r7 "Next round" #2 and #6): pure
Python / numpy recomputation of the round's intricate numerical
contracts — the independent THIRD implementation that catches the class
of bug where both engines agree on a wrong constant (this program found
real bugs in rounds 6 and 7 that the cross-engine oracle was blind to).

1. similarity.ivfpq_rerank_topk — the IVFADC+R refine stage re-done in
   numpy on top of the coarse quantizer (rank seeds + integer Lloyd
   step, same as test_round7_refs2._py_ivfpq); row-for-row equality
   including the exact integer distances. Plus the bounded-refine
   variant's provable dominance property.
2. dedup_threshold_sweep — the cosine-cutoff calibration curve re-done
   with exact left-to-right double accumulation + HALF_UP rounding.
3. tw_session_gap_sweep — DIRECT per-user sessionization walk (not the
   boundary-count identity the query uses), proving the identity
   n_sessions(g) = n_users + #{deltas > g} against an implementation
   that never states it.
4. mm_payload_near_dedup — exact capped-Jaccard byte-4-gram pair count
   re-done with Python byte/set ops (hex shingles, df cap, collapse
   first), pinning the recall contract's denominator.

Rounding/division rules as established in round 7 (committed probe):
Spark round() on DOUBLE is HALF_UP on the shortest decimal repr;
`a DIV b` truncates toward zero.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow.parquet as pq

from .conftest import SF_DIR


def _rhu(v: float) -> int:
    """Spark F.round(double): HALF_UP on the shortest decimal repr."""
    return int(Decimal(repr(float(v))).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _round5(v: float) -> float:
    """Spark F.round(double, 5)."""
    return float(
        Decimal(repr(float(v))).quantize(Decimal("0.00001"), rounding=ROUND_HALF_UP)
    )


# ---------------------------------------------------------------------------
# 1. IVFADC+R: exact-distance rerank, numpy equality
# ---------------------------------------------------------------------------


def _load_quantized(sf_dir: str, q: int = 1_000_000) -> dict[int, np.ndarray]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    raw = t.column("embedding").to_pylist()
    return {
        ids[n]: np.array([_rhu(float(x) * q) for x in raw[n]], dtype=np.int64)
        for n in range(len(ids))
    }


def _py_coarse(Q: dict[int, np.ndarray], n_cells: int = 16):
    """Rank-seeded coarse quantizer + one integer-exact Lloyd step —
    the same construction as build_ivfpq_index (and as
    test_round7_refs2._py_ivfpq, re-stated here so this file stands
    alone as an independent implementation)."""

    def assign(cents):
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
    _, a0 = assign(seeds)
    refined = {}
    for c in set(a0.values()):
        members = np.stack([Q[i] for i in Q if a0[i] == c])
        s = members.sum(axis=0, dtype=np.int64)
        cnt = len(members)
        refined[c] = np.where(s >= 0, s // cnt, -((-s) // cnt)).astype(np.int64)
    return assign(refined)


def _py_rerank(sf_dir: str, n_queries=10, k=5, n_cells=16, n_probe=4):
    Q = _load_quantized(sf_dir)
    cell_d, assigned = _py_coarse(Q, n_cells)
    out = []
    for qid in sorted(i for i in Q if i < n_queries):
        probes = sorted(
            range(n_cells), key=lambda c: (cell_d[(qid, c)], c)
        )[:n_probe]
        cands = [i for i in Q if assigned[i] in probes and i != qid]
        scored = sorted(
            (int(((Q[qid] - Q[nid]) ** 2).sum()), nid) for nid in cands
        )
        for rank, (d2, nid) in enumerate(scored[:k], start=1):
            out.append((qid, nid, d2, rank))
    return sorted(out)


def test_ivfpq_rerank_matches_numpy(spark):
    from cdc_poc_spark.operators.similarity import ivfpq_rerank_topk
    from cdc_poc_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = ivfpq_rerank_topk(emb).collect()
    got = sorted((r.query_id, r.neighbor_id, r.exact_d2, r.rank) for r in rows)
    expected = _py_rerank(SF_DIR)
    assert got == expected
    assert len(expected) >= 40  # 10 queries x up to 5 — fixture is real


def test_ivfpq_refine_variant_dominates_adc(spark):
    """Bounded refine (rerank only the R*k best-by-ADC candidates — the
    long-inverted-list scale path) still dominates raw ADC: a true
    neighbor in ADC's top-k is inside ADC's top-R*k, where exact
    scoring ranks it <= its global rank <= k. Asserted empirically on
    the fixture (the full-candidate variant's monotonicity proof does
    not transfer, so this weaker property is the refine contract)."""
    from cdc_poc_spark.operators import similarity
    from cdc_poc_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    index = similarity.build_ivfpq_index(emb, pin=True)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.euclidean_topk(emb).collect()
    }
    adc = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivfpq_topk(emb, index=index).collect()
    }
    refined = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivfpq_rerank_topk(emb, index=index, refine=2).collect()
    }
    assert len(refined & exact) >= len(adc & exact)
    # and the ADC hits themselves are retained (the provable part)
    assert (adc & exact) <= refined


# ---------------------------------------------------------------------------
# 2. dedup_threshold_sweep: calibration-curve values
# ---------------------------------------------------------------------------


def _py_threshold_sweep(sf_dir: str):
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    ids = t.column("vec_id").to_pylist()
    raw = t.column("embedding").to_pylist()
    labels = t.column("label").to_pylist()
    by_label: dict = {}
    for n in range(len(ids)):
        if labels[n] is None:
            continue
        by_label.setdefault(labels[n], []).append(
            (ids[n], [float(x) for x in raw[n]])
        )

    def dot(a, b):  # exact left-to-right double accumulation (zip_with)
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    pairs = []  # (id_a, id_b, cosine) with cosine >= 0.35 (rounded)
    for members in by_label.values():
        norms = {i: dot(v, v) ** 0.5 for i, v in members}
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                ia, va = members[x]
                ib, vb = members[y]
                c = _round5(dot(va, vb) / (norms[ia] * norms[ib]))
                if c >= 0.35:
                    a, b = min(ia, ib), max(ia, ib)
                    pairs.append((a, b, c))
    curve = {}
    for tpct in range(35, 96, 10):
        sel = [(a, b) for a, b, c in pairs if c * 100 >= tpct]
        docs = {d for p in sel for d in p}
        curve[tpct] = (len(sel), len(docs))
    return curve


def test_dedup_threshold_sweep_matches_pure_python(spark):
    from cdc_poc_spark.queries import all_specs

    rows = all_specs()["dedup_threshold_sweep"].fn(spark, SF_DIR).collect()
    got = {r.threshold_pct: (r.n_pairs, r.n_docs) for r in rows}
    expected = _py_threshold_sweep(SF_DIR)
    assert got == expected
    # the curve is non-trivial on the fixture: strictly fewer pairs at
    # the tightest band than the loosest, and at least one band >0
    assert expected[35][0] > expected[95][0] >= 0
    assert expected[35][0] > 0


# ---------------------------------------------------------------------------
# 3. tw_session_gap_sweep: direct-sessionization identity
# ---------------------------------------------------------------------------


def _py_gap_sweep(sf_dir: str):
    import pyarrow as pa

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    col = t.column("ts")
    raw = col.cast(pa.int64()).to_pylist()
    # mirror tables.load_table's normalization: fixture generations have
    # stored ts as TIMESTAMP(NANOS) and TIMESTAMP(MICROS); ts_us is micros
    unit = getattr(col.type, "unit", "ns")  # plain-int64 storage = raw nanos
    div = {"s": 1, "ms": 1, "us": 1, "ns": 1000}[unit]
    us: dict = {}
    for uid, ts in zip(t.column("user_id").to_pylist(), raw):
        us.setdefault(uid, []).append(int(ts) // div)
    n_events = sum(len(v) for v in us.values())
    out = {}
    for gap_min in (5, 15, 30, 60):
        gap_us = gap_min * 60_000_000
        n_sessions = 0
        for ts_list in us.values():
            ts_sorted = sorted(ts_list)
            n_sessions += 1  # every user opens one session
            for a, b in zip(ts_sorted, ts_sorted[1:]):
                if b - a > gap_us:  # strict — boundary only when EXCEEDED
                    n_sessions += 1
        out[gap_min] = (n_sessions, n_events * 1_000_000 // n_sessions)
    return out


def test_tw_session_gap_sweep_matches_direct_sessionization(spark):
    """The query computes n_sessions(g) via the boundary-count identity
    (ONE lag pass + broadcast theta-join). This walks every user's
    timeline and literally counts sessions per gap — an implementation
    that never states the identity. Equality proves it."""
    from cdc_poc_spark.queries import all_specs

    rows = all_specs()["tw_session_gap_sweep"].fn(spark, SF_DIR).collect()
    got = {r.gap_min: (r.n_sessions, r.events_per_session_micro) for r in rows}
    expected = _py_gap_sweep(SF_DIR)
    assert got == expected
    # boundaries can only merge as the gap grows
    counts = [expected[g][0] for g in (5, 15, 30, 60)]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > counts[-1], "fixture must exercise the gap dial"


# ---------------------------------------------------------------------------
# 4. mm_payload_near_dedup: exact capped-Jaccard pair count
# ---------------------------------------------------------------------------

_GRAM_DF_CAP = 32  # keep in lockstep with queries/llm_ops._MM_GRAM_DF_CAP


def _py_payload_neardup_exact_pairs(sf_dir: str) -> int:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    reps: dict[str, int] = {}
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        hx = text.encode("utf-8").hex().upper()
        if len(hx) < 8:
            continue  # no byte-4-gram (the r8 guard)
        if hx not in reps or did < reps[hx]:
            reps[hx] = did
    grams = {
        rep: {hx[2 * i - 2 : 2 * i + 6] for i in range(1, len(hx) // 2 - 2)}
        for hx, rep in reps.items()
    }
    df: dict[str, int] = {}
    for gs in grams.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    capped = {
        rep: {g for g in gs if df[g] <= _GRAM_DF_CAP} for rep, gs in grams.items()
    }
    reps_sorted = sorted(capped)
    n = 0
    for x in range(len(reps_sorted)):
        for y in range(x + 1, len(reps_sorted)):
            a, b = capped[reps_sorted[x]], capped[reps_sorted[y]]
            inter = len(a & b)
            union = len(a | b)
            if union and inter / union >= 0.5:
                n += 1
    return n


def test_mm_payload_near_dedup_matches_pure_python(spark):
    from cdc_poc_spark.queries import all_specs

    [row] = all_specs()["mm_payload_near_dedup"].fn(spark, SF_DIR).collect()
    expected = _py_payload_neardup_exact_pairs(SF_DIR)
    assert row.n_exact_pairs == expected
    assert expected > 0, "fixture must contain near-dup payloads"
    assert bool(row.recall_ge_07), "LSH recall floor must hold on the fixture"
