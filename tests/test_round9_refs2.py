"""Round-9 reference tests, part 2: pure-Python recomputation of the
round's numerical contracts — the independent THIRD implementation
beside the Spark query and its DuckDB oracle (this program caught the
two cross-engine rounding traps in round 9 itself: DuckDB's silent
DECIMAL->DOUBLE promotion and the shortest-repr round() divergence).

1. ml_roc_auc_exact — AUC re-done by explicit pair counting
   (concordant + half... no: the tie-broken rank convention means
   counting pairs under the TOTAL order), proving the rank-sum
   identity implementation.
2. agg_cohens_kappa — kappa from a dict-of-dicts contingency table
   with Fraction arithmetic, proving the marginal-product identity.
3. agg_morans_i — Moran's I with numpy over the explicitly
   materialized co-order weight matrix (the thing the Spark plan
   deliberately never builds).
4. tw_kaplan_meier — the survival curve by a literal per-duration
   risk-set walk, checking the exact micro-nat cumulative logs.
5. dedup_suffix_prefix_overlap / dedup_substring_containment_docs —
   derived from the DP longest-common-run machinery of part 1, but
   via direct string prefix/suffix comparison per pair.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from fractions import Fraction

import pyarrow.parquet as pq

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR


def _events():
    return pq.read_table(f"{SF_DIR}/events.parquet").to_pydict()


def _cents(v: float) -> int:
    # decimal(12,2) quantize then *100 — exact for 2-decimal doubles
    return int(round(round(float(v), 2) * 100))


def test_roc_auc_vs_pair_counting(spark):
    t = _events()
    rows = sorted(
        zip(
            (_cents(v) for v in t["value"]),
            t["event_id"],
            (1 if et in ("purchase", "signup") else 0 for et in t["event_type"]),
        )
    )
    # under the (score, event_id) total order, AUC = fraction of
    # (neg, pos) pairs where the positive sorts strictly later
    n_pos = sum(r[2] for r in rows)
    n_neg = len(rows) - n_pos
    seen_neg = 0
    wins = 0
    for _s, _e, y in rows:  # ascending total order
        if y == 1:
            wins += seen_neg
        else:
            seen_neg += 1
    expected_ppm = (wins * 1_000_000) // (n_pos * n_neg)
    [row] = all_specs()["ml_roc_auc_exact"].fn(spark, SF_DIR).collect()
    assert (row["n_pos"], row["n_neg"]) == (n_pos, n_neg)
    assert row["auc_ppm"] == expected_ppm


def test_cohens_kappa_vs_fractions(spark):
    t = _events()

    def band(v, lo, hi):
        return "low" if v < lo else ("mid" if v < hi else "high")

    table: dict[tuple[str, str], int] = defaultdict(int)
    for v, props in zip(t["value"], t["props"]):
        k = int(props.split(":")[1].strip(" }"))
        table[(band(_cents(v), 30000, 70000), band(k, 33, 66))] += 1
    n = sum(table.values())
    agree = sum(c for (a, b), c in table.items() if a == b)
    ra: dict[str, int] = defaultdict(int)
    rb: dict[str, int] = defaultdict(int)
    for (a, b), c in table.items():
        ra[a] += c
        rb[b] += c
    po = Fraction(agree, n)
    pe = Fraction(sum(ra[c] * rb[c] for c in ra), n * n)
    kappa = (po - pe) / (1 - pe)
    # the query's ppm division of the integer identity — TRUNCATED
    # toward zero (Spark DIV and DuckDB // both truncate; Python //
    # floors, which differs on the fixture's NEGATIVE kappa — found by
    # this test's first run)
    chance_x = sum(ra[c] * rb[c] for c in ra)
    num, den = (n * agree - chance_x) * 1_000_000, (n * n - chance_x)
    expected_ppm = int(Fraction(num, den))  # Fraction->int truncates
    assert expected_ppm == math.trunc(kappa * 1_000_000)
    [row] = all_specs()["agg_cohens_kappa"].fn(spark, SF_DIR).collect()
    assert (row["n"], row["agree"], row["kappa_ppm"]) == (n, agree, expected_ppm)


def test_morans_i_vs_numpy_weight_matrix(spark):
    import numpy as np

    li = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pydict()
    part = pq.read_table(f"{SF_DIR}/part.parquet").to_pydict()
    price = {k: _cents(p) for k, p in zip(part["p_partkey"], part["p_retailprice"])}
    orders: dict[int, set[int]] = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        orders[o].add(p)
    w: dict[tuple[int, int], int] = defaultdict(int)
    for ps in orders.values():
        ps = sorted(ps)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                w[(ps[i], ps[j])] += 1
    edges = [e for e, c in w.items() if c >= 2]
    nodes = sorted({x for e in edges for x in e})
    idx = {p: i for i, p in enumerate(nodes)}
    x = np.array([price[p] for p in nodes], dtype=np.int64)
    n = len(nodes)
    z = x * n - x.sum()  # exact integer centering, as the query does
    wm = np.zeros((n, n), dtype=np.int64)
    for u, v in edges:
        wm[idx[u]][idx[v]] = 1
        wm[idx[v]][idx[u]] = 1
    num = float(z @ wm @ z)
    den = float(z @ z)
    expected = round(n / wm.sum() * num / den, 6)
    [row] = all_specs()["agg_morans_i"].fn(spark, SF_DIR).collect()
    assert row["n_nodes"] == n
    assert row["n_edges"] == len(edges)
    assert abs(row["morans_i"] - expected) < 2e-6, (row["morans_i"], expected)


def test_kaplan_meier_vs_direct_walk(spark):
    ev = _events()
    cust = pq.read_table(f"{SF_DIR}/customer.parquet").to_pydict()
    seg = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
    per_user: dict[int, list] = defaultdict(list)
    for ts, uid, et, eid in zip(
        ev["ts"], ev["user_id"], ev["event_type"], ev["event_id"]
    ):
        if uid in seg:
            per_user[uid].append((ts.value if hasattr(ts, "value") else ts, eid, et))
    spans: dict[str, list[tuple[int, bool]]] = defaultdict(list)
    from datetime import date

    epoch = date(1970, 1, 1)
    for uid, rows in per_user.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        day = lambda t: (t.date() - epoch).days  # noqa: E731
        d = day(rows[-1][0]) - day(rows[0][0])
        died = rows[-1][2] == "error"
        spans[seg[uid]].append((int(d), died))
    got = {
        (r["segment"], r["duration"]): (
            r["n_at_risk"],
            r["n_deaths"],
            r["km_log_micro"],
        )
        for r in all_specs()["tw_kaplan_meier"].fn(spark, SF_DIR).collect()
    }
    expected = {}
    for s, rows in spans.items():
        total = len(rows)
        by_d: dict[int, list[bool]] = defaultdict(list)
        for d, died in rows:
            by_d[d].append(died)
        ended_before = 0
        cum = 0
        for d in sorted(by_d):
            at_risk = total - ended_before
            deaths = sum(by_d[d])
            ended_before += len(by_d[d])
            if deaths > 0 and at_risk > deaths:
                step = round(1_000_000 * math.log(1.0 - deaths / at_risk))
                cum += int(step)
                expected[(s, d)] = (at_risk, deaths, cum)
    assert got == expected
    assert expected, "no death steps on the fixture — test is vacuous"


def test_containment_and_suffix_prefix_vs_strings(spark):
    t = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    byhash: dict[str, tuple[int, str]] = {}
    for did, text in zip(t["doc_id"], t["text"]):
        h = hashlib.md5(text.encode()).hexdigest()
        if h not in byhash or did < byhash[h][0]:
            byhash[h] = (did, text)
    docs = {did: text.split(" ") for did, text in byhash.values()}
    ids = sorted(docs)
    exp_contain = {}
    exp_sufpre = {}
    # candidate pairs via shared 8-grams (the only pairs the operators
    # can see; cap precondition asserted in refs part 1)
    grams: dict[str, set[int]] = defaultdict(set)
    for did, toks in docs.items():
        for i in range(len(toks) - 7):
            grams[" ".join(toks[i : i + 8])].add(did)
    cand = set()
    for ds in grams.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    for a, b in cand:
        ta, tb = docs[a], docs[b]
        sa, sb = " ".join(ta), " ".join(tb)
        # containment: whole token sequence appears contiguously
        if f" {sa} " in f" {sb} ":
            exp_contain[(a, b)] = len(ta)
        if f" {sb} " in f" {sa} ":
            exp_contain[(b, a)] = len(tb)
        # suffix-prefix overlap >= 12 tokens, both directions, longest
        for head, tail, th, tt in ((a, b, ta, tb), (b, a, tb, ta)):
            best = 0
            for L in range(min(len(th), len(tt)), 11, -1):
                if th[-L:] == tt[:L]:
                    best = L
                    break
            if best:
                exp_sufpre[(head, tail)] = best
    got_contain = {
        (r["contained_id"], r["container_id"]): r["n_tokens"]
        for r in all_specs()["dedup_substring_containment_docs"]
        .fn(spark, SF_DIR)
        .collect()
    }
    got_sufpre = {
        (r["head_id"], r["tail_id"]): r["overlap_tokens"]
        for r in all_specs()["dedup_suffix_prefix_overlap"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got_contain == exp_contain
    assert got_sufpre == exp_sufpre
    assert exp_contain and exp_sufpre, "vacuous fixture"
