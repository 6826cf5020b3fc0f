"""Round-10 reference tests: pure-Python recomputation of the round's
new operator contracts — the independent THIRD implementation beside
each Spark query and its DuckDB oracle (the discipline that caught
real bugs in rounds 6-9).

Mergeable-sketch family (VERDICT r9 task #2):

1. rank-sample quantile summary — Python rebuild of the per-shard
   summary from raw rows, bit-equal to the Spark operator; merge
   GROUPING-ORDER INVARIANCE (partials-merge == whole-corpus, in any
   association); answer equality and the [t, t+B) rank theorem on the
   fixture AND on an adversarial heavy-ties stream.
2. hierarchical two-level compression — Python rebuild of the level-2
   kept set, answer equality, compound-bound theorem.
3. Misra-Gries — Python rebuild of the per-shard summaries and the
   flat merge, survivor/estimate equality with the Spark query; the
   N/(k+1) merged-budget theorem and heavy-hitter completeness on a
   Zipf stream under BOTH flat and two different hierarchical merge
   groupings.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR


def _cents(v: float) -> int:
    return int(
        Decimal(repr(float(v))).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        * 100
    )


# ---------------------------------------------------------------------------
# Pure-Python mergeable-summary references
# ---------------------------------------------------------------------------


def _rank_summary_py(rows, m):
    """rows: [(shard, y, tiebreak_id)] -> [(shard, y, rk, w)], the
    per-shard rank-sampled summary (s_p = ceil(n_p/m), keep every
    s_p-th + the shard max, weight = gap since previous kept)."""
    byshard = defaultdict(list)
    for sh, y, i in rows:
        byshard[sh].append((y, i))
    out = []
    for sh, vals in byshard.items():
        vals.sort()
        n_p = len(vals)
        s_p = -(-n_p // m)
        prev = 0
        for rk in range(1, n_p + 1):
            if rk % s_p == 0 or rk == n_p:
                out.append((sh, vals[rk - 1][0], rk, rk - prev))
                prev = rk
    return out


def _answer_py(summary, t):
    """First sample value whose running weight reaches t, in the
    (y, shard, rk) total order."""
    cw = 0
    for sh, y, rk, w in sorted(summary, key=lambda r: (r[1], r[0], r[2])):
        cw += w
        if cw >= t:
            return y
    raise AssertionError(f"target {t} beyond total weight {cw}")


def _events_rows(n_shards):
    t = pq.read_table(f"{SF_DIR}/events.parquet").to_pydict()
    return [
        (eid % n_shards, _cents(v), eid)
        for eid, v in zip(t["event_id"], t["value"])
    ]


def test_quantile_summary_matches_python(spark):
    """Spark rank_sample_summary == Python rebuild, as a multiset."""
    from pyspark.sql import functions as F

    from cdc_poc_spark.operators.sketches import rank_sample_summary
    from cdc_poc_spark.tables import VAL, dec, load_table

    ev = load_table(spark, SF_DIR, "events")
    b = ev.select(
        F.round(dec("value", VAL) * 100).cast("long").alias("y"),
        "event_id",
        F.expr("event_id % 8").alias("shard"),
    )
    got = sorted(
        (r["shard"], r["y"], r["rk"], r["w"])
        for r in rank_sample_summary(b, "y", "shard", 64, "event_id").collect()
    )
    expected = sorted(_rank_summary_py(_events_rows(8), 64))
    assert got == expected


def test_quantile_merge_grouping_invariance_and_bound(spark):
    """Partials-merge == whole-corpus in ANY association (merge is
    multiset union), the driver query's sketch answers equal the
    Python merge's answers, and every answer's true rank lands in
    [t, t+B)."""
    rows = _events_rows(8)
    summary = _rank_summary_py(rows, 64)
    # merge groupings: per-shard summaries unioned in three different
    # association orders — identical multiset by construction
    per_shard = defaultdict(list)
    for s in summary:
        per_shard[s[0]].append(s)
    shards = sorted(per_shard)
    flat = [s for sh in shards for s in per_shard[sh]]
    left_assoc: list = []
    for sh in shards:
        left_assoc = left_assoc + per_shard[sh]
    pairs: list = []
    for a, b in zip(shards[::2], shards[1::2]):
        pairs += per_shard[a] + per_shard[b]
    assert sorted(flat) == sorted(left_assoc) == sorted(pairs) == sorted(summary)

    ys = sorted(y for _, y, _ in rows)
    n = len(ys)
    s_ps = {
        sh: -(-len([r for r in rows if r[0] == sh]) // 64) for sh in shards
    }
    bound = sum(s - 1 for s in s_ps.values()) + max(s_ps.values())
    out = {
        r["q_label"]: r
        for r in all_specs()["agg_mergeable_quantile_sketch"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(out) == {"p25", "p50", "p75", "p90"}
    for lbl, num, den in (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10)):
        t = -(-num * n // den)
        v = _answer_py(summary, t)
        row = out[lbl]
        assert row["sketch_cents"] == v, lbl
        assert row["exact_cents"] == ys[t - 1], lbl
        assert row["rank_bound"] == bound, lbl
        # the rank theorem, recomputed directly on raw values
        r_le = sum(1 for y in ys if y <= v)
        r_lt = sum(1 for y in ys if y < v)
        assert r_le >= t and r_lt < t + bound, lbl
        assert row["rank_lo_ok"] and row["rank_hi_ok"], lbl


def test_quantile_bound_adversarial_ties():
    """The [t, t+B) theorem on a heavy-ties adversarial stream (80% of
    mass on 3 values, shard sizes wildly unequal), every percentile
    target 1..99 — pure Python, no Spark."""
    rows = []
    i = 0
    for sh, size in enumerate([17, 400, 3, 1200, 64, 999]):
        for j in range(size):
            y = (j * j) % 7 if j % 5 else 42  # ties + spikes
            rows.append((sh, y, i))
            i += 1
    m = 16
    summary = _rank_summary_py(rows, m)
    ys = sorted(y for _, y, _ in rows)
    n = len(ys)
    sizes = Counter(sh for sh, _, _ in rows)
    s_ps = {sh: -(-c // m) for sh, c in sizes.items()}
    bound = sum(s - 1 for s in s_ps.values()) + max(s_ps.values())
    for pct in range(1, 100):
        t = -(-pct * n // 100)
        v = _answer_py(summary, t)
        r_le = sum(1 for y in ys if y <= v)
        r_lt = sum(1 for y in ys if y < v)
        assert r_le >= t, (pct, t, v)
        assert r_lt < t + bound, (pct, t, v)


def test_hierarchical_level2_matches_python(spark):
    """Python rebuild of the level-2 weight-crossing compression:
    kept-set equality, answer equality, compound bound theorem."""
    rows = _events_rows(32)
    summary = _rank_summary_py(rows, 32)
    n = len(rows)
    step2 = -(-n // 64)
    # level-2 keep rule over the merged (y, shard, rk) order
    kept2 = []
    cw = 0
    for sh, y, rk, w in sorted(summary, key=lambda r: (r[1], r[0], r[2])):
        prev = cw
        cw += w
        if cw // step2 > prev // step2 or cw == n:
            kept2.append((y, cw))
    sizes = Counter(sh for sh, _, _ in rows)
    s_ps = {sh: -(-c // 32) for sh, c in sizes.items()}
    bound2 = sum(s - 1 for s in s_ps.values()) + max(s_ps.values()) + step2
    ys = sorted(y for _, y, _ in rows)
    out = {
        r["q_label"]: r
        for r in all_specs()["agg_quantile_sketch_hierarchical"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(out) == {"p50", "p90", "p99"}
    for lbl, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
        t = -(-num * n // den)
        v = next(y for y, c in kept2 if c >= t)
        row = out[lbl]
        assert row["sketch_cents"] == v, lbl
        assert row["exact_cents"] == ys[t - 1], lbl
        assert row["rank_bound"] == bound2, lbl
        assert row["n_level2"] == len(kept2), lbl
        r_le = sum(1 for y in ys if y <= v)
        r_lt = sum(1 for y in ys if y < v)
        assert r_le >= t and r_lt < t + bound2, lbl
        assert row["rank_lo_ok"] and row["rank_hi_ok"], lbl


# ---------------------------------------------------------------------------
# Misra-Gries references
# ---------------------------------------------------------------------------


def _mg_from_counts(counts: Counter, k: int):
    """(summary dict value->weight, d) — the order-independent MG
    closed form: subtract the (k+1)-th largest count, keep positives."""
    if len(counts) <= k:
        return dict(counts), 0
    d = sorted(counts.values(), reverse=True)[k]
    return {v: c - d for v, c in counts.items() if c > d}, d


def _mg_merge_py(summaries: list[dict], k: int):
    """Merge MG summaries: sum weights, subtract (k+1)-th largest."""
    tot: Counter = Counter()
    for s in summaries:
        tot.update(s)
    return _mg_from_counts(tot, k)


def test_misra_gries_matches_python(spark):
    """Spark agg_misra_gries_topk == Python rebuild on orders."""
    t = pq.read_table(f"{SF_DIR}/orders.parquet").to_pydict()
    k = 12
    shard_counts = defaultdict(Counter)
    exact: Counter = Counter()
    for ok, ck in zip(t["o_orderkey"], t["o_custkey"]):
        shard_counts[ok % 8][ck] += 1
        exact[ck] += 1
    parts, ds = [], []
    for sh in shard_counts:
        s, d = _mg_from_counts(shard_counts[sh], k)
        parts.append(s)
        ds.append(d)
    fin, d2 = _mg_merge_py(parts, k)
    bound = sum(ds) + d2
    n = sum(exact.values())
    rows = all_specs()["agg_misra_gries_topk"].fn(spark, SF_DIR).collect()
    got = {r["o_custkey"]: r for r in rows}
    assert set(got) == set(fin)
    for cust, est in fin.items():
        r = got[cust]
        assert r["est_count"] == est
        assert r["exact_count"] == exact[cust]
        assert r["err_bound"] == bound
        assert r["no_overcount"] and r["within_bound"] and r["mg_bound_ok"]
        assert r["n_heavy_missed"] == 0
    # theorem checks straight on the Python side
    assert (k + 1) * bound <= n
    for v, c in exact.items():
        if c > bound:
            assert v in fin, f"heavy hitter {v} (f={c}) escaped the sketch"


def test_misra_gries_zipf_guarantee():
    """Flat AND two hierarchical merge groupings keep the MG guarantee
    on an adversarial Zipf stream (heavy hitters genuinely exist) —
    pure Python. Hierarchical merges accumulate budget as
    B = Σ d_p (+ every intermediate subtraction)."""
    k = 9
    exact: Counter = Counter()
    shard_counts = defaultdict(Counter)
    i = 0
    for v in range(1, 61):
        for _ in range(-(-4000 // v)):  # Zipf-ish: value v appears ~4000/v
            shard_counts[i % 10][v] += 1
            exact[v] += 1
            i += 1
    n = sum(exact.values())
    parts, ds = [], []
    for sh in sorted(shard_counts):
        s, d = _mg_from_counts(shard_counts[sh], k)
        parts.append(s)
        ds.append(d)

    def check(fin, budget):
        assert (k + 1) * budget <= n
        assert len(fin) <= k
        for v, est in fin.items():
            assert est <= exact[v]
            assert exact[v] - est <= budget
        for v, c in exact.items():
            if c > budget:
                assert v in fin

    fin_flat, d2 = _mg_merge_py(parts, k)
    check(fin_flat, sum(ds) + d2)
    # left-assoc: ((((s0+s1)+s2)+...)
    acc, budget = parts[0], ds[0]
    for s, d in zip(parts[1:], ds[1:]):
        acc, dd = _mg_merge_py([acc, s], k)
        budget += d + dd
    check(acc, budget)
    # pairwise tree: (s0+s1)+(s2+s3)+...
    level, budgets = parts, list(ds)
    while len(level) > 1:
        nxt, nb = [], []
        for j in range(0, len(level) - 1, 2):
            m, dd = _mg_merge_py([level[j], level[j + 1]], k)
            nxt.append(m)
            nb.append(budgets[j] + budgets[j + 1] + dd)
        if len(level) % 2:
            nxt.append(level[-1])
            nb.append(budgets[-1])
        level, budgets = nxt, nb
    check(level[0], budgets[0])
