"""Second batch of independent pure-Python reference checks (see
test_round6_refs.py for the discipline): Bloom soundness, the CMS
one-sided bound over EVERY key, association rules / TextRank / Boruvka
/ HITS / JS divergence against from-scratch implementations sharing no
code and no SQL with either engine.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_bloom_zero_false_negatives_and_fp_count(spark):
    """Soundness: every true member passes the filter (Bloom's defining
    guarantee), verified per-key in Python md5 arithmetic; the query's
    counts must equal the brute-force tally."""
    o = pq.read_table(SF_DIR + "/orders.parquet").to_pydict()
    c = pq.read_table(SF_DIR + "/customer.parquet").to_pydict()
    build = {
        k for k, s in zip(c["c_custkey"], c["c_mktsegment"]) if s == "BUILDING"
    }
    m, kk = 16384, 4
    bits = set()
    for key in build:
        for j in range(kk):
            h = hashlib.md5(f"bloom{j}:{key}".encode()).hexdigest()[:8]
            bits.add(int(h, 16) % m)
    probe = set(o["o_custkey"])
    n_pass = n_member = n_fp = 0
    for key in probe:
        ok = all(
            int(hashlib.md5(f"bloom{j}:{key}".encode()).hexdigest()[:8], 16) % m
            in bits
            for j in range(kk)
        )
        member = key in build
        if member:
            assert ok, f"false negative for member {key}"  # soundness
        n_pass += ok
        n_member += member
        n_fp += ok and not member
    row = SPECS["agg_bloom_filter_semijoin"].fn(spark, SF_DIR).collect()[0]
    assert (row["n_build"], row["n_probe"]) == (len(build), len(probe))
    assert (row["bloom_pass"], row["true_members"], row["false_positives"]) == (
        n_pass,
        n_member,
        n_fp,
    )


def test_cms_never_undercounts_any_key(spark):
    """The count-min guarantee is ONE-SIDED for every key, not just the
    top-15 the registered query reports: estimate >= exact always.
    Checked in-engine over the full key set."""
    from cdc_poc_spark.queries.aggregates import _CMS_D, _CMS_W
    from cdc_poc_spark.tables import load_table

    orders = load_table(spark, SF_DIR, "orders").select("o_custkey")
    counts = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    kp = counts.select(
        "key",
        "exact_n",
        F.explode(F.array(*[F.lit(j) for j in range(_CMS_D)])).alias("j"),
    ).select(
        "key",
        "exact_n",
        "j",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cms"),
                            F.col("j").cast("string"),
                            F.lit(":"),
                            F.col("key").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        ).alias("pos"),
    )
    cells = kp.groupBy("j", "pos").agg(F.sum("exact_n").alias("cell_n"))
    est = (
        kp.join(cells, ["j", "pos"])
        .groupBy("key", "exact_n")
        .agg(F.min("cell_n").alias("cms"))
    )
    n_under = est.filter(F.col("cms") < F.col("exact_n")).count()
    assert n_under == 0


def test_association_rules_match_brute_force(spark):
    li = pq.read_table(SF_DIR + "/lineitem.parquet").to_pydict()
    baskets = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        baskets[o].add(p)
    n_orders = len(baskets)
    part_count: Counter = Counter()
    pair_count: Counter = Counter()
    for items in baskets.values():
        for p in items:
            part_count[p] += 1
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair_count[(s[i], s[j])] += 1
    expected = {}
    for (a, b), nb in pair_count.items():
        if nb >= 2:
            expected[(a, b)] = (
                nb,
                nb * 1_000_000 // n_orders,
                nb * 1_000_000 // part_count[a],
                nb * 1_000_000 // part_count[b],
                nb * n_orders * 1_000_000 // (part_count[a] * part_count[b]),
            )
    got = {
        (r["part_a"], r["part_b"]): (
            r["n_both"],
            r["support_ppm"],
            r["conf_a_to_b_ppm"],
            r["conf_b_to_a_ppm"],
            r["lift_micro"],
        )
        for r in SPECS["graph_association_rules"].fn(spark, SF_DIR).collect()
    }
    assert got == expected


def _tok_graph(min_w: int):
    d = pq.read_table(SF_DIR + "/documents.parquet").to_pydict()
    pair: Counter = Counter()
    for text in d["text"]:
        toks = [t for t in text.split(" ")]
        for i, a in enumerate(toks):
            for off in (1, 2):
                if i + off < len(toks):
                    b = toks[i + off]
                    pair[(min(a, b), max(a, b))] += 1
    return {e: w for e, w in pair.items() if w >= min_w}


def test_textrank_matches_python_integer_recursion(spark):
    from cdc_poc_spark.queries.textsim import _TR_MASS, _TR_MIN_COUNT, _TR_TOPK

    edges = _tok_graph(_TR_MIN_COUNT)
    sym = defaultdict(list)
    for (a, b), w in edges.items():
        sym[a].append((b, w))
        sym[b].append((a, w))
    wu = {n: sum(w for _, w in nb) for n, nb in sym.items()}
    n_nodes = len(wu)
    r = {n: _TR_MASS // n_nodes for n in wu}
    for _ in range(3):
        s: Counter = Counter()
        for u, nb in sym.items():
            for v, w in nb:
                s[v] += r[u] * w // wu[u]
        r = {
            v: 15 * (_TR_MASS // n_nodes) // 100 + 85 * s[v] // 100 for v in s
        }
    want = sorted(((-rv, tok) for tok, rv in r.items()))[:_TR_TOPK]
    want = [(tok, -neg) for neg, tok in want]
    got = [
        (row["token"], row["rank_pico"])
        for row in SPECS["text_textrank_keywords"].fn(spark, SF_DIR).collect()
    ]
    assert got == want


def test_boruvka_picks_match_python(spark):
    li = pq.read_table(SF_DIR + "/lineitem.parquet").to_pydict()
    baskets = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        baskets[o].add(p)
    pair: Counter = Counter()
    for items in baskets.values():
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair[(s[i], s[j])] += 1
    from cdc_poc_spark.queries.profiling import _COORDER_MIN_SHARED

    edges = {e: w for e, w in pair.items() if w >= _COORDER_MIN_SHARED}
    best: dict = {}
    for (a, b), w in edges.items():
        for u, v in ((a, b), (b, a)):
            cur = best.get(u)
            # max weight, tie -> smaller neighbor (the packed-key order)
            if cur is None or (w, -(v + 1)) > (cur[0], -(cur[1] + 1)):
                best[u] = (w, v)
    sel: Counter = Counter()
    weight = {}
    for u, (w, v) in best.items():
        key = (min(u, v), max(u, v))
        sel[key] += 1
        weight[key] = max(weight.get(key, 0), w)
    expected = {k: (weight[k], sel[k]) for k in sel}
    got = {
        (r["part_a"], r["part_b"]): (r["weight"], r["picked_by"])
        for r in SPECS["graph_boruvka_round"].fn(spark, SF_DIR).collect()
    }
    assert got == expected


def test_js_divergence_matches_python(spark):
    d = pq.read_table(SF_DIR + "/documents.parquet").to_pydict()
    ca: Counter = Counter()
    cb: Counter = Counter()
    for doc_id, text in zip(d["doc_id"], d["text"]):
        c = ca if doc_id % 2 == 0 else cb
        for t in text.split(" "):
            c[t] += 1
    na, nb = sum(ca.values()), sum(cb.values())
    toks = set(ca) | set(cb)
    ka = kb = 0
    one_sided = 0
    for t in toks:
        a, b = ca.get(t, 0), cb.get(t, 0)
        if a == 0 or b == 0:
            one_sided += 1
        mix = (a / na + b / nb) / 2
        if a:
            ka += a * round(math.log((a / na) / mix) * 1_000_000)
        if b:
            kb += b * round(math.log((b / nb) / mix) * 1_000_000)
    row = SPECS["text_distribution_drift_js"].fn(spark, SF_DIR).collect()[0]
    assert row["n_token_types"] == len(toks)
    assert row["n_one_sided_types"] == one_sided
    assert row["kl_a_m_weighted_micro"] == ka
    assert row["kl_b_m_weighted_micro"] == kb
