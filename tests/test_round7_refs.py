"""Round-7 reference tests, batch 1: the linkpred hub cap (VERDICT r6
"What's wrong" #2 → "Next round" #2).

Two angles the cross-engine oracle is structurally blind to:

1. A pure-Python recomputation of capped common-neighbor Jaccard on a
   hand-built graph — value-level correctness of the N' semantics
   (degrees from the hub-filtered neighborhood, exact set identity).
2. The hub-skew probe the judge asked for: on a star graph (one hub
   wired to everything) the UNCAPPED wedge join would emit
   O(leaves²) candidate pairs; with the cap the hub is excluded as a
   wedge center and the candidate relation is exactly the non-hub
   structure. The test asserts the bounded output AND that the hub
   still appears as an endpoint (hubs receive predictions, they just
   don't serve as evidence).
"""

from __future__ import annotations

import itertools

from cdc_poc_spark.operators.graph import common_neighbor_linkpred


def _py_linkpred(edges: list[tuple[int, int]], hub_cap: int):
    """Pure-Python reference: capped common-neighbor Jaccard."""
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    hubs = {n for n, s in nbrs.items() if len(s) > hub_cap}
    nprime = {n: {x for x in s if x not in hubs} for n, s in nbrs.items()}
    eset = {(min(u, v), max(u, v)) for u, v in edges}
    out = {}
    for a, b in itertools.combinations(sorted(nbrs), 2):
        if (a, b) in eset:
            continue
        common = len(nprime[a] & nprime[b])
        if common >= 2:
            j = common / (len(nprime[a]) + len(nprime[b]) - common)
            out[(a, b)] = (common, round(j, 6))
    return out


def _run(spark, edges, hub_cap):
    df = spark.createDataFrame(edges, ["u", "v"])
    rows = common_neighbor_linkpred(df, hub_cap=hub_cap).collect()
    return {(r.a, r.b): (r.n_common, r.neighbor_jaccard) for r in rows}


def test_capped_linkpred_matches_pure_python(spark):
    # Two 4-cliques sharing two bridge nodes + a degree-heavy hub (node
    # 99) wired into everything: the hub must not serve as evidence.
    clique1 = list(itertools.combinations([1, 2, 3, 4], 2))
    clique2 = list(itertools.combinations([5, 6, 7, 8], 2))
    bridges = [(2, 5), (2, 6), (3, 5), (3, 6)]
    hub = [(99, n) for n in range(1, 9)]
    edges = clique1 + clique2 + bridges + hub
    cap = 6  # only node 99 (degree 8) is a hub; bridge nodes 2/3 (deg 6) stay
    expected = _py_linkpred(edges, cap)
    got = _run(spark, edges, cap)
    assert got == expected
    assert expected, "fixture must be non-empty to be discriminating"
    # and the cap must CHANGE the answer (99 is a shared neighbor of
    # every clique pair): uncapped n_common counts it, capped does not.
    assert expected != _py_linkpred(edges, 10**9)


def test_capped_linkpred_no_hubs_equals_uncapped(spark):
    # With a cap above every degree the capped operator degenerates to
    # the classic uncapped definition.
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (1, 5)]
    assert _run(spark, edges, hub_cap=100) == _py_linkpred(edges, 10**9)


def test_hub_skew_probe_bounded_fanout(spark):
    # Star graph: hub 0 connected to 200 leaves, plus a small honest
    # community (leaves 1..4 pairwise-ish). Uncapped, the wedge join on
    # the shared neighbor 0 emits C(200,2) = 19900 candidate pairs —
    # every leaf pair "shares" the hub. Capped, the hub is not a wedge
    # center: only the community's own wedges survive.
    from pyspark.sql import functions as F

    star = [(0, i) for i in range(1, 201)]
    community = [(1, 2), (2, 3), (3, 4), (1, 3), (2, 4)]
    edges = star + community

    # The blowup lives in the INTERMEDIATE wedge relation (the output is
    # then filtered by n_common >= 2 / adjacency, which hides it), so
    # measure the wedge fanout itself with and without the hub filter —
    # the exact relation the operator feeds its groupBy.
    def wedge_count(hub_cap):
        e = spark.createDataFrame(edges, ["u", "v"])
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        deg = sym.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
        hubs = deg.filter(F.col("deg") > hub_cap).select(F.col("node").alias("v"))
        symf = sym.join(F.broadcast(hubs), "v", "left_anti")
        s1 = symf.select(F.col("u").alias("a"), F.col("v").alias("n"))
        s2 = symf.select(F.col("u").alias("b"), F.col("v").alias("n"))
        return s1.join(s2, "n").filter(F.col("a") < F.col("b")).count()

    assert wedge_count(10**9) >= 19900  # C(200,2) pairs through the hub
    assert wedge_count(64) < 30  # bounded: community wedges only

    # End-to-end on the same graph: capped output matches the pure-
    # Python reference and the hub still RECEIVES predictions (node 0
    # shares non-hub neighbors {2,3} with community members it is
    # adjacent to — so extend with a detached node wired to 2 and 3).
    edges2 = edges + [(500, 2), (500, 3)]
    capped = _run(spark, edges2, hub_cap=64)
    assert capped == _py_linkpred(edges2, 64)
    assert any(0 in pair for pair in capped), (
        "hub must still be predictable as an endpoint"
    )
