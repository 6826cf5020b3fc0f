"""Round-7 property tests (hypothesis): the pure-math invariants of
this round's operators, checked over RANDOM inputs — the fixture-based
reference tests prove one world; these prove the rule.

Pure Python only (no Spark session): the properties under test are the
integer quota apportionment and the capped-Jaccard definition, both of
which have exact engine-independent specifications.
"""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st


# --- largest-remainder quotas (pipeline_proportional_sample) ------------


def _quotas(counts: dict[str, int], step: int = 10) -> dict[str, int]:
    """The query's quota rule, re-stated: base n_s DIV step; the global
    shortfall vs N DIV step goes to the largest n_s % step, ties to the
    smaller stratum name."""
    n = sum(counts.values())
    base = {s: c // step for s, c in counts.items()}
    k = n // step - sum(base.values())
    order = sorted(counts, key=lambda s: (-(counts[s] % step), s))
    return {s: base[s] + (1 if i < k else 0) for i, s in enumerate(order)}


@given(
    st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=3),
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=300, deadline=None)
def test_quota_invariants(counts):
    q = _quotas(counts)
    n = sum(counts.values())
    # exact global size
    assert sum(q.values()) == n // 10
    for s, c in counts.items():
        # never exceeds the stratum, never negative
        assert 0 <= q[s] <= c
        # within 1 of exact proportionality (floor(c/10) <= q <= floor+1)
        assert c // 10 <= q[s] <= c // 10 + 1


@given(
    st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=3),
        st.integers(min_value=0, max_value=500),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_quota_matches_bruteforce_apportionment(counts):
    """The window-rank formulation equals the textbook largest-remainder
    method (Hamilton apportionment) computed independently."""
    q = _quotas(counts)
    n = sum(counts.values())
    target = n // 10
    base = {s: c // 10 for s, c in counts.items()}
    rem = sorted(counts, key=lambda s: (-(counts[s] % 10), s))
    brute = dict(base)
    for s in rem[: target - sum(base.values())]:
        brute[s] += 1
    assert q == brute


# --- capped common-neighbor Jaccard (graph_linkpred_common_neighbors) ---


def _py_linkpred(edges, hub_cap):
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    hubs = {x for x, s in nbrs.items() if len(s) > hub_cap}
    np_ = {x: {y for y in s if y not in hubs} for x, s in nbrs.items()}
    eset = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    out = {}
    for a, b in itertools.combinations(sorted(nbrs), 2):
        if (a, b) in eset:
            continue
        common = len(np_[a] & np_[b])
        if common >= 2:
            out[(a, b)] = (common, common / (len(np_[a]) + len(np_[b]) - common))
    return out


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=0,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=20),
)
@settings(max_examples=200, deadline=None)
def test_capped_linkpred_properties(edges, cap):
    res = _py_linkpred(edges, cap)
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        if u == v:
            continue
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    hubs = {x for x, s in nbrs.items() if len(s) > cap}
    eset = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    for (a, b), (common, j) in res.items():
        assert (a, b) not in eset  # never predicts an existing edge
        assert common >= 2
        assert 0.0 < j <= 1.0  # exact set identity keeps Jaccard in range
        # every counted common neighbor is a non-hub by definition
        shared = (nbrs[a] & nbrs[b]) - hubs
        assert len(shared) == common
    # monotone: raising the cap can only ADD evidence per surviving pair
    res_hi = _py_linkpred(edges, cap + 5)
    for pair, (common, _) in res.items():
        if pair in res_hi:
            assert res_hi[pair][0] >= common
