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
