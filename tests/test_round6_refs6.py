"""Sixth batch of independent reference checks for round-6 WINDOW
queries: exact MIPS and L2 top-k against numpy brute force, and the
Zipf rank-frequency fit against a from-scratch least-squares.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def _vecs():
    t = pq.read_table(SF_DIR + "/embeddings.parquet").to_pydict()
    return {
        i: np.array(v, dtype=np.float64)
        for i, v in zip(t["vec_id"], t["embedding"])
    }


def test_mips_topk_matches_numpy(spark):
    vecs = _vecs()
    expected = {}
    for q in range(10):
        scored = sorted(
            (
                (-round(float(vecs[q] @ v), 5), nid)
                for nid, v in vecs.items()
                if nid != q
            )
        )[:5]
        for rank, (nips, nid) in enumerate(scored, 1):
            expected[(q, nid)] = (-nips, rank)
    got = {
        (r["query_id"], r["neighbor_id"]): (r["inner_product"], r["rank"])
        for r in SPECS["sim_mips_topk"].fn(spark, SF_DIR).collect()
    }
    assert got == expected


def test_euclidean_topk_matches_numpy(spark):
    vecs = _vecs()
    expected = {}
    for q in range(10):
        scored = sorted(
            (
                (round(float(np.sqrt(((vecs[q] - v) ** 2).sum())), 5), nid)
                for nid, v in vecs.items()
                if nid != q
            )
        )[:5]
        for rank, (dist, nid) in enumerate(scored, 1):
            expected[(q, nid)] = (dist, rank)
    got = {
        (r["query_id"], r["neighbor_id"]): (r["l2_dist"], r["rank"])
        for r in SPECS["sim_euclidean_topk"].fn(spark, SF_DIR).collect()
    }
    assert got == expected


def test_zipf_fit_matches_python_least_squares(spark):
    d = pq.read_table(SF_DIR + "/documents.parquet").to_pydict()
    freq: Counter = Counter()
    for text in d["text"]:
        for t in text.split(" "):
            if t:
                freq[t] += 1
    # rank by frequency desc, token asc (the deterministic order), then
    # the micro-nat quantized (ln rank, ln freq) regression
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (
            round(math.log(i + 1) * 1e6),
            round(math.log(n) * 1e6),
        )
        for i, (_, n) in enumerate(ranked)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row = SPECS["text_zipf_fit"].fn(spark, SF_DIR).collect()[0]
    assert row["n_types"] == n
    assert abs(row["zipf_slope"] - slope) < 1e-4
