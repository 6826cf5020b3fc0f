"""Round-7 reference tests, batch 3: pure-Python/numpy recomputation of
the three queries added this round (the r6 norm: every new operator
ships with an oracle AND an engine-independent reference in the same
round).

1. ml_ols_normal_equation — numpy lstsq on the same integer-quantized
   design matrix must agree with the Cramer's-rule coefficients to
   float tolerance (an independent SOLVER, not a re-derivation, so a
   sign error in a determinant cannot cancel across implementations).
2. ml_nearest_centroid_classifier — numpy centroids (truncating
   integer means) + exact integer argmin on the fixture.
3. pipeline_proportional_sample — pure-Python largest-remainder quota
   + md5-rank membership on the fixture; also checks the global-size
   invariant |sample| = N DIV 10 exactly.
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow.parquet as pq

from .conftest import SF_DIR


def _rhu(v: float) -> int:
    return int(Decimal(repr(float(v))).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _q2(v: float) -> Decimal:
    return Decimal(repr(float(v))).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)


def test_ols_matches_numpy_lstsq(spark):
    from cdc_poc_spark.queries import all_specs

    (row,) = all_specs()["ml_ols_normal_equation"].fn(spark, SF_DIR).collect()
    t = pq.read_table(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_extendedprice", "l_quantity", "l_discount"],
    ).to_pydict()
    y = np.array([int(_q2(v) * 100) for v in t["l_extendedprice"]], dtype=np.float64)
    x1 = np.array(
        [
            int(
                Decimal(repr(float(v))).quantize(
                    Decimal("0.1"), rounding=ROUND_HALF_UP
                )
                * 100
            )
            for v in t["l_quantity"]
        ],
        dtype=np.float64,
    )
    x2 = np.array([int(_q2(v) * 100) for v in t["l_discount"]], dtype=np.float64)
    X = np.column_stack([np.ones_like(y), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row.n_rows == len(y)
    # independent solver: agree to relative 1e-6 (Cramer vs QR)
    for got, ref in (
        (row.intercept_cents, beta[0]),
        (row.coef_qty_centi, beta[1]),
        (row.coef_disc_pct, beta[2]),
    ):
        assert abs(got - ref) <= 1e-6 * max(1.0, abs(ref)), (got, ref)
    resid = y - X @ beta
    sst = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - float((resid**2).sum()) / sst
    assert abs(row.r2 - r2) <= 1e-6


def test_nearest_centroid_matches_numpy(spark):
    from cdc_poc_spark.queries import all_specs

    rows = all_specs()["ml_nearest_centroid_classifier"].fn(spark, SF_DIR).collect()
    got = {(r.true_label, r.pred_label): r.n_vecs for r in rows}

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    labels = t.column("label").to_pylist()
    vecs = [
        np.array([_rhu(float(x) * 1_000_000) for x in v], dtype=np.int64)
        for v in t.column("embedding").to_pylist()
    ]
    cents = {}
    for lbl in sorted(set(labels)):
        members = np.stack([v for v, l2 in zip(vecs, labels) if l2 == lbl])
        s = members.sum(axis=0, dtype=np.int64)
        cnt = len(members)
        cents[lbl] = np.where(s >= 0, s // cnt, -((-s) // cnt)).astype(np.int64)
    expected: dict[tuple[int, int], int] = {}
    for v, true in zip(vecs, labels):
        best = None
        for lbl, c in cents.items():
            d2 = int(((v - c) ** 2).sum())
            key = d2 * 16 + lbl
            if best is None or key < best:
                best = key
        pred = best % 16
        expected[(true, pred)] = expected.get((true, pred), 0) + 1
    assert got == expected
    # the classifier must be meaningfully diagonal on the labeled fixture
    diag = sum(n for (a, b), n in expected.items() if a == b)
    assert diag * 5 >= sum(expected.values()), "centroid classifier degenerate"


def test_proportional_sample_matches_pure_python(spark):
    from cdc_poc_spark.queries import all_specs

    rows = all_specs()["pipeline_proportional_sample"].fn(spark, SF_DIR).collect()
    got = sorted((r.doc_id, r.lang) for r in rows)

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"])
    docs = list(zip(t.column("doc_id").to_pylist(), t.column("lang").to_pylist()))
    by_lang: dict[str, list[int]] = {}
    for did, lang in docs:
        by_lang.setdefault(lang, []).append(did)
    n = len(docs)
    base = {lang: len(ids) // 10 for lang, ids in by_lang.items()}
    k = n // 10 - sum(base.values())
    order = sorted(by_lang, key=lambda lg: (-(len(by_lang[lg]) % 10), lg))
    quota = {
        lang: base[lang] + (1 if i < k else 0) for i, lang in enumerate(order)
    }
    expected = []
    for lang, ids in by_lang.items():
        ranked = sorted(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
        expected.extend((d, lang) for d in ranked[: quota[lang]])
    assert got == sorted(expected)
    assert len(got) == n // 10  # exact global size invariant
