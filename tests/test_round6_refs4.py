"""Fourth batch of independent pure-Python reference checks: spatial
grid pairs vs an all-pairs haversine, feature hashing, NB inference,
temperature-mixture apportionment, and the rolling slope — each
recomputed from scratch off the parquet fixtures.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_spatial_grid_pairs_match_all_pairs_haversine(spark):
    """The grid join must be OUTPUT-IDENTICAL to the quadratic
    all-pairs check (the 3x3 neighborhood is a complete cover at cell
    ~ radius): brute-force every supplier pair in Python."""
    s = pq.read_table(SF_DIR + "/supplier.parquet").to_pydict()

    def coord(salt, key):
        h = hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8]
        return (int(h, 16) % 10000000) / 1000000.0 - 5.0

    pts = {
        k: (coord("slat:", k), coord("slon:", k)) for k in s["s_suppkey"]
    }
    expected = {}
    keys = sorted(pts)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            la, lo = pts[a]
            lb, lo2 = pts[b]
            h = (
                math.sin(math.radians(lb - la) / 2) ** 2
                + math.cos(math.radians(la))
                * math.cos(math.radians(lb))
                * math.sin(math.radians(lo2 - lo) / 2) ** 2
            )
            km = 2 * 6371.0088 * math.asin(math.sqrt(h))
            if km <= 250.0:
                expected[(a, b)] = round(km, 3)
    got = {
        (r["supp_a"], r["supp_b"]): r["km"]
        for r in SPECS["join_spatial_grid_pairs"].fn(spark, SF_DIR).collect()
    }
    assert got == expected and expected


def test_feature_hashing_matches_python(spark):
    d = pq.read_table(SF_DIR + "/documents.parquet").to_pydict()
    ent: Counter = Counter()
    for doc_id, text in zip(d["doc_id"], d["text"]):
        tf: Counter = Counter(t for t in text.split(" ") if t != "")
        for tok, n in tf.items():
            dim = int(
                hashlib.md5(f"fh:{tok}".encode()).hexdigest()[:8], 16
            ) % 256
            sgn = (
                1
                if int(hashlib.md5(f"fs:{tok}".encode()).hexdigest()[:8], 16) % 2
                == 0
                else -1
            )
            ent[(doc_id, dim)] += sgn * n
    per_dim = defaultdict(lambda: [0, 0, 0])  # n_docs, sum_abs, net
    for (_, dim), w in ent.items():
        if w != 0:
            per_dim[dim][0] += 1
            per_dim[dim][1] += abs(w)
            per_dim[dim][2] += w
    expected = {d_: tuple(v) for d_, v in per_dim.items()}
    got = {
        r["dim"]: (r["n_docs"], r["sum_abs_w"], r["net_w"])
        for r in SPECS["ml_feature_hashing"].fn(spark, SF_DIR).collect()
    }
    assert got == expected


def test_naive_bayes_confusion_matches_python(spark):
    d = pq.read_table(SF_DIR + "/documents.parquet").to_pydict()
    docs = list(zip(d["doc_id"], d["lang"], d["text"]))
    wc: Counter = Counter()
    cls_tokens: Counter = Counter()
    vocab = set()
    cls_docs: Counter = Counter()
    for _, lang, text in docs:
        cls_docs[lang] += 1
        for t in text.split(" "):
            wc[(lang, t)] += 1
            cls_tokens[lang] += 1
            vocab.add(t)
    v = len(vocab)
    langs = sorted(cls_docs)
    n_docs = len(docs)
    ll = {
        (c, t): round(math.log((n + 1) / (cls_tokens[c] + v)) * 1_000_000)
        for (c, t), n in wc.items()
    }
    fl = {
        c: round(math.log(1.0 / (cls_tokens[c] + v)) * 1_000_000) for c in langs
    }
    lp = {
        c: round(math.log(cls_docs[c] / n_docs) * 1_000_000) for c in langs
    }
    conf: Counter = Counter()
    for _, true_lang, text in docs:
        tf = Counter(text.split(" "))
        best = None
        for c in langs:
            score = lp[c] + sum(
                n * ll.get((c, t), fl[c]) for t, n in tf.items()
            )
            # argmax, tie -> smaller class name (the rn=1 window order)
            if (
                best is None
                or score > best[0]
                or (score == best[0] and c < best[1])
            ):
                best = (score, c)
        conf[(true_lang, best[1])] += 1
    got = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in SPECS["ml_naive_bayes_apply"].fn(spark, SF_DIR).collect()
    }
    assert got == dict(conf)


def test_temperature_mixture_quotas_match_python(spark):
    from cdc_poc_spark.queries.pipeline import _TEMP_MIX_BUDGET, _TEMP_MIX_T

    d = pq.read_table(SF_DIR + "/documents.parquet").to_pydict()
    counts = Counter(d["source"])
    w = {s: round(n**_TEMP_MIX_T * 1_000_000) for s, n in counts.items()}
    wt = sum(w.values())
    q0 = {s: wi * _TEMP_MIX_BUDGET // wt for s, wi in w.items()}
    rem = {s: wi * _TEMP_MIX_BUDGET % wt for s, wi in w.items()}
    missing = _TEMP_MIX_BUDGET - sum(q0.values())
    order = sorted(w, key=lambda s: (-rem[s], s))
    quota = dict(q0)
    for s in order[:missing]:
        quota[s] += 1
    assert sum(quota.values()) == _TEMP_MIX_BUDGET
    got = {
        r["source"]: (r["n_docs"], r["w_micro"], r["quota"])
        for r in SPECS["pipeline_temperature_mixture"].fn(spark, SF_DIR).collect()
    }
    assert got == {s: (counts[s], w[s], quota[s]) for s in counts}


def test_rolling_slope_matches_python(spark):
    o = pq.read_table(SF_DIR + "/orders.parquet").to_pydict()
    days = pq.read_table(SF_DIR + "/orders.parquet").column("o_orderdate")
    import pyarrow.compute as pc

    day_idx = pc.days_between(
        pc.cast(pc.strptime("1970-01-01", format="%Y-%m-%d", unit="us"), "date32"),
        pc.cast(days, "date32"),
    ).to_pylist()
    rows = defaultdict(list)
    for ck, ok, x, p in zip(
        o["o_custkey"], o["o_orderkey"], day_idx, o["o_totalprice"]
    ):
        rows[ck].append((x, ok, round(p * 100)))
    expected = {}
    for ck, rs in rows.items():
        rs.sort()
        for x, ok, y in rs:
            win = [(xx, yy) for xx, _, yy in rs if x - 90 <= xx <= x]
            n = len(win)
            sx = sum(xx for xx, _ in win)
            sy = sum(yy for _, yy in win)
            sxy = sum(xx * yy for xx, yy in win)
            sxx = sum(xx * xx for xx, _ in win)
            den = n * sxx - sx * sx
            if den > 0:
                v = (n * sxy - sx * sy) / den
                # HALF_UP like both engines (python round() is
                # half-even and diverges on exact .xxxx5 doubles —
                # one fixture row lands exactly on .15625)
                r4 = math.copysign(math.floor(abs(v) * 1e4 + 0.5) / 1e4, v)
                expected[(ck, ok)] = (n, r4)
    got = {
        (r["o_custkey"], r["o_orderkey"]): (r["n_win"], r["slope_cents_per_day"])
        for r in SPECS["win_rolling_slope"].fn(spark, SF_DIR).collect()
    }
    assert got == expected
