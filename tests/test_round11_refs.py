"""Round-11 reference tests: pure-Python third implementations beside
each new Spark query and its DuckDB oracle (the standing discipline).

1. BPE trainer (pipeline_bpe_train_k_rounds): a dictionary-based
   pure-Python BPE (Sennrich et al. ACL'16 reference algorithm — symbol
   tuples, pair counts over word types, greedy leftmost-non-overlapping
   merge) re-trains on the fixture corpus and must produce the
   IDENTICAL merge table; plus an exhaustive micro-proof that the
   wrapped-string `replace('|l||r|', '|lr|')` trick used by both
   engines IS the greedy merge rule on every word over a 2-letter
   alphabet up to length 6 and every applicable merge pair.
2. SemDeDup (dedup_semdedup_prune): an exact-arithmetic numpy/Python
   reference (integer quantization, exact centroid sums, Fraction
   distance comparison, integer cross-multiplied tau check, exact
   DECIMAL keep-rule) rebuilds the dropped/kept relation on the
   fixture and must agree row-for-row.
"""

from __future__ import annotations

from collections import Counter
from fractions import Fraction

import pyarrow.parquet as pq

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR

# ---------------------------------------------------------------------------
# Pure-Python BPE reference
# ---------------------------------------------------------------------------


def _greedy_merge(syms: tuple, left: str, right: str) -> tuple:
    """Leftmost-non-overlapping application of merge (left, right)."""
    out: list = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _wrap(syms: tuple) -> str:
    return "".join(f"|{s}|" for s in syms)


def _bpe_train_py(word_counts: dict, k: int) -> list:
    """Reference BPE trainer over a word-type dictionary. Returns
    [(rnd, left, right, merged, pair_count)]."""
    state = {tuple(w): c for w, c in word_counts.items() if len(w) >= 2}
    merges = []
    for rnd in range(1, k + 1):
        pc: Counter = Counter()
        for syms, c in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (left, right), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, left, right, left + right, n))
        new_state: Counter = Counter()
        for syms, c in state.items():
            new_state[_greedy_merge(syms, left, right)] += c
        state = dict(new_state)
    return merges


def test_wrapped_replace_is_greedy_merge():
    """The engines apply merges via literal string replace on the
    wrapped form `|s1||s2||...|`. Exhaustively over every word of
    length <= 6 on {a, b} and every pair of symbols present, the
    replace must equal the reference greedy merge — including the
    overlap cases (`aaa` + (a,a) -> [aa, a]) and the chained case
    where merged output neighbors more merge material."""
    from itertools import product

    for n in range(2, 7):
        for word in product("ab", repeat=n):
            syms = tuple(word)
            seen = set()
            for i in range(len(syms) - 1):
                seen.add((syms[i], syms[i + 1]))
            # also exercise a merge pair involving a multi-char symbol
            mid = _greedy_merge(syms, "a", "b")
            for pair_src in (syms, mid):
                for i in range(len(pair_src) - 1):
                    seen.add((pair_src[i], pair_src[i + 1]))
            for left, right in seen:
                for base in (syms, mid):
                    expect = _wrap(_greedy_merge(base, left, right))
                    got = _wrap(base).replace(
                        f"|{left}||{right}|", f"|{left}{right}|"
                    )
                    assert got == expect, (base, left, right, got, expect)


def test_bpe_train_k_rounds_matches_python(spark):
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").column("text")
    wc: Counter = Counter()
    for t in docs.to_pylist():
        for w in t.split(" "):
            if len(w) >= 2:
                wc[w] += 1
    expect = _bpe_train_py(wc, 6)
    got = [
        (r["rnd"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in sorted(
            all_specs()["pipeline_bpe_train_k_rounds"]
            .fn(spark, SF_DIR)
            .collect(),
            key=lambda r: r["rnd"],
        )
    ]
    assert got == expect


# ---------------------------------------------------------------------------
# Exact-arithmetic SemDeDup reference
# ---------------------------------------------------------------------------

_Q = 1_000_000


def _semdedup_py(sf_dir: str) -> list:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    # clone collapse first (mirrors the query: min-id canonical per
    # byte-identical vector; a no-op on the base fixtures)
    fams: dict = {}
    for vid, lab, v in zip(
        t.column("vec_id").to_pylist(),
        t.column("label").to_pylist(),
        t.column("embedding").to_pylist(),
    ):
        key = tuple(v)
        if key not in fams or vid < fams[key][0]:
            fams[key] = (vid, lab)
    ids = [vid for vid, _ in fams.values()]
    labels = [lab for _, lab in fams.values()]
    vecs = [
        [int(round(float(x) * _Q)) for x in v] for v in fams.keys()
    ]
    dims = len(vecs[0])
    # exact per-label centroid sums
    cents: dict = {}
    for lab, v in zip(labels, vecs):
        s, n = cents.setdefault(lab, ([0] * dims, [0]))
        for d in range(dims):
            s[d] += v[d]
        n[0] += 1
    # exact assignment: argmin of Fraction(sum((x*n - s)^2), n^2),
    # tie -> smallest centroid label
    assign: dict = {}
    own_num: dict = {}
    for vid, v in zip(ids, vecs):
        best = None
        for lab in sorted(cents):
            s, (n,) = cents[lab]
            num = sum((v[d] * n - s[d]) ** 2 for d in range(dims))
            key = (Fraction(num, n * n), lab)
            if best is None or key < best[0]:
                best = (key, lab, num)
        assign[vid] = best[1]
        own_num[vid] = best[2]
    n2 = {vid: sum(x * x for x in v) for vid, v in zip(ids, vecs)}
    vec_of = dict(zip(ids, vecs))
    # within-cell dup pairs, integer tau check (tau^2 = 9/100)
    by_cell: dict = {}
    for vid in ids:
        by_cell.setdefault(assign[vid], []).append(vid)
    dominators: dict = {}
    for cell, members in by_cell.items():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                va, vb = vec_of[a], vec_of[b]
                dot = sum(x * y for x, y in zip(va, vb))
                if dot <= 0 or 100 * dot * dot < 9 * n2[a] * n2[b]:
                    continue
                if (own_num[a], -a) > (own_num[b], -b):
                    kept, dropped = a, b
                else:
                    kept, dropped = b, a
                cos = dot / (n2[a] * n2[b]) ** 0.5
                dominators.setdefault(dropped, []).append(
                    (-own_num[kept], kept, cell, cos)
                )
    out = []
    for dropped, cands in dominators.items():
        cands.sort()
        _, kept, cell, cos = cands[0]
        out.append((cell, dropped, kept, cos))
    return sorted(out)


def test_semdedup_matches_exact_reference(spark):
    expect = _semdedup_py(SF_DIR)
    rows = all_specs()["dedup_semdedup_prune"].fn(spark, SF_DIR).collect()
    got = sorted(
        (r["cell_id"], r["dropped_id"], r["kept_id"], r["cosine"])
        for r in rows
    )
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[:3] == e[:3], (g, e)
        assert abs(g[3] - e[3]) < 2e-6, (g, e)  # engines round HALF_UP


# ---------------------------------------------------------------------------
# Bottom-k semilattice proofs + stream-twin invariants
# ---------------------------------------------------------------------------


def _md5_pri(eid: int) -> int:
    import hashlib

    return int(hashlib.md5(f"bk:{eid}".encode()).hexdigest()[:15], 16)


def test_bottomk_merge_is_association_invariant(spark):
    """bottom-k is a semilattice: partial bottom-k per shard, merged
    under THREE different groupings, equals the whole-table bottom-k —
    and equals the registered query's output."""
    ids = pq.read_table(f"{SF_DIR}/events.parquet").column(
        "event_id"
    ).to_pylist()
    k = 40
    pri = sorted((_md5_pri(i), i) for i in ids)
    whole = pri[:k]

    def bk(items):
        return sorted(items)[:k]

    shards = [[] for _ in range(7)]
    for i in ids:
        shards[i % 7].append((_md5_pri(i), i))
    parts = [bk(s) for s in shards]
    # flat merge, left fold, and a nested pairing must all agree
    flat = bk([x for p in parts for x in p])
    fold = parts[0]
    for p in parts[1:]:
        fold = bk(fold + p)
    nest = bk(bk(parts[0] + parts[1]) + bk(parts[2] + parts[3]))
    nest = bk(nest + bk(parts[4] + bk(parts[5] + parts[6])))
    assert flat == whole and fold == whole and nest == whole
    rows = (
        all_specs()["agg_bottomk_sample_merge"].fn(spark, SF_DIR).collect()
    )
    got = [(r["priority"], r["event_id"]) for r in sorted(rows, key=lambda r: r["rk"])]
    assert got == whole


def test_semdedup_stream_cross_epoch_index(spark):
    """The ingest twin's standing-index contract: both epochs land;
    every nearest_dup_id cited by an epoch-1 arrival must be a member
    of the index AT THAT POINT — a corpus canonical or an epoch-0
    SURVIVOR (never an epoch-0 dropped vector, never an epoch-1
    peer)."""
    rows = all_specs()["dedup_semdedup_stream"].fn(spark, SF_DIR).collect()
    epochs = {r["epoch"] for r in rows}
    assert epochs == {0, 1}
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    mx = max(t.column("vec_id").to_pylist())
    t1 = max(1, (mx + 1) // 3)
    e0 = {r["vec_id"]: r for r in rows if r["epoch"] == 0}
    survivors0 = {v for v, r in e0.items() if not r["dropped"]}
    for r in rows:
        if r["nearest_dup_id"] is None:
            continue
        nid = r["nearest_dup_id"]
        if r["epoch"] == 0:
            assert nid < t1, r  # only corpus members in the index yet
        else:
            assert nid < t1 or nid in survivors0, r
    # the cross-batch append must be load-bearing on this fixture:
    # at least one epoch-1 arrival cites an epoch-0 survivor
    assert any(
        r["nearest_dup_id"] is not None and r["nearest_dup_id"] >= t1
        for r in rows
        if r["epoch"] == 1
    ), "no epoch-1 arrival was deduped against an epoch-0 survivor"


# ---------------------------------------------------------------------------
# Tiered-dedup composition invariants (round-12 seed)
# ---------------------------------------------------------------------------


def test_dedup_tiers_composed_handoffs(spark):
    """Structural invariants of the composed pipeline: per-tier
    conservation (n_out = n_in - n_dropped), exact survivor-set
    handoff (tier t's n_out/id_sum == tier t+1's n_in and feed), and
    tier 1 agreeing with an independent pyarrow distinct-md5 count."""
    import hashlib

    rows = sorted(
        all_specs()["pipeline_dedup_tiers_composed"]
        .fn(spark, SF_DIR)
        .collect(),
        key=lambda r: r["tier"],
    )
    assert [r["tier"] for r in rows] == [1, 2, 3]
    for r in rows:
        assert r["n_out"] == r["n_in"] - r["n_dropped"], r
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt["n_in"] == prev["n_out"], (prev, nxt)
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    fams: dict = {}
    for did, txt in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        h = hashlib.md5(txt.encode()).hexdigest()
        if h not in fams or did < fams[h]:
            fams[h] = did
    assert rows[0]["n_in"] == t.num_rows
    assert rows[0]["n_out"] == len(fams)
    assert rows[0]["survivor_id_sum"] == sum(fams.values())
