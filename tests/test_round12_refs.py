"""Round-12 reference tests: pure-Python third implementations beside
each new Spark query and its DuckDB oracle (the standing discipline).

1. Curation e2e (pipeline_curation_e2e): stage arithmetic invariants
   (handoff chaining, id-sum monotonicity, pack preserving the
   selection) plus a cross-QUERY pin — stages 1-3 must equal
   pipeline_dedup_tiers_composed's independently-oracled rows.
2. Re-centroid maintenance (dedup_semdedup_recentroid_maintenance):
   (a) a pure-Python exact-arithmetic frozen-screen reference
   (base-canonical centroids, Fraction assignment, integer tau) must
   reproduce cell_frozen / n_index_dups_frozen / dropped_frozen per
   batch vector; (b) the rebuild columns must agree with round-11's
   _semdedup_py reference run on the grown corpus.
3. BPE fertility (pipeline_bpe_fertility_eval): round-11's pure-Python
   BPE trainer + a greedy-merge encoder re-derive the per-language
   fertility table exactly.
"""

from __future__ import annotations

import pytest

from collections import Counter
from fractions import Fraction

import pyarrow.parquet as pq

from cdc_poc_spark.queries import all_specs

from .conftest import SF_DIR
from .test_round11_refs import _bpe_train_py, _greedy_merge, _semdedup_py

_Q = 1_000_000


# ---------------------------------------------------------------------------
# 1. Curation e2e
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_curation_e2e_stage_arithmetic(spark):
    rows = {
        r["stage"]: r
        for r in all_specs()["pipeline_curation_e2e"].fn(spark, SF_DIR).collect()
    }
    assert sorted(rows) == list(range(1, 9))
    names = [rows[s]["stage_name"] for s in range(1, 9)]
    assert names == [
        "exact", "containment", "minhash_lsh", "semdedup", "decontam",
        "quality_lang", "quota_waterfill", "pack",
    ]
    for s in range(1, 9):
        r = rows[s]
        assert r["n_out"] == r["n_in"] - r["n_dropped"], r
        assert r["n_dropped"] >= 0 and r["n_out"] >= 0, r
    # handoff chaining: stage s+1 consumes exactly stage s's survivors
    for s in range(1, 8):
        assert rows[s + 1]["n_in"] == rows[s]["n_out"], (s, rows)
    # id sums weakly decrease (ids are non-negative) and pack drops
    # nothing
    for s in range(1, 7):
        assert rows[s + 1]["survivor_id_sum"] <= rows[s]["survivor_id_sum"]
    assert rows[8]["n_dropped"] == 0
    assert rows[8]["survivor_id_sum"] == rows[7]["survivor_id_sum"]
    assert rows[8]["aux"] >= 1  # at least one packed bin


@pytest.mark.slow
def test_curation_e2e_stages_match_tiers_composed(spark):
    """Stages 1-3 re-derive pipeline_dedup_tiers_composed's rows — an
    independently-oracled query — column for column."""
    specs = all_specs()
    e2e = {
        r["stage"]: r
        for r in specs["pipeline_curation_e2e"].fn(spark, SF_DIR).collect()
    }
    tiers = {
        r["tier"]: r
        for r in specs["pipeline_dedup_tiers_composed"].fn(spark, SF_DIR).collect()
    }
    for s in (1, 2, 3):
        for col in ("n_in", "n_dropped", "n_out", "survivor_id_sum"):
            assert e2e[s][col] == tiers[s][col], (s, col, e2e[s], tiers[s])


# ---------------------------------------------------------------------------
# 2. Re-centroid maintenance
# ---------------------------------------------------------------------------


def _frozen_screen_py(sf_dir: str) -> dict:
    """Exact-arithmetic frozen-path reference: standing index from the
    base canonicals (vec_id % 10 != 0), batch (vec_id % 10 = 0)
    assigned against the FROZEN centroids and screened in-cell with the
    all-integer tau decision. Returns {vec_id: (cell, n_dups)}."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    labs = t.column("label").to_pylist()
    vecs = [
        [int(round(float(x) * _Q)) for x in v]
        for v in t.column("embedding").to_pylist()
    ]
    dims = len(vecs[0])
    base = [(i, l, v) for i, l, v in zip(ids, labs, vecs) if i % 10 != 0]
    batch = [(i, v) for i, v in zip(ids, vecs) if i % 10 == 0]
    # base clone collapse (min-id canonical per byte-identical vector)
    fams: dict = {}
    for vid, lab, v in base:
        key = tuple(v)
        if key not in fams or vid < fams[key][0]:
            fams[key] = (vid, lab)
    canon = [(vid, lab, list(key)) for key, (vid, lab) in fams.items()]
    cents: dict = {}
    for _, lab, v in canon:
        s, n = cents.setdefault(lab, ([0] * dims, [0]))
        for d in range(dims):
            s[d] += v[d]
        n[0] += 1

    def assign(v: list) -> int:
        best = None
        for lab in sorted(cents):
            s, (n,) = cents[lab]
            num = sum((v[d] * n - s[d]) ** 2 for d in range(dims))
            key = (Fraction(num, n * n), lab)
            if best is None or key < best[0]:
                best = (key, lab)
        return best[1]

    idx_by_cell: dict = {}
    for vid, lab, v in canon:
        idx_by_cell.setdefault(assign(v), []).append((vid, v))
    out: dict = {}
    for vid, v in batch:
        cell = assign(v)
        n2v = sum(x * x for x in v)
        dups = 0
        for _, iv in idx_by_cell.get(cell, []):
            dot = sum(x * y for x, y in zip(v, iv))
            n2i = sum(x * x for x in iv)
            if dot > 0 and 100 * dot * dot >= 9 * n2v * n2i:
                dups += 1
        out[vid] = (cell, dups)
    return out


def test_recentroid_frozen_matches_python_reference(spark):
    expect = _frozen_screen_py(SF_DIR)
    rows = (
        all_specs()["dedup_semdedup_recentroid_maintenance"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert {r["vec_id"] for r in rows} == set(expect)
    for r in rows:
        cell, dups = expect[r["vec_id"]]
        assert r["cell_frozen"] == cell, (r, cell)
        assert r["n_index_dups_frozen"] == dups, (r, dups)
        assert r["dropped_frozen"] == (dups > 0), r


def test_recentroid_rebuild_agrees_with_semdedup_reference(spark):
    """dropped_rebuild must equal 'not kept by the full batch prune' as
    computed by round-11's exact reference on the grown corpus."""
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    vec_key: dict = {}
    for vid, v in zip(ids, t.column("embedding").to_pylist()):
        key = tuple(v)
        if key not in vec_key or vid < vec_key[key]:
            vec_key[key] = vid
    canon_ids = set(vec_key.values())
    dropped_ref = {d for _, d, _, _ in _semdedup_py(SF_DIR)}
    kept = canon_ids - dropped_ref
    rows = (
        all_specs()["dedup_semdedup_recentroid_maintenance"]
        .fn(spark, SF_DIR)
        .collect()
    )
    n_base_dropped_expect = sum(
        1 for i in ids if i % 10 != 0 and i not in kept
    )
    for r in rows:
        assert r["dropped_rebuild"] == (r["vec_id"] not in kept), r
        assert r["n_base_dropped_rebuild"] == n_base_dropped_expect, r


# ---------------------------------------------------------------------------
# 3. BPE fertility
# ---------------------------------------------------------------------------


def test_bpe_fertility_matches_python(spark):
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    langs = t.column("lang").to_pylist()
    texts = t.column("text").to_pylist()
    wc: Counter = Counter()
    for txt in texts:
        for w in txt.split(" "):
            if len(w) >= 2:
                wc[w] += 1
    merges = _bpe_train_py(dict(wc), 6)
    # encode every trainable word through the learned merges, in order
    enc: dict = {}
    for w in wc:
        syms = tuple(w)
        for _, left, right, _, _ in merges:
            syms = _greedy_merge(syms, left, right)
        enc[w] = len(syms)
    agg: dict = {}
    for lang, txt in zip(langs, texts):
        a = agg.setdefault(lang, [0, 0, 0, 0])  # docs, words, chars, toks
        a[0] += 1
        for w in txt.split(" "):
            if len(w) < 1:
                continue
            a[1] += 1
            a[2] += len(w)
            a[3] += enc.get(w, 1)
    rows = (
        all_specs()["pipeline_bpe_fertility_eval"].fn(spark, SF_DIR).collect()
    )
    assert {r["lang"] for r in rows} == set(agg)
    for r in rows:
        docs, words, chars, toks = agg[r["lang"]]
        assert r["n_docs"] == docs, r
        assert r["n_words"] == words, r
        assert r["n_chars"] == chars, r
        assert r["n_bpe_tokens"] == toks, r
        assert r["fertility_milli"] == 1000 * toks // words, r
        assert r["bytes_per_bpe_token_milli"] == 1000 * chars // toks, r
        assert r["tokens_per_million_chars"] == 1000000 * toks // chars, r


# ---------------------------------------------------------------------------
# 4. Ingest-gate golden test on a hand fixture (cross-epoch clone index)
# ---------------------------------------------------------------------------


def test_curation_ingest_gates_golden(spark, tmp_path):
    """Every gate exercised on a constructed corpus: benchmark member,
    low quality, exact clone of the base, contaminated vs the bench
    8-gram, within-batch clone peers (both pass), and a batch-1 clone
    of a batch-0 admit (caught only if the cross-epoch index append
    works)."""
    import json as _json
    import os

    from cdc_poc_spark.streaming.curation import curation_ingest_stream

    def good(tag: str) -> str:
        # 25 tokens, includes 'the' (stopword), high ttr -> q >= 0.5
        return "the " + " ".join(f"{tag}w{i}" for i in range(24))

    bench_text = good("bench")  # >= 8 tokens: its 8-grams form the bits
    base_rows = [
        (1, "src1", good("base")),      # admitted into the standing index
        (2, "src0", good("s0base")),    # excluded: benchmark shard
        (3, "src1", "q r s t u"),       # excluded: quality 0.4 < 0.5
    ]
    bench_rows = [(100, bench_text)]
    b0 = [
        {"doc_id": 10, "source": "src1", "text": good("base")},   # clone of base
        {"doc_id": 11, "source": "src1", "text": good("peer")},   # peer a
        {"doc_id": 12, "source": "src1", "text": good("peer")},   # peer b
        {"doc_id": 13, "source": "src1", "text": "q r s t u"},    # low quality
        {"doc_id": 14, "source": "src0", "text": good("arriv")},  # bench member
        {"doc_id": 15, "source": "src2", "text": bench_text},     # contaminated
    ]
    b1 = [
        {"doc_id": 20, "source": "src1", "text": good("peer")},   # clone of 11's admit
        {"doc_id": 21, "source": "src1", "text": good("fresh")},  # admitted
    ]
    base = spark.createDataFrame(base_rows, "doc_id long, source string, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    for i, rows in enumerate((b0, b1)):
        p = data_dir / f"b{i:03d}.json"
        p.write_text("\n".join(_json.dumps(r) for r in rows))
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(data_dir))
    )
    out = str(tmp_path / "out")
    q = curation_ingest_stream(
        stream, base, bench, out,
        str(tmp_path / "index"), str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination(600)
    disp = {
        r["doc_id"]: r
        for r in spark.read.parquet(out).collect()
    }
    assert set(disp) == {10, 11, 12, 13, 14, 15, 20, 21}
    assert disp[10]["is_clone"] and not disp[10]["admitted"]
    assert disp[11]["admitted"] and disp[12]["admitted"]  # in-batch peers
    assert not disp[13]["quality_ok"] and not disp[13]["admitted"]
    assert disp[14]["benchmark_member"] and not disp[14]["admitted"]
    assert disp[15]["bloom_flagged"] and disp[15]["contaminated"]
    assert not disp[15]["admitted"]
    # the cross-epoch append: 20 clones batch-0's admit 11
    assert disp[20]["epoch"] == 1 and disp[20]["is_clone"]
    assert not disp[20]["admitted"]
    assert disp[21]["admitted"]
    # the standing index grew by exactly the admits
    idx = spark.read.parquet(str(tmp_path / "index")).collect()
    by_epoch = {}
    for r in idx:
        by_epoch.setdefault(r["epoch"], set()).add(r["doc_id"])
    assert by_epoch[-1] == {1}
    assert by_epoch[0] == {11, 12}
    assert by_epoch[1] == {21}


# ---------------------------------------------------------------------------
# 5. Split-vs-truncate packing: pure-Python dual-walk reference
# ---------------------------------------------------------------------------


def _pack_py(items: list, budget: int) -> list:
    """Greedy packer: items = [n_tok...] in walk order; returns bin
    fills."""
    fills, cur = [], None
    for t in items:
        if cur is None or cur + t > budget:
            fills.append(t)
            cur = t
        else:
            fills[-1] += t
            cur += t
    return fills


def test_pack_split_vs_truncate_matches_python(spark):
    B = 64
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    rows = sorted(
        zip(
            t.column("source").to_pylist(),
            t.column("doc_id").to_pylist(),
            (len(x.split(" ")) for x in t.column("text").to_pylist()),
        ),
        key=lambda r: r[1],
    )
    groups: dict = {}
    for src, did, n in rows:
        groups.setdefault((src, did % 8), []).append(n)
    expect = {}
    for key, toks in groups.items():
        fu = _pack_py(toks, B)
        chunks = [
            min(B, n - i * B)
            for n in toks
            for i in range((n + B - 1) // B)
        ]
        fs = _pack_py(chunks, B)
        expect[key] = (
            len(toks),
            sum(1 for n in toks if n > B),
            len(fu),
            sum(max(B - f, 0) for f in fu),
            sum(max(f - B, 0) for f in fu),
            len(fs),
            sum(B - f for f in fs),
            len(fs) - len(fu),
        )
    got = (
        all_specs()["pipeline_pack_split_vs_truncate"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert {(r["source"], r["shard"]) for r in got} == set(expect)
    for r in got:
        e = expect[(r["source"], r["shard"])]
        assert (
            r["n_docs"], r["n_over_budget"], r["bins_unsplit"],
            r["padding_unsplit"], r["overflow_unsplit"], r["bins_split"],
            r["padding_split"], r["bins_delta"],
        ) == e, (r, e)
