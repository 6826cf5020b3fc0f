"""Property-based tests (hypothesis) for the clone-collapse
decompositions added in round 4: for ANY corpus — arbitrary clone
multiplicities, short docs, empty strings — the collapsed formulations
must emit EXACTLY the rows of their naive twins. Spark round-trips are
expensive, so example counts are small and the corpora tiny; breadth
comes from hypothesis shrinking over clone patterns, not volume."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cdc_poc_spark.operators import dedup

# A corpus: a few distinct "template" texts, each replicated a random
# number of times (clone families), with token counts straddling the
# n=3 shingle eligibility threshold.
_WORDS = ["alpha", "beta", "gamma", "delta", "eps"]

texts_strategy = st.lists(
    st.tuples(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8),  # template
        st.integers(min_value=1, max_value=4),  # clone multiplicity
    ),
    min_size=1,
    max_size=6,
)


def _mk_docs(spark, families):
    rows, i = [], 0
    for toks, mult in families:
        text = " ".join(toks)
        for _ in range(mult):
            rows.append((i, text))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(families=texts_strategy)
@pytest.mark.slow
def test_collapsed_lsh_equals_flat_for_any_clone_pattern(spark, families):
    docs = _mk_docs(spark, families)
    flat = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in dedup.minhash_lsh_dedup_pairs(docs, threshold=0.5).collect()
    }
    collapsed = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in dedup.minhash_lsh_pairs_collapsed(docs, threshold=0.5).collect()
    }
    assert collapsed == flat


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    vecs=st.lists(
        st.tuples(
            st.lists(
                st.integers(min_value=-3, max_value=3), min_size=2, max_size=2
            ),  # template vector (ints -> exact floats)
            st.integers(min_value=1, max_value=3),  # clone multiplicity
            st.sampled_from(["x", "y"]),  # block label
        ),
        min_size=1,
        max_size=6,
    )
)
@pytest.mark.slow
def test_collapsed_cosine_equals_naive_for_any_clone_pattern(spark, vecs):
    from cdc_poc_spark.operators import similarity
    from tests.test_llm_ops import _naive_block_pairs

    rows, i = [], 0
    for v, mult, lbl in vecs:
        if all(x == 0 for x in v):
            v = [1, 0]  # zero vectors have undefined cosine in both paths
        for _ in range(mult):
            rows.append((i, [float(x) for x in v], lbl))
            i += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    got = {
        (r.id_a, r.id_b, r.cosine)
        for r in similarity.embedding_cosine_pairs(emb, threshold=0.3).collect()
    }
    want = {
        (r.id_a, r.id_b, r.cosine)
        for r in _naive_block_pairs(emb, 0.3).collect()
    }
    assert got == want


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(families=texts_strategy)
@pytest.mark.slow
def test_collapsed_incremental_equals_flat_for_any_clone_pattern(spark, families):
    """The R-S incremental PPJoin with per-side clone collapse must emit
    exactly the flat R-S rows for ANY clone pattern — including families
    spanning both sides (a text present in the batch AND the index must
    meet itself at 1.0 through its two canonicals)."""
    docs = _mk_docs(spark, families)
    new = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == 0)
    idx = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) != 0)
    flat = {
        (r.new_id, r.index_id, round(r.jaccard, 9))
        for r in dedup.exact_jaccard_pairs_incremental(
            new, idx, threshold=0.5, collapse_clones=False
        ).collect()
    }
    collapsed = {
        (r.new_id, r.index_id, round(r.jaccard, 9))
        for r in dedup.exact_jaccard_pairs_incremental(
            new, idx, threshold=0.5, collapse_clones=True
        ).collect()
    }
    assert collapsed == flat


@settings(
    max_examples=4, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(families=texts_strategy)
@pytest.mark.slow
def test_persisted_index_lifecycle_for_any_clone_pattern(spark, families):
    """build(A) + append(B) + query(C) against the persisted index must
    emit exactly the inline R-S join of C vs A ∪ B, for ANY corpus —
    clone families, short docs (< n tokens), empty strings. Exercises
    the frozen-token-order append path and the threshold re-cut."""
    docs = _mk_docs(spark, families)
    part = F.pmod(F.col("doc_id"), F.lit(3))
    a = docs.filter(part == 1)
    b = docs.filter(part == 2)
    c = docs.filter(part == 0)
    dedup.build_jaccard_index(a, "jidx_prop", threshold=0.5, n_buckets=2)
    try:
        dedup.append_to_jaccard_index(b, "jidx_prop")
        saved = {
            (r.new_id, r.index_id, round(r.jaccard, 9))
            for r in dedup.incremental_vs_jaccard_index(
                c, "jidx_prop", threshold=0.5
            ).collect()
        }
        inline = {
            (r.new_id, r.index_id, round(r.jaccard, 9))
            for r in dedup.exact_jaccard_pairs_incremental(
                c, a.unionByName(b), threshold=0.5, collapse_clones=False
            ).collect()
        }
        assert saved == inline
    finally:
        for t_name in (
            "jidx_prop_hsets",
            "jidx_prop_prefix",
            "jidx_prop_commons",
            "jidx_prop_meta",
        ):
            spark.sql(f"DROP TABLE IF EXISTS {t_name}")
