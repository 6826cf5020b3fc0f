"""Round-8 property tests (hypothesis): the DEFINING invariants of the
new operators, checked over randomized inputs on pure-Python reference
implementations that mirror the engine's constructions exactly (the
same split as rounds 6-7: cross-engine oracles catch value drift; these
catch a misunderstanding of the property the operator is FOR).

1. Content-defined chunking (mm_content_defined_chunks): chunks
   reconstruct the payload exactly, and the LBFS locality property —
   a single-byte edit can only change chunks near the edit, because a
   boundary decision at byte i reads only bytes i-3..i.
2. Rendezvous sharding (pipeline_rendezvous_sharding): adding a shard
   moves keys ONLY to the new shard; removing a shard moves ONLY that
   shard's keys (the two directions of minimal reshuffle).
3. Greedy matching round (graph_greedy_matching_round): matched pairs
   are vertex-disjoint, are edges of the graph, and are exactly the
   mutual-min handshakes.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# 1. content-defined chunking
# ---------------------------------------------------------------------------

_MOD = 32  # lockstep with queries/llm_ops._CDC_MOD


def _boundaries(hx: str) -> list[int]:
    """Byte positions after which a chunk ends — the engine's rule
    verbatim: md5 of the 4-byte gram ending at byte i, mod 32 == 0,
    plus the forced final boundary."""
    L = len(hx) // 2
    b = [
        i
        for i in range(4, L + 1)
        if int(hashlib.md5(hx[2 * i - 8 : 2 * i].encode()).hexdigest()[:8], 16)
        % _MOD
        == 0
    ]
    if not b or b[-1] != L:
        b.append(L)
    return b


def _chunks(hx: str) -> list[str]:
    out, prev = [], 0
    for b in _boundaries(hx):
        out.append(hx[2 * prev : 2 * b])
        prev = b
    return out


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=4, max_size=400))
def test_cdc_chunks_reconstruct(payload: bytes):
    hx = payload.hex().upper()
    assert "".join(_chunks(hx)) == hx
    assert all(ch for ch in _chunks(hx))  # no empty chunks


@settings(max_examples=60, deadline=None)
@given(
    st.binary(min_size=16, max_size=400),
    st.data(),
)
def test_cdc_chunks_edit_locality(payload: bytes, data):
    """Replace ONE byte: every boundary decision whose 4-byte gram does
    not cover the edited byte is unchanged, so boundaries outside
    [pos, pos+3] survive — the content-defined property that makes the
    scheme a dedup primitive (fixed-size blocks would shift everything
    after the edit... and so would an INSERT here if boundaries were
    offset-based)."""
    pos = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
    new_byte = data.draw(st.integers(min_value=0, max_value=255))
    edited = payload[:pos] + bytes([new_byte]) + payload[pos + 1 :]
    b0 = set(_boundaries(payload.hex().upper()))
    b1 = set(_boundaries(edited.hex().upper()))
    # a boundary at byte i depends on bytes i-3..i (1-based i = byte
    # index pos+1..pos+4 covers the edit at 0-based pos)
    affected = set(range(pos + 1, pos + 5))
    assert b0 - affected == b1 - affected


# ---------------------------------------------------------------------------
# 2. rendezvous sharding
# ---------------------------------------------------------------------------


def _hrw(doc_id: int, shards: list[int]) -> int:
    def wt(s: int) -> int:
        return int(
            hashlib.md5(f"hrw{s}:{doc_id}".encode()).hexdigest()[:12], 16
        )

    return max(shards, key=lambda s: (wt(s), -s))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60, unique=True),
    st.integers(min_value=2, max_value=12),
)
def test_hrw_add_shard_moves_only_to_new(doc_ids, k):
    old = list(range(k))
    new = list(range(k + 1))
    for d in doc_ids:
        a, b = _hrw(d, old), _hrw(d, new)
        assert b == a or b == k  # a kept shard never gains from another


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60, unique=True),
    st.integers(min_value=2, max_value=12),
    st.data(),
)
def test_hrw_remove_shard_moves_only_its_keys(doc_ids, k, data):
    gone = data.draw(st.integers(min_value=0, max_value=k - 1))
    full = list(range(k))
    rest = [s for s in full if s != gone]
    for d in doc_ids:
        a, b = _hrw(d, full), _hrw(d, rest)
        if a != gone:
            assert b == a  # survivors keep every key they had


# ---------------------------------------------------------------------------
# 3. greedy matching round
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        max_size=80,
    )
)
def test_matching_round_invariants(raw_edges):
    edges = {(min(u, v), max(u, v)) for u, v in raw_edges if u != v}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    pref = {n: min(ns) for n, ns in adj.items()}
    matched = {
        (n, pref[n])
        for n in pref
        if pref.get(pref[n]) == n and n < pref[n]
    }
    # matched pairs are edges, vertex-disjoint, and mutual-min
    nodes_seen: set[int] = set()
    for u, v in matched:
        assert (u, v) in edges
        assert u not in nodes_seen and v not in nodes_seen
        nodes_seen.update((u, v))
        assert pref[u] == v and pref[v] == u
    # every node whose min-neighbor reciprocates IS matched (no misses)
    for n in pref:
        if pref.get(pref[n]) == n:
            assert n in nodes_seen
