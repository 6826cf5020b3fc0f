"""Training-corpus curation operators beyond dedup/similarity: benchmark
decontamination, PII redaction, greedy sequence packing, intra-document
repetition scoring, token-entropy profiling, and domain-mixture sampling.

Reference parity: the reference (thanminh24/CDC_POC) ships no corpus
operators; these extend the engine per the north-star brief (LLM
training-data pipeline ops as first-class components). Every operator
here has an oracle-checked query in ``queries/curation.py``.

Scale design notes (100 TB):

- ``ngram_contamination`` is the only multi-pass operator: one gram
  explode per side + one equi-join on the gram key + one keyed agg.
  At real scale the join key is a 64-bit hash of the gram (fixed-width
  shuffle payload); here it stays the gram string for bit-exact oracle
  parity — the swap is a one-line projection change and cannot change
  counts except by 2^-64-scale collisions.
- ``pack_greedy`` is sequential WITHIN a group (bin fill is inherently
  a left-to-right scan) and embarrassingly parallel ACROSS groups; a
  100 TB corpus packs per (source, shard) with bins never crossing
  shard boundaries, so every task is bounded by its shard size. The
  per-group scan runs in pandas via applyInPandas (Arrow-batched, one
  shuffle on the group key) — the same shape Spark itself uses for any
  grouped-map operator.
- Everything else (``pii_redact``, ``repetition_score``) is pure
  per-row Catalyst expressions — scan + map, no shuffle at all;
  ``token_entropy`` is one explode + two keyed aggs, map-side
  combinable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scale import spread

#: conservative Java/RE2-common regexes (work verbatim in Spark and DuckDB)
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_REGEX = r"\+1-555-[0-9]{4}"


def word_ngrams(toks: str, n: int) -> F.Column:
    """All word n-grams (with duplicates) as strings; empty array when
    the document is shorter than n. Pure Catalyst sequence/slice —
    the `size >= n` guard matters because sequence(0, -k) would count
    DOWN in Spark and fabricate grams."""
    return F.when(
        F.expr(f"size({toks})") >= n,
        F.expr(
            f"transform(sequence(0, size({toks}) - {n}),"
            f" i -> concat_ws(' ', slice({toks}, i + 1, {n})))"
        ),
    ).otherwise(F.expr("array()"))


def ngram_contamination(
    df: DataFrame,
    bench_pred: F.Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 3,
) -> DataFrame:
    """Benchmark decontamination: for every candidate (non-benchmark)
    document, count the DISTINCT word n-grams it shares with the
    benchmark slice (``bench_pred`` rows) and flag it contaminated at
    ``min_hits``. This is the standard n-gram-overlap test-set-leakage
    check run before training.

    Shape: the corpus is scanned ONCE (grams projected, then split by
    the predicate into bench/candidate branches of the same plan); the
    join is a plain equi-join on the gram, so Spark shuffles both sides
    by gram key — no broadcast assumption, benchmark sets can be huge.
    countDistinct rides a second keyed shuffle on the doc id."""
    grams = (
        spread(df)
        .withColumn("toks", F.split(F.col(text_col), " "))
        .select(
            F.col(id_col),
            bench_pred.alias("__is_bench"),
            F.explode(word_ngrams("toks", n)).alias("gram"),
        )
    )
    bench = grams.filter(F.col("__is_bench")).select("gram").distinct()
    hits = (
        grams.filter(~F.col("__is_bench"))
        .join(bench, "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_hit_grams"))
    )
    return hits.select(
        id_col,
        "n_hit_grams",
        (F.col("n_hit_grams") >= min_hits).alias("contaminated"),
    )


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scrubbing: count + redact email addresses and phone numbers
    via regexp. Emits per-doc match counts and the redacted text — the
    counts are the audit trail (how much PII the corpus carried), the
    redacted column is the training payload. Pure per-row regex in
    whole-stage codegen; a 100 TB corpus is scan + map."""
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_REGEX, "<EMAIL>"),
        PHONE_REGEX,
        "<PHONE>",
    )
    return spread(df).select(
        F.col(id_col),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_REGEX), F.lit(0))
        ).alias("n_emails"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(PHONE_REGEX), F.lit(0))
        ).alias("n_phones"),
        redacted.alias("redacted"),
    )


def pack_greedy(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    ntok_col: str = "n_tok",
    n_shards: int | None = None,
    order_desc_col: str | None = None,
) -> DataFrame:
    """Greedy sequence packing: within each group, walk documents in
    ``id_col`` order and append each to the current bin while the bin's
    token total stays <= budget; otherwise open a new bin. Documents
    longer than the budget get a bin of their own (the fill resets to
    their size; the next doc opens a fresh bin) — the packer never
    splits a document.

    This is per-group SEQUENTIAL state (bin fill), which Catalyst
    cannot express as a window (the reset depends on the running value
    itself), so it runs as an Arrow-batched grouped-map pandas kernel —
    one shuffle on the group key, then a linear scan per group.

    Scale: grouping by ``group_col`` alone bounds parallelism by the
    number of distinct groups — at 100 TB a handful of sources means a
    handful of straggler tasks each scanning a whole source. Pass
    ``n_shards`` to split every group into ``(group, shard)`` subgroups
    with ``shard = pmod(id_col, n_shards)``; bins never cross shards,
    so the kernel parallelizes as |groups| x n_shards while staying
    deterministic and oracle-reproducible (modulo, unlike a seeded
    hash, computes identically in any engine; swap in
    ``pmod(xxhash64(id_col), n)`` on a cluster if id values cluster)."""
    from pyspark.sql.types import LongType, StructField, StructType

    in_fields = {f.name: f for f in df.schema.fields}
    keys = [group_col] + (["shard"] if n_shards else [])
    out_schema = StructType(
        [in_fields[group_col]]
        + ([StructField("shard", LongType(), False)] if n_shards else [])
        + [in_fields[id_col], in_fields[ntok_col], StructField("bin_id", LongType(), False)]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if order_desc_col:
            # decreasing-order variants (NFD): walk (order_desc_col
            # DESC, id ASC) instead of arrival order — the recurrence
            # is unchanged, only the scan order differs
            pdf = pdf.sort_values(
                [order_desc_col, id_col], ascending=[False, True]
            ).reset_index(drop=True)
        else:
            pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, fill, b = [], 0, -1
        for t in pdf[ntok_col]:
            if b < 0 or fill + t > budget:
                b, fill = b + 1, int(t)
            else:
                fill += int(t)
            bins.append(b)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[keys + [id_col, ntok_col, "bin_id"]]

    sel = df.select(group_col, id_col, ntok_col)
    if n_shards:
        sel = sel.withColumn("shard", F.pmod(F.col(id_col), F.lit(n_shards)).cast("long"))
    return sel.groupBy(*keys).applyInPandas(pack, schema=out_schema)


def repetition_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """Intra-document repetition: 1 - distinct/total word n-grams — the
    boilerplate/spam signal (repeated paragraphs, keyword stuffing).
    Pure per-row array expressions, no shuffle; documents shorter than
    n score 0 over 0 grams and are emitted with rep_ratio = 0."""
    d = spread(df).withColumn("toks", F.split(F.col(text_col), " "))
    grams = word_ngrams("toks", n)
    n_grams = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    return d.select(
        F.col(id_col),
        n_grams.cast("long").alias("n_grams"),
        F.when(n_grams > 0, F.round(1.0 - n_distinct / n_grams, 5))
        .otherwise(F.lit(0.0))
        .alias("rep_ratio"),
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token-distribution Shannon entropy (nats), the
    gibberish/boilerplate detector: H = ln(n) - sum(c*ln(c))/n over
    token counts c. Computed from exact integer counts (explode ->
    count per (doc, token) -> one agg), both shuffles keyed by doc id
    and map-side combinable — no per-doc state beyond its vocabulary."""
    toks = (
        spread(df)
        .select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        toks.groupBy(id_col)
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.log("c")).alias("clnc"),
        )
        .select(
            F.col(id_col),
            F.round(F.log("n") - F.col("clnc") / F.col("n"), 5).alias(
                "token_entropy"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Exact multi-substring containment (benchmark decontamination)
# ---------------------------------------------------------------------------

def _ac_build(probes: list[str]):
    """Aho-Corasick automaton (Aho & Corasick, CACM 1975): goto trie +
    BFS failure links + output sets (probe indexes, merged along the
    failure chain so overlapping/nested probes all report)."""
    from collections import deque

    goto: list[dict] = [{}]
    fail: list[int] = [0]
    out: list[set] = [set()]
    for pi, p in enumerate(probes):
        s = 0
        for ch in p:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                fail.append(0)
                out.append(set())
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].add(pi)
    q = deque(goto[0].values())  # depth-1 states fail to root
    while q:
        r = q.popleft()
        for ch, s in goto[r].items():
            q.append(s)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            cand = goto[f].get(ch, 0)
            fail[s] = cand if cand != s else 0
            out[s] |= out[fail[s]]
    return goto, fail, out


def _ac_distinct_hits(text: str, goto, fail, out) -> int:
    s, hit = 0, set()
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        if out[s]:
            hit |= out[s]
    return len(hit)


def contains_probes(
    df: DataFrame,
    probes,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "broadcast",
) -> DataFrame:
    """Exact-substring decontamination: (id, n_probes_hit) for every
    document containing at least one probe string verbatim.

    ``method='broadcast'`` — non-equi broadcast join on
    ``contains(text, probe)``: one JVM substring search per
    (doc, probe) pair; the right plan up to a few thousand probes
    (the probe relation broadcasts, the corpus streams past in one
    scan).

    ``method='automaton'`` — ONE Aho-Corasick pass per document over
    ALL probes simultaneously via Arrow-batched ``mapInPandas``:
    O(len(text)) per doc regardless of probe count, the path once
    |docs| x |probes| substring scans dominate. The automaton builds
    once per task from the probe list (driver-collected and shipped in
    the task closure — benchmark suites are MBs by contract, and the
    build is linear in total probe chars).

    Both methods emit identical rows — asserted in tests.
    """
    if isinstance(probes, DataFrame):
        plist = [r[0] for r in probes.collect()]
    else:
        plist = list(probes)
    plist = sorted({p for p in plist if p})
    spark = df.sparkSession
    if method == "broadcast":
        pdf = spark.createDataFrame([(p,) for p in plist], "probe string")
        return (
            df.select(id_col, text_col)
            .join(F.broadcast(pdf), F.expr(f"contains({text_col}, probe)"))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_probes_hit"))
        )
    if method != "automaton":
        raise ValueError(f"unknown method: {method!r}")
    from pyspark.sql import types as T

    # id type derived from the input (hardcoding long broke string-keyed
    # corpora on the automaton path only — r4 review)
    schema = T.StructType(
        [df.schema[id_col], T.StructField("n_probes_hit", T.LongType())]
    )

    def batches(it):
        ac = _ac_build(plist)
        for pdf_batch in it:
            hits = pdf_batch[text_col].map(
                lambda t: _ac_distinct_hits(t or "", *ac)
            )
            res = pd.DataFrame(
                {id_col: pdf_batch[id_col], "n_probes_hit": hits}
            )
            yield res[res["n_probes_hit"] > 0]

    return spread(df).select(id_col, text_col).mapInPandas(batches, schema=schema)
