"""Text-analysis operators for a training-data pipeline: token/char
statistics, quality scoring, language identification, fingerprinting,
regex (BPE-ish) token counting.

All pure Catalyst expressions (higher-order array functions, regex
built-ins) — each runs inside whole-stage codegen with no Python in the
row path, so a 100 TB documents table is one scan + map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scale import spread

#: tiny per-language stopword lists for the heuristic language-ID.
#: Order matters: it is the deterministic argmax tie-break priority.
LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "value"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "les", "des", "et", "est"),
    "zh": ("的", "是", "在", "了"),
}

#: BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
#: Restricted to the RE2/Java-common syntax subset.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _count_in(toks: str, words: tuple) -> F.Column:
    quoted = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter({toks}, t -> t IN ({quoted})))")


def text_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple = (),
) -> DataFrame:
    """Per-document statistics: chars, tokens, vocabulary, mean token
    length, stopword ratio — the standard quality-filter features.
    `keep` carries extra source columns through the projection so
    composed pipelines don't re-scan + re-join the corpus for them."""
    d = spread(df).withColumn("toks", F.split(F.col(text_col), " "))
    n_tokens = F.size("toks")
    total_tok_chars = F.expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))")
    stop = _count_in("toks", LANG_STOPWORDS["en"])
    return d.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_unique_tokens"),
        (total_tok_chars.cast("double") / n_tokens.cast("double")).alias("mean_token_len"),
        (stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
        (
            F.size(F.array_distinct("toks")).cast("double") / n_tokens.cast("double")
        ).alias("ttr"),
        *[F.col(c) for c in keep],
    )


def quality_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple = (),
) -> DataFrame:
    """Deterministic composite quality score in [0, 1]:
    0.4·length-band + 0.3·type-token-ratio + 0.3·stopword presence.
    (Every component is an exact int/int ratio — cross-engine stable.)"""
    s = text_stats(df, id_col, text_col, keep=keep)
    len_band = (
        F.when((F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 200), 1.0)
        .when(F.col("n_tokens") > 200, 0.5)
        .otherwise(0.25)
    )
    stop_band = F.when(F.col("stopword_ratio") > 0, 1.0).otherwise(0.0)
    score = F.round(
        len_band * 0.4 + F.col("ttr") * 0.3 + stop_band * 0.3, 5
    )
    return s.select(
        id_col,
        "n_tokens",
        "ttr",
        "stopword_ratio",
        score.alias("quality_score"),
        *keep,
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language-ID: stopword-overlap score per language,
    argmax with fixed priority tie-break (dict order). Emits all scores
    for inspectability."""
    from functools import reduce
    from operator import and_

    d = spread(df).withColumn("toks", F.split(F.col(text_col), " "))
    scores = {lang: _count_in("toks", words) for lang, words in LANG_STOPWORDS.items()}
    langs = list(LANG_STOPWORDS)
    # First-match CASE chain: the first lang whose score >= every LATER
    # lang's score is the global argmax with dict-order tie-break.
    pred = None
    for i, lang in enumerate(langs[:-1]):
        cond = reduce(and_, (scores[lang] >= scores[o] for o in langs[i + 1 :]))
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    pred = pred.otherwise(F.lit(langs[-1]))
    cols = [F.col(id_col)]
    cols += [scores[lang].alias(f"score_{lang}") for lang in langs]
    cols += [pred.alias("pred_lang")]
    return d.select(*cols)


def lang_id_accuracy(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", label_col: str = "lang") -> DataFrame:
    """Confusion profile of the heuristic against the labeled column."""
    p = lang_id(df, id_col, text_col).select(id_col, "pred_lang")
    joined = df.select(id_col, F.col(label_col)).join(p, id_col)
    return joined.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("pred_lang") == F.col(label_col), 1).otherwise(0)).alias(
            "n_correct"
        ),
    )


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Canonical content fingerprint: md5 over the sorted distinct token
    set. Stable under token reordering/repetition — the cheap
    near-dup-cluster key (dedup.fingerprint_clusters groups on it)."""
    return spread(df).select(
        F.col(id_col),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(F.split(F.col(text_col), " "))), " ")
        ).alias("fingerprint"),
    )


def regex_token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """BPE-ish pre-tokenization count via regexp_extract_all — the
    token-budget estimator."""
    return spread(df).select(
        F.col(id_col),
        F.size(F.expr(f"regexp_extract_all({text_col}, '{TOKEN_REGEX}', 0)")).alias(
            "n_regex_tokens"
        ),
        F.length(text_col).alias("n_chars"),
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram log-probability — the cheap stand-in for
    model-perplexity quality filtering (docs whose tokens are unlikely
    under the corpus's own unigram LM are boilerplate/garbled/foreign):
    score(d) = mean over tokens t of ln p(t), p(t) = corpus count(t) /
    total tokens.

    Cross-engine exactness: each token's ln p is QUANTIZED to int64
    micro-nats (round(ln(c/total) * 1e6)) BEFORE the per-doc sum, so
    cross-row accumulation is exact integer math (double sums are
    shuffle-order-dependent); c and total are exact counts, and ln on
    identical doubles is the same IEEE op in Spark and DuckDB. The
    reported mean floors an exact-integer/bigint double division —
    identical in both engines on identical inputs.

    Scale shape: one token explode feeding a map-side-combinable
    groupBy(token) (the LM), a broadcast single-row total, a token-keyed
    join back (hash join, no fanout — one LM row per token value), and
    a groupBy(doc). No collect, no UDF; vocabulary lives distributed,
    never on the driver."""
    tok = (
        spread(df)
        .select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    counts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    probs = counts.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(
            F.log(F.col("c").cast("double") / F.col("total").cast("double")) * 1e6
        )
        .cast("long")
        .alias("q_lp"),
    )
    return (
        tok.join(probs, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("q_lp").alias("q_lp_sum"),
        )
        .select(
            id_col,
            "n_tokens",
            "q_lp_sum",
            F.floor(F.col("q_lp_sum").cast("double") / F.col("n_tokens"))
            .cast("long")
            .alias("avg_micro_nats"),
        )
    )


def bigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document BIGRAM log-probability under the corpus's own
    add-one-smoothed bigram LM — one model order up from
    unigram_logprob, and a materially better junk detector: token-salad
    documents whose unigrams are individually common score near the
    unigram mode but collapse under P(w2|w1).

    score(d) = sum over adjacent pairs (w1,w2) of
    ln((c(w1,w2) + 1) / (c(w1) + V)), V = vocabulary size.

    Cross-engine exactness: identical to the unigram contract — each
    bigram's ln p is quantized to int64 micro-nats BEFORE the per-doc
    sum (exact integer accumulation under any shuffle order); the
    smoothed ratio is ONE double division of exact integers, the same
    IEEE op in both engines.

    Scale shape: bigram expansion is a map-side transform over the
    token array; the LM is a groupBy(w1,w2) with map-side partial agg;
    c(w1) and V ride a token groupBy + single-row broadcast; the join
    back is keyed on (w1,w2) with no fanout (one LM row per bigram
    value). No collect (V is a broadcast scalar relation), no UDF."""
    from .scale import spread

    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    d = (
        spread(df)
        .select(F.col(id_col), toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .withColumn(
            "bg",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
                )
            ),
        )
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    tok = (
        spread(df)
        .select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = tok.agg(F.count(F.lit(1)).alias("v"))
    c2 = d.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    probs = (
        c2.join(tok.withColumnRenamed("tok", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("c2") + 1).cast("double")
                    / (F.col("c1") + F.col("v")).cast("double")
                )
                * 1e6
            )
            .cast("long")
            .alias("q_lp"),
        )
    )
    return (
        d.join(probs, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("q_lp").alias("q_lp_sum"),
        )
        .select(
            id_col,
            "n_bigrams",
            "q_lp_sum",
            F.floor(F.col("q_lp_sum").cast("double") / F.col("n_bigrams"))
            .cast("long")
            .alias("avg_micro_nats"),
        )
    )


#: winnowing fingerprint identity is packed into ONE bigint:
#: key = h * 2^20 + (2^20 - 1 - pos). Requires pos < 2^20 (per-document
#: gram positions — ~1M tokens/doc; training-data pipelines chunk far
#: below this, and pipeline_chunk_documents is the upstream that
#: guarantees it). h < 2^32 (md5 prefix), so key < 2^52 — exact in
#: BIGINT and in a double, either engine.
_WINNOW_POS_BITS = 20


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-token gram, slide a
    w-gram window, and select each window's MINIMUM hash (rightmost
    position on ties). Guarantees: any shared substring of length
    k + w - 1 tokens yields at least one shared fingerprint, while only
    ~2/(w+1) of grams are kept — the standard sub-linear sketch for
    plagiarism / overlap detection over a corpus.

    Selection is the pure-relational spelling of the sliding min: each
    gram at position p replicates to the w window-starts it covers
    (map-side explode of w offsets — rows × w before the shuffle), and
    per (doc, window) ONE min over the packed (hash, 2^20-1-pos) bigint
    picks the min-hash/rightmost-tie gram in a single map-side-
    combinable aggregate (no window-function sort, no second pass).
    Short documents (fewer than w grams) collapse to a single window so
    every document with >= k tokens fingerprints to >= 1 entry.

    Output per document: gram/window/fingerprint counts plus
    fp_checksum = SUM(DISTINCT packed-key) — an exact integer content
    signature two corpora can diff without exchanging fingerprint
    sets. The gram hash is the first 8 md5 hex digits as a bigint —
    engine-portable (no xxhash in DuckDB), collision-safe enough for
    fingerprint SELECTION (a collision merely swaps which gram is kept;
    both engines swap identically)."""
    win = _winnow_selection(df, id_col, text_col, k, w)
    return win.groupBy(id_col, "n_grams", "n_windows").agg(
        F.count_distinct(F.col("sel_key")).alias("n_fingerprints"),
        F.sum_distinct(F.col("sel_key")).alias("fp_checksum"),
    )


def winnowing_selected(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """The selected winnowing fingerprints themselves — distinct
    (id, h, p) rows decoded from the packed selection keys. This is the
    relation an overlap/plagiarism join consumes (equi-join on h across
    documents); winnowing_fingerprints is the per-doc sketch summary
    over the same selection. Separate entry point so consumers/tests
    can exercise the winnowing GUARANTEE (shared >= k+w-1-token
    substring => shared fingerprint hash) on the actual selected
    sets."""
    pos_mod = 1 << _WINNOW_POS_BITS
    return (
        _winnow_selection(df, id_col, text_col, k, w)
        .select(
            id_col,
            F.expr(f"sel_key DIV {pos_mod}").alias("h"),
            (F.lit(pos_mod - 1) - F.col("sel_key") % pos_mod).alias("p"),
        )
        .distinct()
    )


def _winnow_selection(
    df: DataFrame, id_col: str, text_col: str, k: int, w: int
) -> DataFrame:
    """Shared winnowing selection stage: one row per (doc, window) with
    the packed min key — see winnowing_fingerprints for the contract."""
    from .scale import spread

    pos_mod = 1 << _WINNOW_POS_BITS
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    grams = (
        spread(df)
        .select(F.col(id_col), toks.alias("toks"))
        .filter(F.size("toks") >= k)
        .select(
            id_col,
            (F.size("toks") - k + 1).alias("n_grams"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {k}),"
                    f" i -> array_join(slice(toks, i + 1, {k}), ' '))"
                )
            ).alias("p0", "gram"),
        )
        .select(
            id_col,
            "n_grams",
            F.greatest(F.lit(1), F.col("n_grams") - w + 1).alias("n_windows"),
            (F.col("p0") + 1).alias("p"),
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long").alias("h"),
        )
    )
    # Loud failure instead of silent key corruption (ADVICE r5): a
    # document with >= 2^20 grams would underflow the position field
    # into the hash field. The check rides inside the key expression
    # (not a droppable side column Catalyst could prune away).
    p_checked = F.when(F.col("p") < pos_mod, F.col("p")).otherwise(
        F.raise_error(
            F.format_string(
                "winnowing: gram position %s >= 2^%s — document too large for "
                "the packed key; chunk upstream (pipeline_chunk_documents)",
                F.col("p").cast("string"),
                F.lit(str(_WINNOW_POS_BITS)),
            )
        )
    )
    keyed = grams.withColumn(
        "key",
        F.col("h") * pos_mod + (F.lit(pos_mod - 1) - p_checked),
    )
    return (
        keyed.withColumn("off", F.explode(F.sequence(F.lit(0), F.lit(w - 1))))
        .withColumn("ws", F.col("p") - F.col("off"))
        .filter((F.col("ws") >= 1) & (F.col("ws") <= F.col("n_windows")))
        .groupBy(id_col, "n_grams", "n_windows", "ws")
        .agg(F.min("key").alias("sel_key"))
    )
