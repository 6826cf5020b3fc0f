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
