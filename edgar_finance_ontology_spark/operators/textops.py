"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All column-native (no UDFs) and built from engine-portable primitives
(regex counts, md5, exact integer arithmetic) so the DuckDB oracle can
replay them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

# tiny per-language marker lexicons (n-gram heuristic lang-id)
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "a"],
    "de": ["der", "und", "die", "ist", "ein"],
    "fr": ["le", "et", "la", "est", "un"],
    "es": ["el", "y", "la", "es", "un"],
}


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(id, guess_lang, score): argmax over marker-token counts;
    deterministic tie-break by language code; 'und' when all zero."""
    text = F.col(text_col)
    toks = tokens_col(text)
    def _eq(marker):
        # NB: no default-arg closure here — a two-parameter lambda is
        # treated by PySpark's HOF binding as (element, index)
        return lambda t: t == marker

    score_cols = []
    for lang in sorted(LANG_MARKERS):
        c = None
        for m in LANG_MARKERS[lang]:
            cnt = F.size(F.filter(toks, _eq(m)))
            c = cnt if c is None else c + cnt
        score_cols.append((lang, c))
    out = df.select(
        F.col(id_col).alias("id"),
        *[c.alias(f"s_{lang}") for lang, c in score_cols],
    )
    best = None
    for lang, _ in score_cols:  # sorted order = tie-break
        cond = None
        for other, _ in score_cols:
            if other == lang:
                continue
            ge = (
                F.col(f"s_{lang}") > F.col(f"s_{other}")
                if other < lang
                else F.col(f"s_{lang}") >= F.col(f"s_{other}")
            )
            cond = ge if cond is None else (cond & ge)
        pick = cond & (F.col(f"s_{lang}") > 0)
        best = F.when(pick, lang) if best is None else best.when(pick, lang)
    best = best.otherwise("und")
    score = None
    for lang, _ in score_cols:
        score = (
            F.col(f"s_{lang}") if score is None
            else F.greatest(score, F.col(f"s_{lang}"))
        )
    return out.select(
        "id", best.alias("guess_lang"), score.cast("int").alias("score")
    )


def quality_scores(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """length / punctuation ratio / stopword ratio / mean word length
    + a composite quality score in [0,1]."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop = F.size(F.filter(
        toks, lambda t: t.isin("the", "a", "of", "and", "is", "to", "in")
    ))
    mean_word_len = F.when(
        n_tokens > 0,
        (F.length(F.regexp_replace(text, r"\s+", "")).cast("double")
         / n_tokens),
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tokens > 0, stop.cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    # simple monotone quality rubric: long enough, low punctuation,
    # some stopwords, sane word lengths
    q = (
        F.when(n_chars >= 200, 0.25).when(n_chars >= 50, 0.15).otherwise(0.0)
        + F.when(punct_ratio <= 0.1, 0.25).otherwise(0.0)
        + F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.6), 0.25).otherwise(0.0)
        + F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 0.25)
        .otherwise(0.0)
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("int").alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(q, 2).alias("quality"),
    )


def token_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """whitespace tokens + BPE-ish subword count (runs of letters,
    digits, or single punctuation — a cheap proxy for BPE pieces)."""
    text = F.col(text_col)
    ws = F.size(tokens_col(text))
    bpe = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0))
    return df.select(
        F.col(id_col).alias("id"),
        ws.cast("int").alias("ws_tokens"),
        bpe.cast("int").alias("bpe_tokens"),
    )


def fingerprints(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: the minimum md5 over all
    character k-grams (rolling window). Portable and deterministic."""
    text = F.col(text_col)
    n = F.length(text)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    grams = F.transform(idx, lambda i: F.md5(text.substr(i, F.lit(k))))
    return df.select(
        F.col(id_col).alias("id"),
        F.array_min(grams).alias("fingerprint"),
    )
