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


# required-stopword set for the Gopher rule (Rae et al. 2021, App. A)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_words: int = 50, max_words: int = 100_000) -> DataFrame:
    """Per-rule Gopher quality flags (Rae et al. 2021, Appendix A).

    Rules, each a 0/1 column (1 = the document passes the rule):
      r_word_count     min_words <= |words| <= max_words
      r_mean_word_len  3 <= mean word length <= 10
      r_symbol_ratio   (#'#' + #'...') / |words| <= 0.1
      r_bullet_lines   <= 90% of lines start with a bullet (- * •)
      r_ellipsis_lines <= 30% of lines end with ... or …
      r_alpha_words    >= 80% of words contain an alphabetic char
      r_stopwords      >= 2 of the 8 required stopwords occur as words
    plus `gopher_pass` = AND of all seven. Every threshold compares
    cross-multiplied INTEGERS (e.g. 5*n_alpha >= 4*n_words), never a
    float ratio, so the DuckDB twin replays bit-for-bit and no engine's
    rounding can flip a gate. Reference analog: the validator ladder
    gating observations (select_xbrl_tags.py:740-820) is the same
    per-row multi-rule keep/drop shape over facts instead of web text.

    Scale: pure per-row map (split/filter/aggregate HOFs, no UDF, no
    shuffle) — the filter runs inside whole-stage codegen next to the
    scan at any corpus size.
    """
    text = F.col(text_col)
    # one definition of "word" across the quality family: tokens_col
    # (the contract the token counters and DuckDB twins are tuned to),
    # case preserved here because the rules inspect casing themselves.
    # words/lines are STAGED as real columns: every flag below that
    # references them is a separate expression occurrence, and without
    # the projection the filter+split re-ran per occurrence (10+ times
    # per row) — still a zero-Exchange pure map, just single-pass.
    staged = df.withColumn(
        "_words",
        F.filter(tokens_col(text, lowercase=False), lambda w: w != ""),
    ).withColumn("_lines", F.split(text, "\n"))
    df = staged
    words = F.col("_words")
    lower_words = F.transform(words, F.lower)
    lines = F.col("_lines")
    n_words = F.size(words)
    n_lines = F.size(lines)
    sum_word_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    # replace-count of NON-OVERLAPPING '...' runs (greedy left-to-right
    # in both engines)
    n_ell = (
        F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))
    ) / 3
    n_sym = (n_hash + n_ell).cast("long")
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_bullet = F.size(F.filter(
        lines,
        lambda l: F.startswith(F.ltrim(l), F.lit("-"))
        | F.startswith(F.ltrim(l), F.lit("*"))
        | F.startswith(F.ltrim(l), F.lit("•")),
    ))
    n_ell_lines = F.size(F.filter(
        lines,
        lambda l: F.endswith(F.rtrim(l), F.lit("..."))
        | F.endswith(F.rtrim(l), F.lit("…")),
    ))
    n_stop = F.size(F.filter(
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        lambda s: F.array_contains(lower_words, s),
    ))

    def flag(cond):
        return F.when(cond, 1).otherwise(0)

    r_wc = flag((n_words >= min_words) & (n_words <= max_words))
    r_mwl = flag((sum_word_len >= 3 * n_words)
                 & (sum_word_len <= 10 * n_words))
    r_sym = flag(10 * n_sym <= n_words)
    r_bul = flag(10 * n_bullet <= 9 * n_lines)
    r_el = flag(10 * n_ell_lines <= 3 * n_lines)
    r_al = flag(5 * n_alpha >= 4 * n_words)
    r_st = flag(n_stop >= 2)
    return df.select(
        F.col(id_col).alias("id"),
        n_words.cast("long").alias("n_words"),
        n_lines.cast("long").alias("n_lines"),
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_sym.alias("r_symbol_ratio"),
        r_bul.alias("r_bullet_lines"),
        r_el.alias("r_ellipsis_lines"),
        r_al.alias("r_alpha_words"),
        r_st.alias("r_stopwords"),
        (r_wc * r_mwl * r_sym * r_bul * r_el * r_al * r_st)
        .alias("gopher_pass"),
    )


def c4_clean(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", min_words_per_line: int = 5,
             min_sentences: int = 3) -> DataFrame:
    """C4 cleaning (Raffel et al. 2020, §2.2), line and page rules:

      * keep only lines with >= min_words_per_line words that end in
        terminal punctuation (. ! ? ") and don't mention javascript;
      * flag pages containing "lorem ipsum" or a curly brace;
      * keep a page iff it survives the flags and its cleaned text
        still has >= min_sentences sentences (terminal-punct count).

    Returns (id, text_clean, n_lines_kept, n_sentences,
    has_lorem_ipsum, has_curly_brace, c4_keep) with 0/1 flags.
    Pure per-row map (split/filter HOFs + regex counts), replayed
    bit-for-bit by the DuckDB twin; the span-level dedup C4 pairs
    with this is `remove_boilerplate_lines` / `trim_dup_spans`.
    """
    text = F.col(text_col)
    lower = F.lower(text)

    def _is_kept(l):
        words = F.filter(tokens_col(l, lowercase=False),
                         lambda w: w != "")
        return (
            (F.size(words) >= min_words_per_line)
            & F.rtrim(l).rlike('[.!?"]$')
            & ~F.lower(l).contains("javascript")
        )

    kept = F.filter(F.split(text, "\n"), _is_kept)
    clean = F.concat_ws("\n", kept)
    n_sent = F.length(clean) - F.length(F.regexp_replace(clean, r"[.!?]", ""))
    has_lorem = F.when(lower.contains("lorem ipsum"), 1).otherwise(0)
    has_brace = F.when(text.contains("{"), 1).otherwise(0)
    keep = F.when(
        (has_lorem == 0) & (has_brace == 0)
        & (n_sent >= min_sentences), 1
    ).otherwise(0)
    return df.select(
        F.col(id_col).alias("id"),
        clean.alias("text_clean"),
        F.size(kept).alias("n_lines_kept"),
        n_sent.cast("int").alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_curly_brace"),
        keep.alias("c4_keep"),
    )


def unigram_surprisal_scores(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id",
                             vocab_size: int = 50_000) -> DataFrame:
    """Unigram-LM "perplexity filter" (the CCNet-style quality gate,
    honest in-container variant: a corpus-fit unigram model instead of
    a shipped KenLM): per document, the mean token surprisal under the
    corpus's own unigram distribution. Gibberish / rare-token soup
    scores HIGH (every token surprising), boilerplate scores LOW.

    Surprisal is quantized to INTEGER BITS — floor(log2(total/freq)) —
    so the score is engine-portable: JVM and libm transcendentals
    differ by 1 ulp (a known cross-engine hash killer), but
    floor(log2(x)) only flips where x is an exact power of two, and
    there log2 is exact in any IEEE implementation. OOV tokens cost
    floor(log2(total)) + 1 bits (one bit past the rarest possible
    in-vocab token).

    100-TB posture: vocabulary fit is one token-keyed aggregation with
    map-side combine, capped at `vocab_size` rows (deterministic
    count-desc/token-asc top-K, TakeOrdered — never a full sort), then
    BROADCAST to the scoring join; scoring shuffles token rows only
    for the per-doc aggregation, which partial-aggregates to ~one row
    per (partition, doc) before the exchange."""
    from .dedup import tokens_col

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    ).where(F.col("token") != "")
    freqs = toks.groupBy("token").agg(F.count("*").alias("freq"))
    total_row = freqs.agg(
        F.sum("freq").alias("total"), F.count("*").alias("n_distinct")
    ).first()
    total = int(total_row["total"] or 0)
    if total == 0:
        id_type = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"id {id_type}, n_tokens int, oov_tokens int, "
                f"sum_surprisal_bits long, mean_surprisal_bits double"
        )
    vocab = freqs.orderBy(
        F.col("freq").desc(), F.col("token").asc()
    ).limit(vocab_size)
    oov_bits = int(total).bit_length()  # floor(log2(total)) + 1
    scored = toks.join(F.broadcast(vocab), "token", "left").select(
        "id",
        F.coalesce(
            F.floor(F.log2(F.lit(float(total)) / F.col("freq"))),
            F.lit(oov_bits),
        ).cast("long").alias("bits"),
    )
    return scored.groupBy("id").agg(
        F.count("*").cast("int").alias("n_tokens"),
        F.sum(F.when(F.col("bits") == oov_bits, 1).otherwise(0))
        .cast("int").alias("oov_tokens"),
        F.sum("bits").alias("sum_surprisal_bits"),
        F.round(F.sum("bits") / F.count("*"), 6)
        .alias("mean_surprisal_bits"),
    )


def bigram_lm_scores(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     vocab_size: int = 50_000,
                     bigram_size: int = 200_000) -> DataFrame:
    """Interpolated bigram-LM perplexity scores (the CCNet-style
    quality gate one model order up from unigram_surprisal_scores):
    per document, mean token surprisal under an equal-weight
    interpolation of the corpus's own bigram and unigram MLEs,

        p(w_i | w_{i-1}) = (c(w_{i-1} w_i)/c(w_{i-1}) + c(w_i)/T) / 2

    with integer-bit quantization, floor(-log2 p) — the same
    engine-portability doctrine as the unigram filter (IEEE division
    and addition are exactly rounded, so p is bit-identical across
    engines; only log2's final ulp differs, and floor flips only at
    exact powers of two where log2 is exact everywhere). Token costs:

    * OOV w_i (not in the capped unigram vocab): `oov_bits`
      (floor(log2 T) + 1), as in the unigram filter.
    * first token of a document, or OOV w_{i-1}: pure unigram cost
      floor(log2(T / c(w_i))) — no halving, so a doc of in-vocab
      tokens with NO modeled bigrams scores exactly one bit above its
      unigram surprisal (p halves), never below.
    * unseen bigram over in-vocab tokens: c12 = 0, p = c(w_i)/2T.

    Fluent prose rides frequent bigrams and scores LOW; shuffled-word
    soup keeps its unigram mass but loses every bigram hit and pays
    ~1 extra bit per token — exactly the signal a perplexity gate adds
    over a unigram one.

    100-TB posture: both models are capped, deterministic top-K
    aggregations (count desc, token asc — TakeOrdered, never a full
    sort) and BROADCAST to the scoring joins; the only wide exchange
    over the corpus is the per-doc aggregation, which partial-
    aggregates map-side. Pairs come from array slicing of the token
    array (no positional self-join). Model sizes are the knobs: at a
    10^12-token corpus, raise bigram_size or swap the broadcast for a
    shuffle join on the pair key — semantics unchanged."""
    from .dedup import tokens_col

    base = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            tokens_col(F.col(text_col)), lambda x: x != ""
        ).alias("toks"),
    ).where(F.size("toks") > 0)

    toks = base.select("id", F.explode("toks").alias("token"))
    freqs = toks.groupBy("token").agg(F.count("*").alias("freq"))
    total_row = freqs.agg(F.sum("freq").alias("total")).first()
    total = int(total_row["total"] or 0)
    if total == 0:
        id_type = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"id {id_type}, n_tokens int, oov_tokens int, "
                f"bigram_hits int, sum_bits long, mean_bits double"
        )
    oov_bits = int(total).bit_length()
    vocab = freqs.orderBy(
        F.col("freq").desc(), F.col("token").asc()
    ).limit(vocab_size)

    n = F.size("toks")
    pairs = base.where(n > 1).select(
        "id",
        F.explode(F.arrays_zip(
            F.slice("toks", 1, n - 1).alias("prev"),
            F.slice("toks", 2, n - 1).alias("cur"),
        )).alias("p"),
    ).select("id", F.col("p.prev").alias("prev"),
             F.col("p.cur").alias("cur"))
    bigrams = pairs.groupBy("prev", "cur") \
        .agg(F.count("*").alias("c12")) \
        .orderBy(F.col("c12").desc(), F.col("prev").asc(),
                 F.col("cur").asc()) \
        .limit(bigram_size)

    firsts = base.select(
        "id", F.lit(None).cast("string").alias("prev"),
        F.element_at("toks", 1).alias("cur"),
    )
    events = firsts.unionByName(pairs)

    vc = vocab.select(F.col("token").alias("cur"),
                      F.col("freq").alias("c_cur"))
    vp = vocab.select(F.col("token").alias("prev"),
                      F.col("freq").alias("c_prev"))
    j = (
        events
        .join(F.broadcast(vc), "cur", "left")
        .join(F.broadcast(vp), "prev", "left")
        .join(F.broadcast(bigrams), ["prev", "cur"], "left")
    )
    r2 = F.col("c_cur").cast("double") / F.lit(float(total))
    r1 = (F.coalesce(F.col("c12"), F.lit(0)).cast("double")
          / F.col("c_prev").cast("double"))
    p = F.when(
        F.col("prev").isNull() | F.col("c_prev").isNull(), r2
    ).otherwise((r1 + r2) / F.lit(2.0))
    bits = F.when(
        F.col("c_cur").isNull(), F.lit(oov_bits).cast("long")
    ).otherwise(F.floor(-F.log2(p)).cast("long"))
    scored = j.select(
        "id", bits.alias("bits"),
        F.when(F.col("c_cur").isNull(), 1).otherwise(0).alias("is_oov"),
        F.when(F.col("c12").isNotNull(), 1).otherwise(0).alias("is_hit"),
    )
    return scored.groupBy("id").agg(
        F.count("*").cast("int").alias("n_tokens"),
        F.sum("is_oov").cast("int").alias("oov_tokens"),
        F.sum("is_hit").cast("int").alias("bigram_hits"),
        F.sum("bits").alias("sum_bits"),
        F.round(F.sum("bits") / F.count("*"), 6).alias("mean_bits"),
    )


def perplexity_buckets(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       lo: float = 0.0, hi: float = 32.0,
                       n_buckets: int = 512,
                       vocab_size: int = 50_000,
                       bigram_size: int = 200_000) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document with the
    interpolated bigram LM (bigram_lm_scores), estimate the corpus's
    1/3- and 2/3-quantiles of mean surprisal with the fixed-width
    histogram sketch (histogram_quantiles — O(B) state, explicit
    one-bucket error), and assign each doc to

        head   — mean_bits <= p33 (most fluent third)
        middle — p33 < mean_bits <= p67
        tail   — the rest (least fluent / most surprising)

    the split CCNet uses to stratify Common-Crawl quality. Thresholds
    are two driver-side scalars read from the sketch's single rollup
    row; the per-doc pass is one broadcast-free select over the score
    frame. The cut points inherit the sketch's one-bucket-width error
    — (hi-lo)/n_buckets bits, 1/16 bit at the defaults — which is the
    right trade at 10^12 docs where an exact global quantile means a
    corpus-wide range sort."""
    from .sketches import histogram_quantiles

    scores = bigram_lm_scores(
        df, text_col, id_col, vocab_size, bigram_size
    )
    th = histogram_quantiles(
        scores, "mean_bits", None, lo, hi, n_buckets,
        quantiles=(1 / 3, 2 / 3),
    ).first()
    if th is None:  # empty corpus: typed empty frame, no thresholds
        return scores.limit(0).select("id", "mean_bits") \
            .withColumn("ppx_bucket", F.lit(""))
    p33, p67 = float(th["p33"]), float(th["p67"])
    return scores.select(
        "id",
        "mean_bits",
        F.when(F.col("mean_bits") <= p33, "head")
        .when(F.col("mean_bits") <= p67, "middle")
        .otherwise("tail").alias("ppx_bucket"),
    )


def token_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 tokenizer: str = "proxy",
                 merges_path: str | None = None) -> DataFrame:
    """whitespace tokens + subword token count.

    tokenizer="proxy" (default, column-native, oracle-replayable):
    bpe_tokens = pretoken count (runs of letters, digits, or single
    punctuation) — exactly the piece count a BPE would emit with an
    empty merge table.
    tokenizer="bpe": REAL byte-level BPE piece count under the
    committed merge table (functions/bpe.py, models/bpe_merges_512.txt
    by default or any merges file via `merges_path`) — Arrow-batched
    mapInPandas, merge table loaded once per executor, per-word memo.
    Same output schema either way, so pack_token_shards and budget
    reports consume both interchangeably."""
    text = F.col(text_col)
    ws = F.size(tokens_col(text))
    if tokenizer == "proxy":
        bpe = F.size(F.regexp_extract_all(
            text, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0))
        return df.select(
            F.col(id_col).alias("id"),
            ws.cast("int").alias("ws_tokens"),
            bpe.cast("int").alias("bpe_tokens"),
        )
    if tokenizer != "bpe":
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    from ..functions.bpe import DEFAULT_MERGES
    path = merges_path or DEFAULT_MERGES

    def run(batches):
        import pandas as pd

        from ..functions.bpe import count_tokens
        for pdf in batches:
            yield pd.DataFrame({
                "id": pdf["id"],
                "ws_tokens": pdf["ws_tokens"],
                "bpe_tokens": [count_tokens(t, path)
                               for t in pdf["_text"]],
            })

    slim = df.select(
        F.col(id_col).alias("id"),
        ws.cast("int").alias("ws_tokens"),
        F.col(text_col).alias("_text"),
    )
    id_type = slim.schema["id"].dataType.simpleString()
    return slim.mapInPandas(
        run, f"id {id_type}, ws_tokens int, bpe_tokens int"
    )


def _char_gram_md5(text: str | None, k: int) -> list:
    """Python twin of the HOF char-k-gram md5 sequence: md5 hex of
    text[i:i+k] for i in 0..max(n-k, 0) — Python str indexing counts
    code points, matching Spark substr on UTF8String; a doc shorter
    than k contributes the md5 of its whole text (substr clips), and
    NULL text yields [None] (md5(NULL) -> NULL inside the array)."""
    import hashlib

    if text is None:
        return [None]
    n = len(text)
    return [
        hashlib.md5(text[i:i + k].encode("utf-8")).hexdigest()
        for i in range(max(n - k, 0) + 1)
    ]


def fingerprints(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 8,
                 impl: str = "arrow") -> DataFrame:
    """Winnowing-style document fingerprint: the minimum md5 over all
    character k-grams (rolling window). Portable and deterministic.
    impl='arrow' computes the gram hashes in an Arrow-batched map
    (bit-identical — hex md5 min under ASCII ordering matches Spark's
    binary string array_min; equality property-tested); impl='hof'
    keeps the pure column form."""
    if impl == "arrow":
        from ..functions.partitions import spread_small_input

        id_type = df.schema[id_col].dataType.simpleString()
        slim = spread_small_input(
            df.select(F.col(id_col).alias("id"),
                      F.col(text_col).alias("_text"))
        )

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                ids, fps = [], []
                for i, t in zip(pdf["id"], pdf["_text"]):
                    grams = [g for g in _char_gram_md5(t, k)
                             if g is not None]
                    ids.append(i)
                    fps.append(min(grams) if grams else None)
                yield pd.DataFrame({"id": ids, "fingerprint": fps})

        return slim.mapInPandas(gen, f"id {id_type}, fingerprint string")
    text = F.col(text_col)
    n = F.length(text)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    grams = F.transform(idx, lambda i: F.md5(text.substr(i, F.lit(k))))
    return df.select(
        F.col(id_col).alias("id"),
        F.array_min(grams).alias("fingerprint"),
    )


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 8,
                        w: int = 4, impl: str = "arrow") -> DataFrame:
    """Winnowing (Schleimer et al. 2003): (id, fp) — the DISTINCT
    minima of every w-window over the character-k-gram md5 sequence.
    Unlike the single global min in `fingerprints`, this carries the
    paper's guarantee: two documents sharing any substring of length
    >= t = w+k-1 share at least one fingerprint, while storing only
    ~2/(w+1) of the gram hashes.

    Scale: pure per-row map + explode (no shuffle); the downstream
    shared-fp join is the same df-capped inverted-index shape as the
    n-gram Jaccard family. Deterministic md5 selection, so the DuckDB
    twin replays the exact fingerprint set.
    """
    if impl == "arrow":
        from ..functions.partitions import spread_small_input

        id_type = df.schema[id_col].dataType.simpleString()
        slim = spread_small_input(
            df.select(F.col(id_col).alias("id"),
                      F.col(text_col).alias("_text"))
        )

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                ids, fps = [], []
                for i, t in zip(pdf["id"], pdf["_text"]):
                    grams = _char_gram_md5(t, k)
                    g = len(grams)
                    seen, ordered = set(), []
                    for j in range(max(g - w, 0) + 1):
                        win = [x for x in grams[j:j + w]
                               if x is not None]
                        # array_min skips NULLs; all-NULL window -> NULL
                        m = min(win) if win else None
                        if m not in seen:
                            seen.add(m)
                            ordered.append(m)
                    ids.extend([i] * len(ordered))
                    fps.extend(ordered)
                yield pd.DataFrame({"id": ids, "fp": fps})

        return slim.mapInPandas(gen, f"id {id_type}, fp string")
    text = F.col(text_col)
    n = F.length(text)
    gidx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    # materialize the gram array as a REAL column before the window
    # transform: interpreted HOF lambdas re-evaluate their body per
    # element with no common-subexpression elimination, so an inline
    # `grams` expression would recompute the ENTIRE md5 array for
    # every window — quadratic in document length (measured: sf0.1
    # went from minutes to seconds)
    staged = df.withColumn(
        "_grams",
        F.transform(gidx, lambda i: F.md5(text.substr(i, F.lit(k)))),
    )
    grams = F.col("_grams")
    g = F.size(grams)
    widx = F.sequence(F.lit(1), F.greatest(g - w + 1, F.lit(1)))
    fps = F.array_distinct(
        F.transform(widx, lambda j: F.array_min(F.slice(grams, j, w)))
    )
    return staged.select(F.col(id_col).alias("id"),
                         F.explode(fps).alias("fp"))


def winnow_shared_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 8, w: int = 4,
                        max_df: int = 8,
                        min_shared: int = 2) -> DataFrame:
    """(id_a, id_b, shared_fps) for document pairs sharing >=
    min_shared winnowing fingerprints. Fingerprints seen in more than
    max_df documents are dropped before the self-join (boilerplate
    fingerprints would otherwise fan out quadratically — the same
    df-cap doctrine as ngram_jaccard_pairs)."""
    # fp feeds the df-count agg AND the capped join side — materialize
    # once (Spark does not dedupe common subplans)
    fp = winnow_fingerprints(df, text_col, id_col, k, w) \
        .localCheckpoint(eager=True)
    dfc = fp.groupBy("fp").agg(F.count("*").alias("dfc"))
    good = fp.join(dfc.where(F.col("dfc") <= max_df), "fp")
    a = good.select("fp", F.col("id").alias("id_a"))
    b = good.select("fp", F.col("id").alias("id_b"))
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )


def repetition_scores(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", ngram: int = 5) -> DataFrame:
    """Gopher/RefinedWeb-style repetition metrics per document:

      dup_ngram_frac — 1 - distinct/total word n-grams (repeated
                       boilerplate inflates it);
      top_word_frac  — frequency share of the most common token.

    Column-native (explode + two-phase aggregation — partial combines
    map-side, scale-safe); the DuckDB oracle replays it exactly."""
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(tokens_col(F.col(text_col))).alias("tok")) \
             .where(F.col("tok") != "")
    word_counts = toks.groupBy("id", "tok").agg(F.count("*").alias("c"))
    words = word_counts.groupBy("id").agg(
        F.sum("c").alias("n_words"), F.max("c").alias("top_c")
    )
    t = F.col(text_col)
    # staged token column: inline arrays inside interpreted HOF
    # lambdas re-evaluate per element (see winnow_fingerprints)
    staged = df.withColumn("_toks", tokens_col(t))
    arr = F.col("_toks")
    idx = F.sequence(F.lit(0), F.greatest(F.size(arr) - ngram, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(arr, i + 1, ngram)))
    g = (
        staged.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .where(F.size(F.split(F.col("gram"), " ")) == ngram)
        .groupBy("id")
        .agg(F.count("*").alias("n_grams"),
             F.countDistinct("gram").alias("n_distinct"))
    )
    return (
        words.join(g, "id", "left")
        .select(
            "id", "n_words",
            F.round(F.col("top_c") / F.col("n_words"), 6).alias("top_word_frac"),
            F.when(
                F.col("n_grams").isNotNull() & (F.col("n_grams") > 0),
                F.round(1 - F.col("n_distinct") / F.col("n_grams"), 6),
            ).alias("dup_ngram_frac"),
        )
    )


def cross_source_overlap(df: DataFrame, test_source: str,
                         text_col: str = "text", id_col: str = "doc_id",
                         source_col: str = "source", ngram: int = 8,
                         max_df: int | None = 64) -> DataFrame:
    """Benchmark-decontamination shape: for each document of
    `test_source` (the held-out set), how many documents from OTHER
    sources (the training pool) share at least one word n-gram, and the
    largest shared-gram count with any single one.

    Candidate generation goes through the inverted gram index with a
    document-frequency cap (stop-grams never emit |df|^2 pairs) — the
    same bounded-join discipline as the near-dup operators."""
    from .dedup import word_shingles

    sh = word_shingles(df, text_col, ngram, id_col).withColumnRenamed(
        "shingle", "gram"
    )
    src = df.select(F.col(id_col).alias("id"),
                    F.col(source_col).alias("source"))
    sh = sh.join(src, "id")
    if max_df is not None:
        rare = sh.groupBy("gram").agg(F.count("*").alias("_df")) \
                 .where(F.col("_df") <= max_df)
        sh = sh.join(rare.select("gram"), "gram", "left_semi")
    test = sh.where(F.col("source") == test_source) \
             .select(F.col("id").alias("test_id"), "gram")
    train = sh.where(F.col("source") != test_source) \
              .select(F.col("id").alias("train_id"), "gram")
    hits = (
        test.join(train, "gram")
        .groupBy("test_id", "train_id")
        .agg(F.count("*").alias("shared"))
    )
    return (
        hits.groupBy("test_id")
        .agg(
            F.count("*").alias("n_train_matches"),
            F.max("shared").alias("max_shared_grams"),
        )
    )


# PII patterns, portable across Java regex (Spark) and RE2 (DuckDB):
# no backrefs, no lookaround.
#
# The phone pattern deliberately does NOT match bare space-separated
# digit runs: a filings corpus is full of numeric tables and year lists
# ("revenue 1000000 2000000", "years 2020 2021 2022") that a generic
# digit-run pattern would destroy wholesale. A match must carry an
# explicit phone marker: a leading '+' country code, a parenthesized
# area code, or hyphenated 3-3/4-4 grouping.
#
# The same precision doctrine shapes the newer patterns:
#  * credit_card scrubs only HYPHEN-grouped 4-4-4-4 / Amex 4-6-5 runs
#    (space-grouped 4-4-4-4 is exactly a year list, "2020 2021 2022
#    2023"); bare 13-19 digit runs are handled by the non-destructive
#    Luhn DETECTOR (pii_card_stats) rather than the scrubber.
#  * iban scrubs the COMPACT electronic form only ([A-Z]{2} check
#    digits + 11-30 alnum, total 15-34 — \b anchoring means an
#    interior slice of a longer alnum run can never match); the
#    paper-spaced form "GB29 NWBK ..." is skipped because
#    "FY24 2023 2024" has the same shape.
#  * credit_card runs BEFORE ssn/phone so the hyphenated card body is
#    consumed whole instead of leaking 3-3/4-4 fragments to <PHONE>.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("credit_card",
     r"\b\d{4}-\d{4}-\d{4}-\d{4}\b|\b\d{4}-\d{6}-\d{5}\b",
     "<CARD>"),
    ("iban", r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b", "<IBAN>"),
    ("ssn", r"\d{3}-\d{2}-\d{4}", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone",
     r"\+\d{1,3}[ \-]?\(?\d{2,4}\)?[ \-]?\d{3,4}[ \-]?\d{3,4}"
     r"|\(\d{2,4}\)[ \-]?\d{3,4}[ \-]?\d{4}"
     r"|\d{3}-\d{3,4}-\d{4}",
     "<PHONE>"),
    ("address",
     r"\b\d{1,5} [A-Z][a-z]+ (?:[A-Z][a-z]+ )?"
     r"(?:Street|Avenue|Boulevard|Lane|Drive|Court|Place|Road|Way"
     r"|St|Ave|Blvd|Ln|Dr|Ct|Rd)\b",
     "<ADDR>"),
]

# candidate card-number runs for the Luhn detector: 13-19 digits with
# optional single space/hyphen separators between them
CARD_CANDIDATE_RE = r"\b\d(?:[ -]?\d){12,18}\b"


def luhn_valid_col(card):
    """True iff the digit run in `card` (separators allowed) passes the
    Luhn checksum and is 13-19 digits long — column-native, no UDF.
    Spark `transform` indexes 0-based (the DuckDB twin's lambda is
    1-based)."""
    digits = F.filter(
        F.split(F.regexp_replace(card, r"[ -]", ""), ""),
        lambda c: c != F.lit(""),
    )
    rev = F.reverse(digits)
    vals = F.transform(
        rev,
        lambda c, i: F.when(
            i % 2 == 1,
            F.when(c.cast("int") * 2 > 9, c.cast("int") * 2 - 9)
            .otherwise(c.cast("int") * 2),
        ).otherwise(c.cast("int")),
    )
    total = F.aggregate(vals, F.lit(0), lambda acc, x: acc + x)
    return (
        (total % 10 == 0) & (F.size(digits) >= 13) & (F.size(digits) <= 19)
    )


def pii_card_stats(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Non-destructive card-number DETECTION: per document, how many
    13-19-digit candidate runs appear and how many pass the Luhn
    checksum. The scrubber only masks hyphen-grouped shapes (precision
    doctrine above); this detector is the audit surface for bare runs
    — a training-data pipeline routes docs with luhn_valid > 0 to
    quarantine/manual scrub instead of rewriting numeric tables
    wholesale."""
    cands = F.regexp_extract_all(F.col(text_col), F.lit(CARD_CANDIDATE_RE), 0)
    valid = F.filter(cands, lambda c: luhn_valid_col(c))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(cands).cast("int").alias("card_candidates"),
        F.size(valid).cast("int").alias("luhn_valid"),
    )


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Mask common PII shapes (emails, SSNs, IPv4s, phone-number runs)
    in `text_col`, appending `<col>_scrubbed` + `pii_removed_chars`.
    Pattern order matters (SSN before the generic digit-run)."""
    scrubbed = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.withColumn(f"{text_col}_scrubbed", scrubbed).withColumn(
        "pii_removed_chars",
        F.greatest(
            F.length(text_col) - F.length(f"{text_col}_scrubbed"), F.lit(0)
        ),
    )


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "source", id_col: str = "doc_id",
                      default_rate: float = 1.0) -> DataFrame:
    """Deterministic per-stratum down-sampling by hash thresholding:
    keep a row iff the fractional position of md5(id) in hash space is
    below its stratum's rate.

    This is how a training-data pipeline rebalances over-represented
    sources at 10^12 docs: unlike rand()-based sampleBy, the decision
    is a pure function of the row key, so re-runs, retries, and
    incremental appends sample the SAME documents (reproducible
    corpora, no resample churn on speculative re-execution) — and the
    DuckDB oracle can replay it exactly. Narrow, no shuffle."""
    frac = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
               16, 10).cast("double") / float(0xFFFFFFFF + 1)
    )
    rate = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    return df.where(frac < rate)


def remove_boilerplate_lines(df: DataFrame, min_df: int = 5,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             delimiter: str = "\n",
                             broadcast_cap_rows: int = 5_000_000
                             ) -> DataFrame:
    """C4/MassiveText-style LINE-LEVEL dedup: delete every line whose
    trimmed content appears in >= `min_df` distinct documents (cookie
    banners, nav bars, boilerplate headers live in thousands of pages;
    document-level dedup never sees them). Blank lines are never
    counted as boilerplate; line order is preserved on rebuild and
    docs whose every line is boilerplate come back with empty text,
    not dropped rows.

    Plan shape: posexplode -> one md5-keyed aggregation with map-side
    combine (count DISTINCT docs per line) -> the boilerplate set is
    filtered by min_df and joined back LEFT ANTI -> per-doc rebuild
    via collect_list of (pos, line) structs, array_sort, array_join.
    The rebuild groups by doc id — the same key the corpus is already
    bucketed by.

    The anti-join side is usually the head of the line-frequency
    distribution — tiny, and broadcast. But at 100 TB with min_df=5
    every 5-occurrence template line in the crawl qualifies and the
    set can plausibly reach GBs, so the set is persisted, COUNTED,
    and broadcast only under `broadcast_cap_rows` (same count-then-
    route pattern the dedup family uses for hot buckets); past the
    cap it falls back to a plain shuffled anti join — identical
    output, no driver/executor OOM. The count reuses the persisted
    aggregation, so routing costs one small action, not a second
    corpus pass."""
    lines = df.select(
        F.col(id_col).alias("id"),
        # \Q..\E quotes the delimiter — F.split takes a REGEX, and a
        # caller passing '.' or '|' must get literal splitting
        F.posexplode(F.split(F.col(text_col), f"\\Q{delimiter}\\E"))
        .alias("pos", "line"),
    )
    content = lines.where(F.trim(F.col("line")) != "")
    boiler = (
        content.groupBy(F.md5(F.trim(F.col("line"))).alias("h"))
        .agg(F.countDistinct("id").alias("n_docs"))
        .where(F.col("n_docs") >= min_df)
        .select("h")
    )
    # localCheckpoint (not persist): materializes the set ONCE — the
    # route decision's count and the anti join both read the
    # materialized blocks, and the ContextCleaner releases them when
    # the returned frame is garbage-collected (persist would pin
    # executor storage with no unpersist path reachable from here).
    # NOTE this makes the function EAGER: the line-frequency
    # aggregation runs at call time, not first action.
    boiler = boiler.localCheckpoint(eager=True)
    n_boiler = boiler.count()
    anti_side = (
        F.broadcast(boiler) if n_boiler <= broadcast_cap_rows else boiler
    )
    kept = lines.join(
        anti_side,
        F.md5(F.trim(F.col("line"))) == F.col("h"),
        "left_anti",
    )
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(
                        F.col("pos").alias("pos"),
                        F.col("line").alias("line"),
                    ))
                ),
                lambda s: s["line"],
            ),
            delimiter,
        ).alias("clean_text"),
        F.count("*").cast("int").alias("kept_lines"),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), f"\\Q{delimiter}\\E")).cast("int")
        .alias("total_lines"),
    )
    return base.join(rebuilt, "id", "left").select(
        "id",
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        "total_lines",
        F.coalesce(F.col("kept_lines"), F.lit(0)).alias("kept_lines"),
    )


def compression_ratios(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       level: int = 6) -> DataFrame:
    """zlib compression ratio per document — the classic cheap
    dual-purpose quality signal: near-1.0 ratios mean high-entropy
    gibberish (random tokens, encoded blobs), very LOW ratios mean
    templated/repeated boilerplate; natural prose sits in a mid band.

    Runs Arrow-batched (zlib is C-speed; the stdlib call per doc
    dominates at ~GB/s, and the stage is a pure map — no shuffle, no
    state). DETERMINISTIC for a fixed zlib version/level, but the
    byte-exact output is a library implementation detail, so the
    contract (and the tests) pin ORDERING properties — repeated <
    prose < random — not exact byte counts, and the op carries no SQL
    oracle by design (documented, like the other library-backed maps)."""
    slim = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_text")
    )
    id_type = slim.schema["id"].dataType.simpleString()

    def run(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            n_bytes, n_comp, ratio = [], [], []
            for t in pdf["_text"]:
                raw = (t or "").encode("utf-8")
                comp = zlib.compress(raw, level) if raw else b""
                n_bytes.append(len(raw))
                n_comp.append(len(comp))
                ratio.append(
                    round(len(comp) / len(raw), 6) if raw else None
                )
            yield pd.DataFrame({
                "id": pdf["id"], "n_bytes": n_bytes,
                "n_compressed": n_comp, "compression_ratio": ratio,
            })

    return slim.mapInPandas(
        run,
        f"id {id_type}, n_bytes int, n_compressed int, "
        f"compression_ratio double",
    )


def mix_to_token_budgets(df: DataFrame, token_budgets: dict[str, int],
                         text_col: str = "text",
                         strata_col: str = "source",
                         id_col: str = "doc_id",
                         default_rate: float = 0.0) -> DataFrame:
    """Deterministic corpus MIXING to per-source token budgets — the
    "30% code / 70% web" knob expressed as absolute token targets.

    One aggregation computes each source's total whitespace tokens
    (map-side combined, K result rows to the driver); keep-rate =
    min(1, budget/total) per source (sources without a budget get
    `default_rate`, 0.0 = drop); then the SAME hash-threshold rule as
    stratified_sample selects documents. The decision stays a pure
    function of the doc id, so retries/appends/re-runs keep the same
    documents, and the data-path plan is a narrow filter — the only
    shuffle is the K-row totals agg. Kept tokens CONCENTRATE around
    the budget (uniform doc sampling within a source); exact-budget
    cutting is pack_token_shards' job downstream."""
    from .dedup import tokens_col

    totals = {
        r["_src"]: r["_tok"]
        for r in df.groupBy(F.col(strata_col).alias("_src")).agg(
            F.sum(F.size(tokens_col(F.col(text_col)))).alias("_tok")
        ).collect()
    }
    rates = {}
    for src, total in totals.items():
        budget = token_budgets.get(src)
        if budget is not None and total:
            rates[src] = min(1.0, budget / total)
        else:
            rates[src] = float(default_rate)
    return stratified_sample(df, rates, strata_col, id_col,
                             default_rate=default_rate)


def quality_funnel(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", lang_col: str = "lang",
                   allowed_langs: tuple = ("en",),
                   min_chars: int = 50, max_chars: int = 1_000_000,
                   max_dup_line_frac: float = 0.5) -> DataFrame:
    """The classic corpus-cleaning funnel as ONE aggregation: for each
    filter stage, how many documents survive all stages up to it
    (ingested -> lang gate -> length gate -> dedup-line gate). The
    per-stage counts are what a pipeline operator watches at 100 TB —
    a stage that suddenly eats 40% of the corpus is a bug, not a
    filter. Stage predicates are cumulative (funnel semantics), and
    everything is column-native so the oracle replays it."""
    text = F.col(text_col)
    n_chars = F.length(text)
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    n_distinct_lines = F.size(F.array_distinct(lines))
    dup_line_frac = F.when(
        n_lines > 0,
        (n_lines - n_distinct_lines).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    s1 = F.col(lang_col).isin(*allowed_langs)
    s2 = s1 & (n_chars >= min_chars) & (n_chars <= max_chars)
    s3 = s2 & (dup_line_frac <= max_dup_line_frac)
    agg = df.agg(
        F.count("*").alias("ingested"),
        F.sum(s1.cast("long")).alias("after_lang_gate"),
        F.sum(s2.cast("long")).alias("after_length_gate"),
        F.sum(s3.cast("long")).alias("after_dup_line_gate"),
    )
    stages = ["ingested", "after_lang_gate", "after_length_gate",
              "after_dup_line_gate"]
    arr = F.array(*[
        F.struct(F.lit(i).alias("stage_idx"), F.lit(s).alias("stage"),
                 F.col(s).alias("n_docs"))
        for i, s in enumerate(stages)
    ])
    return agg.select(F.explode(arr).alias("s")).select(
        "s.stage_idx", "s.stage", "s.n_docs"
    )


def pack_token_shards(df: DataFrame, shard_tokens: int,
                      text_col: str = "text", id_col: str = "doc_id",
                      order_col: str | None = None,
                      counter: str = "ws",
                      merges_path: str | None = None) -> DataFrame:
    """Assign each document to a training shard so shards hold ~
    `shard_tokens` tokens: shard_id = floor(running token total /
    shard_tokens) over a deterministic document order.

    counter="ws" (default) budgets whitespace tokens (column-native);
    counter="bpe" budgets REAL byte-level BPE pieces under the
    committed merge table (functions/bpe.py) so shard sizes match what
    a trainer actually consumes — same distributed prefix-sum shape,
    the counting just runs Arrow-batched before the range partition.

    The global running sum is computed DISTRIBUTED, never as a bare
    `Window.orderBy(...)` — that plan is `Exchange SinglePartition`
    (all 10^12 docs through one task). Instead: range-partition by the
    order key, per-partition local cumulative sums, and a broadcast of
    the per-partition prefix totals (P tiny rows to the driver). The
    result is identical for ANY partition boundaries, so shard ids are
    deterministic and the packing is resumable; off-by-one-document
    shard boundaries are the accepted greedy trade."""
    cum = F.col("cum_tokens")
    return _token_prefix(
        df, text_col, id_col, order_col, counter, merges_path
    ).select(
        "id",
        "n_tokens",
        "cum_tokens",
        F.floor((cum - 1).cast("double") / shard_tokens)
        .cast("long").alias("shard_id"),
    )


def _token_prefix(df: DataFrame, text_col: str, id_col: str,
                  order_col: str | None, counter: str,
                  merges_path: str | None) -> DataFrame:
    """(id, n_tokens, cum_tokens): each document's token count and the
    global running total over the deterministic order — the shared
    distributed-prefix-sum core of pack_token_shards and
    pack_sequences (see pack_token_shards' docstring for the plan
    shape and why it is never a SinglePartition window)."""
    from pyspark.sql import Window

    from .dedup import tokens_col as _toks

    order_name = order_col or id_col
    if counter == "bpe":
        from ..functions.bpe import DEFAULT_MERGES
        path = merges_path or DEFAULT_MERGES

        def count_run(batches):
            import pandas as pd

            from ..functions.bpe import count_tokens
            for pdf in batches:
                yield pd.DataFrame({
                    "id": pdf["id"], "_ord": pdf["_ord"],
                    "n_tokens": [count_tokens(t, path)
                                 for t in pdf["_text"]],
                })

        from ..functions.partitions import spread_small_input

        slim = spread_small_input(df.select(
            F.col(id_col).alias("id"),
            F.col(order_name).alias("_ord"),
            F.col(text_col).alias("_text"),
        ))
        id_t = slim.schema["id"].dataType.simpleString()
        ord_t = slim.schema["_ord"].dataType.simpleString()
        counted = slim.mapInPandas(
            count_run, f"id {id_t}, _ord {ord_t}, n_tokens long"
        )
    elif counter == "ws":
        n_tok = F.size(_toks(F.col(text_col)))
        counted = df.select(
            F.col(id_col).alias("id"),
            F.col(order_name).alias("_ord"),
            n_tok.cast("long").alias("n_tokens"),
        )
    else:
        raise ValueError(f"unknown counter {counter!r}")
    d = (
        counted
        .repartitionByRange(F.col("_ord"))
        .sortWithinPartitions("_ord")
        .withColumn("_pid", F.spark_partition_id())
    )
    d = d.localCheckpoint(eager=False)
    # per-partition prefix offsets: P rows to the driver, broadcast back
    totals = d.groupBy("_pid").agg(F.sum("n_tokens").alias("_t")).collect()
    running, offsets = 0, []
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], running))
        running += r["_t"]
    spark = df.sparkSession
    off = F.broadcast(spark.createDataFrame(
        offsets or [(0, 0)], "_pid int, _off long"
    ))
    w = Window.partitionBy("_pid").orderBy("_ord").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.sum("n_tokens").over(w) + F.col("_off")
    return d.join(off, "_pid").select(
        "id",
        "n_tokens",
        cum.alias("cum_tokens"),
    )


def pack_sequences(df: DataFrame, seq_len: int,
                   text_col: str = "text", id_col: str = "doc_id",
                   order_col: str | None = None,
                   counter: str = "ws",
                   merges_path: str | None = None) -> DataFrame:
    """GPT-style sequence packing: concatenate the corpus's token
    stream in a deterministic document order and cut it into
    fixed-length training sequences of `seq_len` tokens, documents
    spanning cut points split across neighbouring sequences. Returns
    one row per (sequence, document-slice):

        seq_id   — 0-based sequence index
        id       — the document
        doc_from / doc_to — the slice of the doc's tokens in this
                   sequence (doc-relative, half-open)
        seq_off  — where the slice starts inside the sequence

    Every sequence is exactly full (sum of its slice widths ==
    seq_len) except the last; slices partition each document's token
    range with no gaps or overlaps — both asserted in tests. Empty
    documents (0 tokens) contribute no slices.

    Plan: the shared distributed prefix sum (_token_prefix — range
    partition + P-row broadcast offsets, never a SinglePartition
    window) gives each doc a global token interval [start, cum); the
    doc then EXPLODES into the floor(start/L)..floor((cum-1)/L)
    sequences it overlaps — fan-out 1 + n_tokens/L per doc, linear in
    corpus tokens. Boundary arithmetic is integer DIV on longs (no
    double rounding at 10^12-token offsets)."""
    pre = _token_prefix(
        df, text_col, id_col, order_col, counter, merges_path
    )
    L = int(seq_len)
    if L <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    d = (
        pre.where(F.col("n_tokens") > 0)
        .withColumn("_start", F.col("cum_tokens") - F.col("n_tokens"))
        .withColumn("_first", F.expr(f"_start DIV {L}"))
        .withColumn("_last", F.expr(f"(cum_tokens - 1) DIV {L}"))
    )
    ex = d.select(
        "id", "_start", "cum_tokens",
        F.explode(F.sequence("_first", "_last")).alias("seq_id"),
    )
    lo = F.greatest(F.col("_start"), F.col("seq_id") * L)
    hi = F.least(F.col("cum_tokens"), (F.col("seq_id") + 1) * L)
    return ex.select(
        "seq_id",
        "id",
        (lo - F.col("_start")).alias("doc_from"),
        (hi - F.col("_start")).alias("doc_to"),
        (lo - F.col("seq_id") * L).alias("seq_off"),
    )


def mix_by_temperature(df: DataFrame, target_tokens: int,
                       alpha: float = 0.5,
                       text_col: str = "text",
                       strata_col: str = "source",
                       id_col: str = "doc_id") -> DataFrame:
    """Temperature-based corpus mixing (the multilingual/source
    balancing rule: sampling share p_i ∝ n_i^alpha): per-source token
    budgets are DERIVED from the corpus itself — alpha=1 reproduces
    natural proportions, alpha→0 approaches uniform across sources —
    then documents are kept by the same deterministic hash rule as
    stratified_sample.

    Portability contract (what makes the DuckDB twin replay the exact
    rates): the per-source weight n^alpha uses sqrt for the default
    alpha=0.5 — sqrt is CORRECTLY ROUNDED in IEEE 754, unlike pow
    (libm pow differs across implementations by 1 ulp; custom alphas
    work but the oracle pins 0.5) — and the normalizer Z folds the
    weights SEQUENTIALLY IN ASCENDING ORDER, matching DuckDB's
    list_aggregate(list_sort(...), 'sum') fold, so Z is bit-identical
    regardless of source enumeration order.

    100-TB posture: identical to mix_to_token_budgets — one map-side-
    combined totals aggregation (K driver rows), then a narrow
    hash-threshold filter; no data shuffle."""
    import math

    from .dedup import tokens_col

    totals = {
        r["_src"]: int(r["_tok"] or 0)
        for r in df.groupBy(F.col(strata_col).alias("_src")).agg(
            F.sum(F.size(tokens_col(F.col(text_col)))).alias("_tok")
        ).collect()
    }
    if alpha == 0.5:
        weights = {s: math.sqrt(float(t)) for s, t in totals.items()}
    else:
        weights = {s: float(t) ** alpha for s, t in totals.items()}
    z = 0.0
    for w in sorted(weights.values()):
        z = z + w
    rates = {}
    for s, t in totals.items():
        if t and z:
            rates[s] = min(1.0, float(target_tokens) * weights[s] / z / t)
        else:
            rates[s] = 0.0
    return stratified_sample(df, rates, strata_col, id_col,
                             default_rate=0.0)


def _token_window_hashes(df: DataFrame, text_col: str, id_col: str,
                         window_tokens: int, with_pos: bool,
                         drop_empty: bool) -> DataFrame:
    """(id[, pos], h) — md5 of every space-joined `window_tokens`-token
    rolling window, Arrow-batched. Bit-identical to the HOF form
    (md5 of concat_ws(' ', slice(tokens, i+1, w)) over lowercased
    ASCII-\\s-split tokens; docs with fewer than w tokens emit
    nothing); equality-tested in tests/test_textops_pipeline.py.
    Shared kernel of substring_dup_stats / trim_dup_spans — the
    hottest window-hash loop, ~6x the interpreted-HOF throughput."""
    from ..functions.partitions import spread_small_input

    id_type = df.schema[id_col].dataType.simpleString()
    slim = spread_small_input(
        df.select(F.col(id_col).alias("id"),
                  F.col(text_col).alias("_text"))
    )
    w = window_tokens

    def gen(batches):
        import hashlib
        import re

        import pandas as pd

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        for pdf in batches:
            ids, poss, hs = [], [], []
            for i, t in zip(pdf["id"], pdf["_text"]):
                if t is None:
                    continue
                toks = ws.split(t.lower().strip(" "))
                if drop_empty:
                    toks = [x for x in toks if x != ""]
                if len(toks) < w:
                    continue
                for j in range(len(toks) - w + 1):
                    h = hashlib.md5(
                        " ".join(toks[j:j + w]).encode("utf-8")
                    ).hexdigest()
                    ids.append(i)
                    poss.append(j)
                    hs.append(h)
            out = {"id": ids}
            if with_pos:
                out["pos"] = pd.Series(poss, dtype="int32")
            out["h"] = hs
            yield pd.DataFrame(out)

    schema = (f"id {id_type}, pos int, h string" if with_pos
              else f"id {id_type}, h string")
    return slim.mapInPandas(gen, schema)


def substring_dup_stats(df: DataFrame, window_tokens: int = 50,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        impl: str = "arrow") -> DataFrame:
    """MassiveText/RefinedWeb-style EXACT-SUBSTRING duplication signal:
    for each document, how many of its `window_tokens`-token rolling
    windows also appear verbatim in ANOTHER document. Long shared
    spans are what this catches — syndicated article bodies, quoted
    license blocks, mirrored docs — which 3-gram Jaccard (similarity)
    and 8-gram decontamination (cross-source) are not tuned for.
    Output: (id, n_windows, n_dup_windows, dup_window_frac) — the
    removal decision (trim the span vs drop the doc) is policy and
    stays with the caller.

    Plan shape: rolling windows are generated inside codegen
    (transform over a token-index sequence — narrow), hashed to md5;
    ONE aggregation computes each window hash's distinct-doc count
    (Spark plans countDistinct as a two-phase partial-agg keyed by
    (hash, id) first, so a boilerplate window shared by 10^6 docs
    never funnels its rows through one reducer — the skew-safety a
    naive collect-the-ids plan would need an explicit cap for); the
    per-doc rollup joins window rows to the (hash -> n_docs) frame.
    Two shuffles total (window-hash agg, per-doc agg); never a pair
    join, never n^2."""
    from .dedup import tokens_col

    if impl == "arrow":
        wins = _token_window_hashes(df, text_col, id_col, window_tokens,
                                    with_pos=False, drop_empty=False)
    else:
        # staged token column: see winnow_fingerprints — inline arrays
        # inside interpreted HOF lambdas re-evaluate per element
        staged = df.withColumn("_toks", tokens_col(F.col(text_col)))
        toks = F.col("_toks")
        idx = F.sequence(
            F.lit(0), F.greatest(F.size(toks) - window_tokens, F.lit(0))
        )
        win = F.transform(
            idx, lambda i: F.md5(
                F.concat_ws(" ", F.slice(toks, i + 1, window_tokens))
            )
        )
        wins = (
            staged.select(F.col(id_col).alias("id"),
                          F.explode(win).alias("h"),
                          F.size(toks).alias("_nt"))
            .where(F.col("_nt") >= window_tokens)
            .drop("_nt")
        )
    # wins feeds the distinct-doc agg AND the per-doc rollup join —
    # materialize once (Spark does not dedupe common subplans)
    wins = wins.localCheckpoint(eager=True)
    docs_per_window = wins.groupBy("h").agg(
        F.countDistinct("id").alias("n_docs")
    )
    j = wins.join(docs_per_window, "h")
    return (
        j.groupBy("id")
        .agg(
            F.count("*").cast("int").alias("n_windows"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
            .cast("int").alias("n_dup_windows"),
        )
        .withColumn(
            "dup_window_frac",
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 6),
        )
    )


def trim_dup_spans(df: DataFrame, window_tokens: int = 15,
                   text_col: str = "text",
                   id_col: str = "doc_id",
                   impl: str = "arrow") -> DataFrame:
    """The REMOVAL policy on top of substring_dup_stats: delete every
    token covered by a cross-doc duplicated `window_tokens`-token
    window from all docs EXCEPT the span's owner (lowest doc id per
    window — each span survives exactly once in the corpus, the
    MassiveText exact-substring-dedup rule). Output:
    (id, clean_text, n_tokens, removed_tokens); clean_text is
    token-normalized (single spaces — the span cut makes the original
    whitespace non-reconstructible anyway).

    Plan shape: window hashes + their (distinct-doc count, owner =
    min id) in ONE aggregation; a doc's removable positions are the
    union of its non-owned duplicated windows' token ranges (explode
    to positions, distinct — overlapping windows merge for free); the
    rebuild anti-joins kept tokens and re-assembles per doc. All
    shuffles are keyed by window hash or doc id; never a pair join."""
    from .dedup import tokens_col

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.filter(tokens_col(F.col(text_col)),
                              lambda t: t != ""))
        .alias("pos", "token"),
    )
    n = window_tokens
    tarr = F.filter(tokens_col(F.col(text_col)), lambda t: t != "")
    if impl == "arrow":
        wins = _token_window_hashes(df, text_col, id_col, n,
                                    with_pos=True, drop_empty=True)
    else:
        # staged token column: see winnow_fingerprints — inline arrays
        # inside interpreted HOF lambdas re-evaluate per element
        staged = df.withColumn("_tarr", tarr)
        st = F.col("_tarr")
        idx = F.sequence(F.lit(0),
                         F.greatest(F.size(st) - n, F.lit(0)))
        win = F.transform(
            idx, lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.concat_ws(" ", F.slice(st, i + 1, n)))
                .alias("h"),
            )
        )
        wins = (
            staged.select(F.col(id_col).alias("id"),
                          F.size(st).alias("_nt"),
                          F.explode(win).alias("w"))
            .where(F.col("_nt") >= n)
            .select("id", F.col("w.pos").alias("pos"),
                    F.col("w.h").alias("h"))
        )
    # wins feeds the owner/count agg AND the removable join —
    # materialize once
    wins = wins.localCheckpoint(eager=True)
    stats = wins.groupBy("h").agg(
        F.countDistinct("id").alias("n_docs"),
        F.min("id").alias("owner"),
    ).where(F.col("n_docs") >= 2)
    removable = (
        wins.join(stats, "h")
        .where(F.col("id") != F.col("owner"))
        .select(
            "id",
            F.explode(F.sequence(
                F.col("pos"), F.col("pos") + F.lit(n - 1)
            )).alias("pos"),
        )
        .distinct()
    )
    kept = toks.join(removable, ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("pos").alias("pos"),
                             F.col("token").alias("token"))
                )),
                lambda s: s["token"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").cast("int").alias("kept_tokens"),
    )
    base = df.select(
        F.col(id_col).alias("id"), F.size(tarr).cast("int").alias("n_tokens")
    )
    return base.join(rebuilt, "id", "left").select(
        "id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("kept_tokens", F.lit(0)))
        .cast("int").alias("removed_tokens"),
    )


def write_jsonl_shards(df: DataFrame, out_dir: str, shard_tokens: int,
                       text_col: str = "text", id_col: str = "doc_id",
                       counter: str = "ws",
                       merges_path: str | None = None,
                       meta_cols: tuple[str, ...] = ()) -> dict:
    """Emit the packed corpus as token-budgeted JSONL shards — the
    format trainer data loaders actually ingest: one directory per
    ~shard_tokens-token shard, text files whose every line is a JSON
    object {id, text, n_tokens, *meta_cols}. Shard assignment is
    pack_token_shards' deterministic prefix-sum cut; lines within a
    shard are sorted by id, so the emitted bytes are reproducible
    run-to-run. Plan: one shuffle to join the assignment back to the
    docs, one repartition by shard_id so each shard directory is
    written by the tasks owning it. Returns {n_shards, n_docs}."""
    packed = pack_token_shards(
        df, shard_tokens, text_col=text_col, id_col=id_col,
        counter=counter, merges_path=merges_path,
    ).select("id", "n_tokens", "shard_id")
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text"),
        *[F.col(c) for c in meta_cols],
    ).join(packed, "id")
    payload = F.to_json(F.struct(
        F.col("id"), F.col("text"), F.col("n_tokens"),
        *[F.col(c) for c in meta_cols],
    ))
    (
        base.select(payload.alias("value"), "shard_id", "id")
        .repartition(F.col("shard_id"))
        .sortWithinPartitions("id")
        .drop("id")
        .write.mode("overwrite").partitionBy("shard_id").text(out_dir)
    )
    n = df.sparkSession.read.text(out_dir).count()
    n_shards = packed.select("shard_id").distinct().count()
    return {"n_shards": int(n_shards), "n_docs": int(n)}


def write_token_shards(df: DataFrame, out_dir: str, shard_tokens: int,
                       text_col: str = "text", id_col: str = "doc_id",
                       counter: str = "ws",
                       merges_path: str | None = None) -> dict:
    """Materialize the packed training corpus: pack_token_shards
    assigns shard ids, the docs land as parquet PARTITIONED BY
    shard_id — one directory per ~shard_tokens-token shard, the layout
    a trainer's data loader consumes directly (read one shard dir =
    one training chunk; no scan of the rest). Returns
    {n_shards, n_docs, total_tokens}.

    The write is repartitioned BY shard_id so each shard directory is
    produced by the tasks owning that shard's rows — no
    one-file-per-(task, shard) fragmentation."""
    packed = pack_token_shards(
        df, shard_tokens, text_col=text_col, id_col=id_col,
        counter=counter, merges_path=merges_path,
    )
    cols = [c for c in packed.columns]
    (
        packed.repartition(F.col("shard_id"))
        .write.mode("overwrite").partitionBy("shard_id")
        .parquet(out_dir)
    )
    back = packed.sparkSession.read.parquet(out_dir)
    agg = back.agg(
        F.countDistinct("shard_id").alias("n_shards"),
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    ).first()
    return {
        "n_shards": int(agg["n_shards"]),
        "n_docs": int(agg["n_docs"]),
        "total_tokens": int(agg["total_tokens"] or 0),
        "columns": cols,
    }
