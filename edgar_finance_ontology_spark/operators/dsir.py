"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
distribution looks like a (small) TARGET corpus. The public method
behind "select pretraining data that matches Wikipedia/books":

  1. featurize every document as a bag of HASHED word uni+bigrams
     (B buckets — the model is B integers, not a vocabulary);
  2. fit two bag-of-buckets unigram models, target and raw, with
     Laplace (+1) smoothing;
  3. per raw document, importance weight
         log p_target(x) − log p_raw(x)
       = Σ_b n_b(x) · λ_b,  λ_b = log (p_t[b] / p_r[b]);
  4. select top-k by weight (deterministic variant) or Gumbel-top-k
     resample (the paper's sampled variant — here with md5-derived
     uniforms so re-runs are reproducible).

Engine-portability contract (the 1-ulp lesson from
`unigram_surprisal_scores`, adapted): λ_b is quantized to MILLIBITS —
1/1024-bit fixed point, round-to-nearest:
  λ_b = floor(log2(r_b)·1024 + 0.5),
  r_b = (cnt_t[b]+1)·(total_r+B) / ((cnt_r[b]+1)·(total_t+B)).
Round-to-nearest matters: a plain floor(log2) loses up to a full bit
per matched gram — a systematic NEGATIVE bias that ranked weak
positives below the zero-evidence empty doc (caught by the first test
run). Portability: both engines build r_b through the identical IEEE
double sequence (exact ≤2^53 integer products, one correctly-rounded
divide), so only log2 differs, by ≤1 ulp; after ·1024 the computed
value sits within ~2^-42 of the true one, so the floor can only
disagree when log2(r_b)·1024+0.5 is within 2^-42 of an integer —
probability ~2^-42 per bucket, ~2^-29 across all 8192 (and the oracle
sweep would catch the miracle). Per-doc weights are then pure INTEGER
sums (order-free, shuffle-safe), so the DuckDB twin replays selection
bit-for-bit. The unquantized double-precision weight is also emitted
for consumers that want the paper's exact estimator — it is NOT part
of the cross-engine contract.

100-TB posture: both models are ONE bucket-keyed aggregation with
map-side combine, at most B rows each, BROADCAST into scoring; scoring
is one explode → (doc, bucket) partial-aggregated count → one bounded
join → per-doc integer sum. Selection is TakeOrdered (never a global
sort). Nothing driver-side except the 2×B model rows.

Reference anchor: the reference has no data-selection stage; this is
engine-side training-data-pipeline surface (SURVEY.md §6), sited next
to the quality/surprisal filters it composes with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hashed_ngram_features(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          n_buckets: int = 8192) -> DataFrame:
    """(id, bucket, n) — hashed word uni+bigram counts per document.
    bucket = first-8-hex-digits of md5(ngram) mod n_buckets (the
    portable integer-hash idiom shared with `stratified_sample`).
    Bigrams are space-joined adjacent token pairs; a one-token document
    contributes its unigram only."""
    from .dedup import tokens_col

    toks = df.select(
        F.col(id_col).alias("id"),
        F.filter(tokens_col(F.col(text_col)),
                 lambda x: x != "").alias("t"),
    ).where(F.col("t").isNotNull())
    # guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) rather than
    # yielding empty, so one-token docs need the explicit CASE
    grams = toks.select(
        "id",
        F.explode(
            F.concat(
                F.col("t"),
                F.expr("CASE WHEN size(t) >= 2 THEN "
                       "transform(sequence(1, size(t) - 1), "
                       "i -> concat(t[i-1], ' ', t[i])) "
                       "ELSE array() END"),
            )
        ).alias("gram"),
    ).where(F.col("gram") != "")
    return (
        grams.withColumn(
            "bucket",
            (F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10)
             .cast("long") % n_buckets).cast("int"),
        )
        .groupBy("id", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _bucket_model(feats: DataFrame) -> DataFrame:
    """(bucket, cnt) corpus-level bucket counts — ≤ B rows."""
    return feats.groupBy("bucket").agg(F.sum("n").alias("cnt"))


def dsir_weights(raw: DataFrame, target: DataFrame,
                 text_col: str = "text", id_col: str = "doc_id",
                 n_buckets: int = 8192) -> DataFrame:
    """Per raw-document DSIR importance weights vs the target corpus:
    (id, n_feats, weight_mb, weight) where
      * weight_mb = Σ_b n_b · λ_b in MILLIBITS (1/1024-bit
        round-to-nearest fixed point) — the INTEGER, engine-portable
        score used for selection;
      * weight = Σ_b n_b · λ_b in doubles — the paper's estimator,
        informational only (not cross-engine stable).
    Documents with zero features (empty text) get weight 0 with
    n_feats = 0 — they carry no evidence either way."""
    rf = hashed_ngram_features(raw, text_col, id_col, n_buckets)
    tf = hashed_ngram_features(target, text_col, id_col, n_buckets)
    # Materialize the ≤B-row bucket models ONCE (eager localCheckpoint
    # truncates lineage; ContextCleaner frees it on GC — see PLANS.md
    # on persist-in-plan-builder pinning). Without this the full
    # raw-corpus gram explode ran three times (tot_r action, λ branch,
    # scoring branch) and the target explode twice. raw is still
    # scanned twice — fit pass + score pass — which is the intended
    # 100-TB posture: persisting the gram table (≫ input bytes) to
    # save the second scan would cost more than the scan.
    rm = _bucket_model(rf).localCheckpoint(eager=True)
    tm = _bucket_model(tf).localCheckpoint(eager=True)
    tot_r, tot_t = (
        int(rm.agg(F.sum("cnt")).first()[0] or 0),
        int(tm.agg(F.sum("cnt")).first()[0] or 0),
    )
    lam = (
        rm.withColumnRenamed("cnt", "cnt_r")
        .join(tm.withColumnRenamed("cnt", "cnt_t"), "bucket", "full")
        .select(
            "bucket",
            F.coalesce("cnt_r", F.lit(0)).alias("cnt_r"),
            F.coalesce("cnt_t", F.lit(0)).alias("cnt_t"),
        )
        .withColumn(
            "ratio",
            ((F.col("cnt_t") + 1) * F.lit(float(tot_r + n_buckets)))
            / ((F.col("cnt_r") + 1) * F.lit(float(tot_t + n_buckets))),
        )
        .select(
            "bucket",
            F.floor(F.log2("ratio") * 1024 + 0.5).cast("long")
            .alias("lam_mb"),
            F.log2("ratio").alias("lam"),
        )
    )
    scored = rf.join(F.broadcast(lam), "bucket", "left").groupBy("id").agg(
        F.sum("n").cast("long").alias("n_feats"),
        F.sum(F.col("n") * F.col("lam_mb")).cast("long")
        .alias("weight_mb"),
        F.sum(F.col("n") * F.col("lam")).alias("weight"),
    )
    ids = raw.select(F.col(id_col).alias("id")).distinct()
    return ids.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce("weight_mb", F.lit(0)).cast("long")
        .alias("weight_mb"),
        F.coalesce("weight", F.lit(0.0)).alias("weight"),
    )


def dsir_select_topk(raw: DataFrame, target: DataFrame, k: int,
                     text_col: str = "text", id_col: str = "doc_id",
                     n_buckets: int = 8192) -> DataFrame:
    """Deterministic DSIR selection: (rank, id, n_feats, weight_mb)
    for the k raw docs with the highest quantized importance weight
    (ties → lowest id). TakeOrderedAndProject, never a global sort."""
    w = dsir_weights(raw, target, text_col, id_col, n_buckets)
    return (
        w.orderBy(F.col("weight_mb").desc(), F.col("id").asc())
        .limit(k)
        .select(
            # bounded: only the k limit survivors reach this window
            F.row_number().over(
                Window.orderBy(F.col("weight_mb").desc(),
                               F.col("id").asc())
            ).alias("rank"),
            "id", "n_feats", "weight_mb",
        )
    )


def dsir_gumbel_sample(raw: DataFrame, target: DataFrame, k: int,
                       temperature: float = 1.0,
                       text_col: str = "text", id_col: str = "doc_id",
                       n_buckets: int = 8192,
                       seed: str = "dsir") -> DataFrame:
    """The paper's SAMPLED selection, derandomized: Gumbel-top-k over
    the quantized weights. key = weight_mb/temperature + g where
    g = −ln(−ln(u)) and u is the md5-fraction of (seed, id) — so the
    draw is reproducible across re-runs and partitionings, and a
    temperature → 0 sweep recovers the deterministic top-k. Returns
    (rank, id, weight_mb, key 6dp). The Gumbel transform is
    transcendental, hence this variant is property-tested rather than
    oracle-twinned (see tests)."""
    w = dsir_weights(raw, target, text_col, id_col, n_buckets)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(seed),
                                  F.col("id").cast("string"))), 1, 8),
            16, 10,
        ).cast("double")
        + 0.5
    ) / float(0xFFFFFFFF + 1)
    key = F.col("weight_mb") / F.lit(float(temperature)) - F.log(
        -F.log(u)
    )
    keyed = w.withColumn("key", key)
    return (
        keyed.orderBy(F.col("key").desc(), F.col("id").asc())
        .limit(k)
        .select(
            F.row_number().over(
                Window.orderBy(F.col("key").desc(), F.col("id").asc())
            ).alias("rank"),
            "id", "weight_mb", F.round("key", 6).alias("key"),
        )
    )
