"""Entity linking: candidate scoring with TF-IDF context similarity +
prior-popularity rerank (north_star stage 3).

The reference's analog is the candidate prior table (base_score,
select_xbrl_tags.py:1565-1714) + score_adj context bonuses; on web
text, a surface form ("Alpha Systems") may map to several entities, so
candidates are reranked by:

    score = alpha * cosine_tfidf(mention context, entity profile)
          + (1 - alpha) * prior

All DataFrame-native: tokenize/explode -> document frequencies -> idf
join -> sparse dot product via groupBy — no UDFs, three shuffles
(tf, idf broadcast, pair dot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_col


def tf_vectors(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token, tf) with tf = count / doc length."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    ).where(F.col("token") != "")
    counts = toks.groupBy("id", "token").agg(F.count("*").alias("c"))
    lens = toks.groupBy("id").agg(F.count("*").alias("n"))
    return counts.join(lens, "id").select(
        "id", "token", (F.col("c") / F.col("n")).alias("tf")
    )


def idf_weights(tf: DataFrame) -> DataFrame:
    """(token, idf) smoothed: ln((N + 1) / (df + 1)) + 1."""
    n_docs = tf.select("id").distinct().count()
    df_ = tf.groupBy("token").agg(F.countDistinct("id").alias("df"))
    return df_.select(
        "token",
        (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0).alias("idf"),
    )


def tfidf_cosine_pairs(
    left: DataFrame, right: DataFrame, idf: DataFrame,
    pairs: DataFrame, left_id: str = "mention_id", right_id: str = "entity_id",
) -> DataFrame:
    """cosine similarity between paired tf-vectors under shared idf.
    `pairs` restricts the computation to candidate pairs (never n²)."""
    lw = left.join(F.broadcast(idf), "token").select(
        F.col("id").alias(left_id), "token",
        (F.col("tf") * F.col("idf")).alias("wl"),
    )
    rw = right.join(F.broadcast(idf), "token").select(
        F.col("id").alias(right_id), "token",
        (F.col("tf") * F.col("idf")).alias("wr"),
    )
    ln = lw.groupBy(left_id).agg(F.sqrt(F.sum(F.col("wl") ** 2)).alias("nl"))
    rn = rw.groupBy(right_id).agg(F.sqrt(F.sum(F.col("wr") ** 2)).alias("nr"))
    dots = (
        pairs.join(lw, left_id)
        .join(rw, [right_id, "token"])
        .groupBy(left_id, right_id)
        .agg(F.sum(F.col("wl") * F.col("wr")).alias("dot"))
    )
    return (
        pairs.join(dots, [left_id, right_id], "left")
        .na.fill({"dot": 0.0})
        .join(ln, left_id).join(rn, right_id)
        .select(
            left_id, right_id,
            F.when(
                (F.col("nl") > 0) & (F.col("nr") > 0),
                F.col("dot") / (F.col("nl") * F.col("nr")),
            ).otherwise(F.lit(0.0)).alias("context_cos"),
        )
    )


def link_mentions(
    mention_contexts: DataFrame,   # (mention_id, context_text, surface)
    entity_profiles: DataFrame,    # (entity_id, profile_text)
    candidates: DataFrame,         # (surface, entity_id, prior)
    alpha: float = 0.7,
) -> DataFrame:
    """-> (mention_id, entity_id, score, rank) — best entity first.
    Candidate generation is a broadcast join on the surface form; the
    TF-IDF cosine runs only on generated candidates."""
    pairs = mention_contexts.join(
        F.broadcast(candidates), "surface"
    ).select("mention_id", "entity_id", "prior")

    m_tf = tf_vectors(mention_contexts, "mention_id", "context_text")
    e_tf = tf_vectors(entity_profiles, "entity_id", "profile_text")
    idf = idf_weights(m_tf.unionByName(e_tf))

    cos = tfidf_cosine_pairs(
        m_tf, e_tf, idf, pairs.select("mention_id", "entity_id")
    )
    scored = pairs.join(cos, ["mention_id", "entity_id"]).select(
        "mention_id", "entity_id",
        (F.lit(alpha) * F.col("context_cos")
         + F.lit(1 - alpha) * F.col("prior")).alias("score"),
    )
    w = Window.partitionBy("mention_id").orderBy(
        F.col("score").desc(), F.col("entity_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w))
