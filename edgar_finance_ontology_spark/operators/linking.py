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


# ---------------------------------------------------------------------
# Pairwise predicate classification (north_star stage 4): given a pair
# of linked entities co-occurring in a context window, pick the
# ontology predicate the evidence supports — candidates come from the
# property SCHEMA (domain/range type compatibility), lexical cues come
# from the property names themselves (camelCase split), so the
# classifier is entirely ontology-driven: extend the schema and the
# classifier follows.
# ---------------------------------------------------------------------

def _camel_words(name: str) -> list[str]:
    import re

    return [w.lower() for w in re.findall(r"[A-Z]?[a-z]+|[A-Z]+(?![a-z])",
                                          name) if len(w) > 1]


def predicate_schema_df(spark):
    """(pred, domain_class, range_class, triggers array<string>) from
    the generated ontology's object-property table — the same rows
    schema_ttl emits as owl:ObjectProperty declarations."""
    from ..vocab.schema_ttl import _OBJECT_PROPERTIES

    rows = [
        (name, dom, rng, _camel_words(name))
        for name, dom, rng, _comment in _OBJECT_PROPERTIES
    ]
    return spark.createDataFrame(
        rows, "pred string, domain_class string, range_class string, "
              "triggers array<string>"
    )


def classify_predicates(
    pairs: DataFrame,   # (pair_id, subj_class, obj_class, evidence_text)
    schema: DataFrame,  # predicate_schema_df(spark)
    min_score: float = 0.0,
) -> DataFrame:
    """-> (pair_id, pred, score, rank): candidate predicates are the
    schema rows whose domain/range match the pair's entity classes
    (broadcast join — the property vocabulary is bounded); each
    candidate scores by how many of its name-derived trigger words
    appear in the evidence text, plus a tiny specificity prior (more
    trigger words = more specific property) for deterministic
    tie-breaks; rank 1 = best (ties -> pred name asc)."""
    cand = pairs.join(
        F.broadcast(schema),
        (F.col("subj_class") == F.col("domain_class"))
        & (F.col("obj_class") == F.col("range_class")),
    )
    ev_tokens = tokens_col(F.col("evidence_text"))
    hits = F.size(F.array_intersect(ev_tokens, F.col("triggers")))
    specificity = F.size(F.col("triggers")).cast("double") / 100.0
    scored = cand.select(
        "pair_id", "pred",
        (hits.cast("double") + specificity).alias("score"),
    ).where(F.col("score") > min_score)
    w = Window.partitionBy("pair_id").orderBy(
        F.col("score").desc(), F.col("pred").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w))


def pagerank_priors(alias_edges: DataFrame, iters: int = 4,
                    src: str = "src", dst: str = "dst") -> DataFrame:
    """Graph-derived prior-popularity table (entity_id, prior) for
    `link_mentions`, from an entity alias/co-mention edge list: run
    the integer-exact PageRank kernel over the symmetrized graph and
    min-max normalize rank_units into [0, 1] (most-central entity
    gets prior 1.0, least-central 0.0; a single-rank graph degenerates
    to 0.5 everywhere — no division by zero).

    This is the web-scale replacement for a hand-maintained
    base_score table (the reference's candidate priors,
    select_xbrl_tags.py:1565-1714): on a crawl, centrality in the
    alias/co-mention graph IS the popularity signal. Normalization
    bounds are two driver scalars from one agg — the rank table never
    leaves the executors."""
    from .graphs import pagerank_int

    # materialize the caller's edge derivation once — the symmetrize
    # union reads it from both sides, and pagerank_int's own edge
    # checkpoint would otherwise re-run it through the union twice
    e = alias_edges.select(F.col(src).alias("src"),
                           F.col(dst).alias("dst")) \
        .localCheckpoint(eager=True)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Materialize the iterative chain ONCE: the min/max agg below is an
    # action, and the returned select is consumed later — uncached, the
    # full iters-round join pipeline would execute twice.
    ranks = pagerank_int(sym, iters=iters).localCheckpoint(eager=True)
    lo, hi = ranks.agg(F.min("rank_units"), F.max("rank_units")).first()
    if hi == lo:
        return ranks.select(
            F.col("id").alias("entity_id"), F.lit(0.5).alias("prior")
        )
    return ranks.select(
        F.col("id").alias("entity_id"),
        ((F.col("rank_units") - F.lit(int(lo)))
         / F.lit(float(hi - lo))).alias("prior"),
    )
