"""Sparse lexical retrieval (BM25 top-k) as a DataFrame plan — the
query-side complement of the corpus ops: "find the training documents
most relevant to these probe queries" is the everyday tool for corpus
audits (leakage triage after decontamination flags, targeted quality
review, building eval-adjacent held-out slices).

Engine-portability contract (everything the DuckDB oracle replays):
  * idf is quantized to INTEGER BITS — floor(log2((N_docs+1)/df)) —
    the same quantization unigram_surprisal uses: JVM and libm
    transcendentals differ by 1 ulp, but floor(log2(x)) only flips at
    exact powers of two where log2 is exact in any IEEE
    implementation;
  * the per-(query, doc) score sum runs in DECIMAL(38,12): decimal
    addition is associative, so the result is independent of partition
    count and row order (a double sum is neither) and identical in
    both engines — the kmeans_fit centroid-sum lesson applied to
    scoring;
  * the tf saturation term tf*(k1+1)/(tf + k1*(1-b+b*len/avg_len))
    uses only IEEE +,*,/ on identically-derived doubles — correctly
    rounded in any engine.

100-TB posture: the query term set broadcasts and SEMI-JOINS the
token stream BEFORE the tf aggregation, so only matching tokens ever
shuffle — the corpus-wide inverted index is never materialized for a
bounded query workload. Doc lengths are a pure map (size(split));
avg_len is one aggregation returning a scalar. The per-query top-k is
a window over the bounded candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_col


def bm25_topk(
    documents: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
) -> DataFrame:
    """(query_id, rank, doc_id, score) — BM25 top-k documents per
    query. `queries` carries (query_id, terms array<string>); terms
    are matched against whitespace-lowercased document tokens (the
    corpus ops' shared tokenizer)."""
    toks = documents.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens_col(F.col(text_col))).alias("token"),
    ).where(F.col("token") != "")
    lens = documents.select(
        F.col(id_col).alias("doc"),
        F.size(F.filter(
            tokens_col(F.col(text_col)), lambda t: t != ""
        )).alias("len"),
    )
    # avg as exact-int-sum / count (one IEEE division): engine `avg()`
    # implementations may compensate differently; this form is
    # bit-identical everywhere
    stats = lens.agg(
        F.count("*").alias("n_docs"), F.sum("len").alias("total_len")
    ).first()
    n_docs = int(stats["n_docs"])
    avg_len = float(stats["total_len"] or 0) / max(1, n_docs)

    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.col(terms_col)).alias("token"),
    ).distinct()
    vocab = qterms.select("token").distinct()
    # only query-matching tokens ever reach the shuffle
    hits = toks.join(F.broadcast(vocab), "token", "semi")
    tf = hits.groupBy("doc", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf_bits = F.floor(
        F.log2(F.lit(float(n_docs + 1)) / F.col("df"))
    ).cast("long")
    scored = (
        tf.join(F.broadcast(dfreq.select(
            "token", idf_bits.alias("idf_bits"))), "token")
        .join(F.broadcast(qterms), "token")
        .join(lens, "doc")
        .withColumn(
            "w",
            F.col("tf") * (k1 + 1.0) / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("len") / F.lit(avg_len))
            ),
        )
        .groupBy("query_id", "doc")
        .agg(F.sum(
            (F.col("idf_bits") * F.col("w")).cast("decimal(38,12)")
        ).alias("score_d"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score_d").desc(), F.col("doc").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "rank", F.col("doc").alias("doc_id"),
            F.round(F.col("score_d").cast("double"), 6).alias("score"),
        )
    )
