"""BM25 top-k (operators/retrieval.py): ranking semantics + the
portability contracts (integer-bit idf, decimal score sums)."""

from __future__ import annotations

from pyspark.sql import functions as F

from edgar_finance_ontology_spark.operators.retrieval import bm25_topk


def _docs(spark):
    rows = [
        (1, "apple banana cherry durian elderberry"),
        (2, "apple apple apple common common common common"),
        (3, "zebra quark apple banana"),          # both probe terms
        (4, "common words only nothing rare here"),
        (5, "banana smoothie recipe with banana and more banana"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _probe(spark, qid, terms):
    return spark.createDataFrame(
        [(qid, terms)], "query_id long, terms array<string>")


def test_doc_matching_more_query_terms_ranks_higher(spark):
    d = _docs(spark)
    got = bm25_topk(d, _probe(spark, 0, ["apple", "banana"]), k=5).collect()
    ranks = {r["doc_id"]: r["rank"] for r in got}
    # doc 3 holds BOTH terms and is short -> top; docs with one term
    # follow; doc 4 (no terms) absent
    assert ranks[3] == 1
    assert 4 not in ranks
    assert set(ranks) == {1, 2, 3, 5}


def test_rare_term_outweighs_common_term(spark):
    rows = [(i, "common filler text") for i in range(10)]
    rows += [(100, "common rareword"), (101, "common common common")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_topk(d, _probe(spark, 0, ["rareword", "common"]), k=3) \
        .collect()
    # the only doc containing the rare term wins despite every doc
    # containing 'common'
    assert got[0]["doc_id"] == 100


def test_scores_partition_invariant(spark):
    """Decimal score sums: identical output bit-for-bit regardless of
    partitioning — the property a double sum does not have."""
    d = _docs(spark)
    q = _probe(spark, 0, ["apple", "banana", "common"])
    a = bm25_topk(d.repartition(7), q, k=5).orderBy("rank").collect()
    b = bm25_topk(d.coalesce(1), q, k=5).orderBy("rank").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_tf_saturates(spark):
    """k1 saturation: tripling a term's tf must not triple its score
    (score ratio well under the tf ratio)."""
    rows = [(1, "term x"), (2, "term term term x"),
            (3, "filler a"), (4, "filler b")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in
           bm25_topk(d, _probe(spark, 0, ["term"]), k=4).collect()}
    assert got[2] > got[1]            # more tf -> higher
    assert got[2] / got[1] < 2.0      # but saturated, not linear
