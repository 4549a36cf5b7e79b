"""Bloom-filter decontamination (operators/decontaminate.py): the
superset guarantee (zero false negatives), the bounded fp rate, and
agreement with the exact inverted-index check."""

from __future__ import annotations

import random

from edgar_finance_ontology_spark.operators.decontaminate import (
    bloom_flag_contaminated, build_gram_bloom,
)

NGRAM = 4


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(rng, n):
    return " ".join(f"w{rng.randrange(10_000)}" for _ in range(n))


def test_no_false_negatives_and_clean_pass(spark):
    rng = random.Random(7)
    secret = _words(rng, 12)  # benchmark text
    heldout = _df(spark, [(1, secret)])
    train = _df(spark, [
        (10, "prefix words " + secret + " suffix words"),  # contaminated
        (11, _words(rng, 40)),                             # clean
        (12, "short doc"),                                 # no grams
    ])
    bloom = build_gram_bloom(heldout, ngram=NGRAM)
    got = {r["id"]: r for r in
           bloom_flag_contaminated(train, bloom).collect()}
    # every shared gram flagged: doc 10 embeds all 9 of the secret's
    # 4-gram windows
    assert got[10]["flagged_grams"] >= 12 - NGRAM + 1
    # disjoint vocab: provably clean at this m/k (fp ~ (kn/m)^k ~ 1e-12)
    assert got[11]["flagged_grams"] == 0
    assert got[12]["n_grams"] == 0 and got[12]["flagged_grams"] == 0


def test_fp_rate_bounded(spark):
    """10k random probe grams vs a 1k-gram held-out set in a 2^23-bit
    bloom: expected fp rate (1-e^{-kn/m})^k ~ 4e-13 — assert simply
    that none of the disjoint-vocabulary probes collide."""
    rng = random.Random(13)
    held_rows = [(i, " ".join(f"h{rng.randrange(500)}"
                              for _ in range(NGRAM)))
                 for i in range(1000)]
    probe_rows = [(i, " ".join(f"p{rng.randrange(100_000)}"
                               for _ in range(NGRAM)))
                  for i in range(10_000)]
    bloom = build_gram_bloom(_df(spark, held_rows), ngram=NGRAM)
    got = bloom_flag_contaminated(_df(spark, probe_rows), bloom)
    total_flagged = sum(r["flagged_grams"] for r in got.collect())
    assert total_flagged == 0


def test_bloom_superset_of_exact_check(spark):
    """Every doc the exact inverted-index check reports as overlapping
    must be flagged by the bloom (the routing contract: bloom-clean
    docs never reach the exact verifier)."""
    from edgar_finance_ontology_spark.operators.textops import (
        cross_source_overlap,
    )

    rng = random.Random(99)
    shared = _words(rng, NGRAM)
    rows = []
    for i in range(20):
        base = _words(rng, 20)
        text = base if i % 3 else base + " " + shared
        rows.append((i, text, "train" if i < 15 else "test"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    heldout = df.where("source = 'test'")
    train = df.where("source = 'train'")
    bloom = build_gram_bloom(heldout, ngram=NGRAM)
    flagged = {r["id"] for r in
               bloom_flag_contaminated(train, bloom).collect()
               if r["flagged_grams"] > 0}
    exact = cross_source_overlap(df, "test", ngram=NGRAM, max_df=None)
    # exact reports test docs' matches; recover the matching train ids
    from edgar_finance_ontology_spark.operators.dedup import word_shingles

    sh = word_shingles(df, n=NGRAM)
    src = df.selectExpr("doc_id AS id", "source")
    sh = sh.join(src, "id")
    test_grams = sh.where("source = 'test'").select("shingle").distinct()
    truly = {r["id"] for r in
             sh.where("source = 'train'")
             .join(test_grams, "shingle", "left_semi")
             .select("id").distinct().collect()}
    assert truly, "constructed overlap must exist"
    assert truly <= flagged
    assert exact.count() > 0


def test_near_dup_decontaminate_catches_paraphrase(spark):
    """A training doc that shares most shingles with a held-out doc
    (a light rephrase) is flagged; unrelated docs are not; the
    held-out doc never matches itself."""
    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.operators.decontaminate import (
        near_dup_decontaminate,
    )

    eval_text = ("the quick brown fox jumps over the lazy dog near "
                 "the river bank every single morning")
    # paraphrase: one word changed -> high shingle jaccard
    para = eval_text.replace("lazy", "sleepy")
    rows = [
        (1, eval_text, "eval"),
        (2, para, "train"),
        (3, "completely unrelated text about spark data pipelines "
            "and parquet files at scale", "train"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = near_dup_decontaminate(
        df, "eval", threshold=0.3).collect()
    assert len(got) == 1
    r = got[0]
    assert r["test_id"] == 1 and r["n_train_near_dups"] == 1
    assert 0.3 <= r["max_jaccard"] < 1.0

    # identical copy across sources -> jaccard exactly 1.0
    df2 = spark.createDataFrame(
        rows + [(4, eval_text, "train")],
        "doc_id long, text string, source string")
    got2 = {r["test_id"]: r for r in near_dup_decontaminate(
        df2, "eval", threshold=0.3).collect()}
    assert got2[1]["n_train_near_dups"] == 2
    assert float(got2[1]["max_jaccard"]) == 1.0


def test_near_dup_decon_broadcasts_heldout_side(spark):
    """Plan audit: the candidate join must broadcast the held-out
    bucket side — the training corpus is never shuffled into a
    sort-merge join for candidates."""
    from edgar_finance_ontology_spark.operators.decontaminate import (
        near_dup_decontaminate,
    )

    rows = [(i, f"doc number {i} with some shared words here", 
             "train" if i else "eval") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = near_dup_decontaminate(df, "eval", threshold=0.01)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
