"""Salted two-phase aggregation + suggestions store tests."""

from pyspark.sql import functions as F


def test_salted_agg_equals_plain_groupby_on_zipfian(spark):
    """Zipfian keys: the salted path must produce identical results to
    plain groupBy (north_rule skew requirement)."""
    from edgar_finance_ontology_spark.operators.skew import (
        salted_agg, salted_avg,
    )

    # head key '0' gets ~10k rows, tail keys few (Zipf-ish)
    df = (
        spark.range(0, 20000)
        .withColumn(
            "key",
            F.when(F.col("id") < 10000, F.lit(0))
            .otherwise((F.col("id") % 97).cast("int")),
        )
        .withColumn("value", (F.col("id") % 1000).cast("double"))
    )
    got = (
        salted_agg(df, ["key"], {"n": ("count", "*"), "s": ("sum", "value"),
                                 "mn": ("min", "value"), "mx": ("max", "value")})
        .orderBy("key").collect()
    )
    want = (
        df.groupBy("key").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"),
            F.min("value").alias("mn"), F.max("value").alias("mx"))
        .orderBy("key").collect()
    )
    assert [(r["key"], r["n"], r["mn"], r["mx"]) for r in got] == \
           [(r["key"], r["n"], r["mn"], r["mx"]) for r in want]
    # sums of doubles: order-insensitive to 1e-6 rel
    for a, b in zip(got, want):
        assert abs(a["s"] - b["s"]) <= 1e-6 * max(1.0, abs(b["s"]))

    avg = {r["key"]: r["avg"] for r in salted_avg(df, ["key"], "value").collect()}
    pav = {r["key"]: r["a"] for r in
           df.groupBy("key").agg(F.avg("value").alias("a")).collect()}
    for k in pav:
        assert abs(avg[k] - pav[k]) <= 1e-9 * max(1.0, abs(pav[k]))


def test_suggestions_roundtrip(spark, tmp_path):
    from edgar_finance_ontology_spark.sources.suggestions import (
        dump_suggestions, load_suggestions, record_suggestions,
    )

    rows = spark.createDataFrame(
        [
            ("0000100001", "Revenue", "ext:CustomRev", "mined", "n1", 1),
            ("100001", "Revenue", "ext:CustomRev", "hint", "n2", 2),  # dup key
            ("0000100002", "Revenue", "us-gaap:Revenues", "static", "", 3),
            (None, "Revenue", "ext:X", "mined", "", 4),               # dropped
        ],
        "cik string, metric string, qname string, origin string, "
        "note string, seq int",
    )
    s = record_suggestions(rows, ext_only=False, order_col="seq")
    got = {(r["cik"], r["qname"]): r["origin"] for r in s.collect()}
    # first-wins on the normalized key
    assert got[("100001", "ext:CustomRev")] == "mined"
    assert ("100002", "us-gaap:Revenues") in got

    ext = record_suggestions(rows, ext_only=True, order_col="seq")
    assert {r["qname"] for r in ext.collect()} == {"ext:CustomRev"}

    p = str(tmp_path / "sugg")
    dump_suggestions(s, p)
    back = load_suggestions(spark, p)
    assert back.count() == s.count()
