"""The graft path: pages (html) -> extraction -> fact parsing -> same
observations/TTL as the companyfacts path -> reference golden."""

import pandas as pd
import pytest

GOLDEN_HTML = (
    b"<html><head><title>T</title></head><body><nav>junk nav</nav>"
    b"<main><h1>Head</h1><p>First  sentence.</p><p>Second\nsentence.</p>"
    b"</main><footer>legal</footer></body></html>"
)
GOLDEN_TEXT = "Head\nFirst sentence.\nSecond sentence."


def test_extract_text_golden_bytes():
    from edgar_finance_ontology_spark.operators.extraction import extract_text

    assert extract_text(GOLDEN_HTML) == GOLDEN_TEXT
    # byte-identical on repeat (north_rule per-url invariant)
    assert extract_text(GOLDEN_HTML).encode() == GOLDEN_TEXT.encode()
    # no <main>: falls back to body minus boilerplate
    plain = b"<html><body><nav>n</nav><p>hello world</p></body></html>"
    assert extract_text(plain) == "hello world"
    assert extract_text(None) == ""


@pytest.fixture(scope="module")
def pages(spark):
    from edgar_finance_ontology_spark.sources.pages import synthesize_pages

    return synthesize_pages(spark, n_buckets=8).cache()


def test_pages_front_end_matches_companyfacts(spark, pages, engine_inputs):
    """pages -> facts must reproduce the companyfacts-exploded facts,
    and the resulting observations must be identical."""
    from edgar_finance_ontology_spark.emit.csv_format import (
        observations_csv_frame,
    )
    from edgar_finance_ontology_spark.operators.observations import (
        build_observations,
    )
    from edgar_finance_ontology_spark.plans.web_pipeline import (
        pages_to_inputs,
    )

    facts_cf, companies_cf = engine_inputs
    facts_web, companies_web = pages_to_inputs(pages)

    ours = (
        observations_csv_frame(
            build_observations(facts_web, companies_web, fy=2024)
        )
        .toPandas()
        .sort_values(["cik", "metric"])
        .reset_index(drop=True)
    )
    ref = (
        observations_csv_frame(
            build_observations(facts_cf, companies_cf, fy=2024)
        )
        .toPandas()
        .sort_values(["cik", "metric"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ours, ref)


def test_web_pipeline_ttl_matches_reference(panel_dir, pages):
    from edgar_finance_ontology_spark.plans.pipeline import golden_turtle
    from edgar_finance_ontology_spark.plans.web_pipeline import (
        pages_to_inputs,
    )

    facts, companies = pages_to_inputs(pages)
    ours = golden_turtle(facts, companies, fy=2024)
    ref = (panel_dir["dir"] / "instances.ttl").read_text()
    assert ours == ref


def test_mentions_aho_corasick(spark, pages):
    """AC hits must equal naive substring counting (cross-check), and
    the operator must find the planted concept mentions."""
    from edgar_finance_ontology_spark.operators.mentions import (
        AhoCorasick, concept_lexicon_terms, detect_mentions,
    )
    from edgar_finance_ontology_spark.operators.extraction import (
        with_extracted_text,
    )

    ac = AhoCorasick([("revenue", "m1"), ("net income", "m2"), ("come", "m3")])
    text = "Revenue and net income; income NET INCOME revenue."
    hits = ac.find_all(text)
    got = sorted((t, b) for b, e, t, p in hits)
    naive = []
    low = text.lower()
    for term in ("revenue", "net income", "come"):
        start = 0
        while True:
            i = low.find(term, start)
            if i < 0:
                break
            naive.append((term, i))
            start = i + 1
    assert got == sorted(naive)

    p = with_extracted_text(pages)
    m = detect_mentions(p, concept_lexicon_terms())
    counts = {r["payload"]: r["cnt"] for r in
              m.groupBy("payload").count().withColumnRenamed("count", "cnt")
              .collect()}
    assert any(k.startswith("Revenue|") for k in counts)
    # every fact sentence names its qname once -> at least one mention
    # per fact record of the primary Revenue concept
    key = "Revenue|us-gaap:RevenueFromContractWithCustomerExcludingAssessedTax"
    assert counts[key] >= 11 * 2  # 11 revenue-bearing companies x 2 FY recs


def test_lineage_resume(spark, tmp_path, pages):
    """Kill-and-resume: processing half the buckets, then resuming, must
    produce exactly the full output with no duplicated lineage rows."""
    from edgar_finance_ontology_spark.plans.lineage import (
        LineageLog, run_stage,
    )
    from edgar_finance_ontology_spark.plans.web_pipeline import (
        parse_fact_records,
    )
    from edgar_finance_ontology_spark.operators.extraction import (
        with_extracted_text,
    )
    from pyspark.sql import functions as F

    def transform(df):
        # per-bucket narrow stage: extraction + regex parse (the global
        # dedup/pool-order runs downstream of the checkpoint)
        return parse_fact_records(with_extracted_text(df)).drop("url")

    log = LineageLog(spark, str(tmp_path / "run"))
    # phase 1: half the url-buckets survive before the simulated crash
    first_half = pages.where(F.col("bucket") < 4)
    run_stage(log, "facts", first_half, transform)
    done1 = set(log.completed_buckets("facts"))

    # phase 2: resume with the full input
    out = run_stage(log, "facts", pages, transform)
    done2 = set(log.completed_buckets("facts"))
    assert done1.issubset(done2)

    direct = transform(pages)
    key = ["cik", "qname", "unit", "val", "end", "fp", "accn", "qtrs", "segment"]
    a = out.select(*key).toPandas().sort_values(key).reset_index(drop=True)
    b = direct.select(*key).toPandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # no duplicate done rows per (stage, bucket)
    lm = log.metrics().where("status = 'done'").groupBy("stage", "bucket").count()
    assert lm.where("count > 1").count() == 0


def test_resumable_web_pipeline_mid_kill_resume(spark, tmp_path):
    """Kill-after-stage-1-half resume: a first run sees only half the
    buckets (simulating loss mid-pipeline); the restarted full run
    reprocesses ONLY the remaining buckets and converges to the same
    observations as the non-resumable path, with exactly one lineage
    row per (stage, bucket)."""
    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.emit.csv_format import (
        observations_csv_frame,
    )
    from edgar_finance_ontology_spark.plans.web_pipeline import (
        run_web_pipeline, run_web_pipeline_resumable,
    )
    from edgar_finance_ontology_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, n_buckets=8).cache()
    run_dir = str(tmp_path / "run")

    # crash simulation: the first attempt only ever saw 4 buckets
    run_web_pipeline_resumable(
        pages.where(F.col("bucket") < 4), fy=2024, run_dir=run_dir
    )["observations"].count()

    # restart over the full input
    t = run_web_pipeline_resumable(pages, fy=2024, run_dir=run_dir)
    got = (
        observations_csv_frame(t["observations"]).toPandas()
        .sort_values(["cik", "metric"]).reset_index(drop=True)
    )
    want = (
        observations_csv_frame(
            run_web_pipeline(pages, fy=2024)["observations"]
        ).toPandas().sort_values(["cik", "metric"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)

    # no duplicated lineage rows, every bucket marked once per stage
    lin = t["lineage"].toPandas()
    per = lin.groupby(["stage", "bucket"]).size()
    assert (per == 1).all(), per[per > 1]
    assert set(lin["stage"]) == {"extract", "fact_records",
                                 "mention_triples"}
    assert sorted(lin.loc[lin.stage == "extract", "bucket"]) == list(range(8))
    # the metrics table carries TRIPLE counts per url-bucket
    # (north_rule contract): lineage rows_out for mention_triples must
    # sum to the emitted triple count, and a resumed run must not have
    # re-emitted completed buckets (one lineage row per bucket, already
    # asserted above)
    mt = t["mention_triples"]
    assert int(
        lin.loc[lin.stage == "mention_triples", "rows_out"].sum()
    ) == mt.count()
    assert set(r["bucket"] for r in mt.select("bucket").distinct()
               .collect()) <= set(range(8))


def test_mention_triples_exact_under_duplicate_urls(spark):
    """A crawl slice can carry the same url twice; the per-bucket
    triple counts lineage records must stay EXACT — duplicate page
    rows contribute their mentions once, not once per copy (and never
    quadratically through the bucket join; round-4 advice)."""
    from edgar_finance_ontology_spark.plans.web_pipeline import (
        _bucketed_mention_triples, extracted_text_stage,
    )
    from edgar_finance_ontology_spark.sources.pages import synthesize_pages

    extracted = extracted_text_stage(
        synthesize_pages(spark, n_buckets=4)
    ).limit(12).cache()
    base = _bucketed_mention_triples(extracted).count()
    doubled = _bucketed_mention_triples(
        extracted.unionByName(extracted)
    ).count()
    assert base > 0
    assert doubled == base


def test_stage_table_bucket_pruning(spark, tmp_path):
    """Stage tables are written partitionBy(bucket) — a bucket filter
    on the read-back side must reach the scan as a PartitionFilter
    (whole directories skipped), the property that makes per-bucket
    resume cheap at 10^12 pages."""
    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.plans.lineage import (
        LineageLog, run_stage,
    )

    rows = [(f"u{i}", i % 4, f"text {i}") for i in range(40)]
    df = spark.createDataFrame(rows, "url string, bucket int, text string")
    log = LineageLog(spark, str(tmp_path / "run"))
    out = run_stage(log, "s1", df, lambda d: d)
    plan = (
        out.where(F.col("bucket") == 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "bucket" in plan, plan
