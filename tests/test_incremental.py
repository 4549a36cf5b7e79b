"""Company-grain incremental recompute (plans/incremental.py) — the
round-4 verdict's carry-over #7: one late page must re-derive ONE
company and leave every other company's stored partitions untouched,
with the patched stores row-equal to a from-scratch run on the full
input."""

from __future__ import annotations

import datetime as dt
import os
import pathlib

import pytest
from pyspark.sql import functions as F

from edgar_finance_ontology_spark.plans.incremental import run_incremental


def _pages(spark):
    from edgar_finance_ontology_spark.sources.pages import synthesize_pages

    return synthesize_pages(spark, n_buckets=8).cache()


def _norm(df):
    """order/dtype-insensitive row set (oracle-harness style)."""
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    return sorted(
        tuple("" if v is None else str(v) for v in row)
        for row in pdf.astype(object).where(pdf.notna(), None).values.tolist()
    )


def _scratch(spark, pages, fy=2024):
    from edgar_finance_ontology_spark.emit.triples import build_triples
    from edgar_finance_ontology_spark.plans.web_pipeline import (
        run_web_pipeline,
    )

    t = run_web_pipeline(pages, fy=fy)
    t["triples"] = build_triples(
        t["observations"], t["companies"], t["benchmarks"], t["rankings"],
        fy=fy,
    )
    return t


def _late_page_row(spark, cold_obs):
    """One NEW filing page for a single existing company: a revenue
    fact with a fresh accession — enough to flip that company's
    content hash."""
    from edgar_finance_ontology_spark.sources.pages import (
        _page_html, fact_sentence,
    )

    row = (
        cold_obs.where(
            (F.col("metric") == "Revenue") & (~F.col("is_derived"))
        ).orderBy(F.col("cik").desc()).first()
    )
    cik10 = row["cik"]
    # identical period/form/fp to the shipped record but a LOWER value:
    # the deterministic pool order (assemble_facts: end, accn, segment,
    # val ascending) puts this record first, so the smart-pick tie
    # resolves to it and the company's selected Revenue changes
    sent = fact_sentence(cik10, row["selected_tag"], row["unit"], {
        "val": float(row["value"]) - 12345.0,
        "end": row["end"],
        "fy": int(row["fy"]),
        "fp": "FY",
        "form": row["form"],
        "accn": row["accn"],
        "qtrs": 4,
        "segment": None,
    })
    html = _page_html("late amendment", [sent]).encode("utf-8")
    url = f"https://filings.example.com/{cik10}/late-0001.html"
    late = spark.createDataFrame(
        [(url, dt.datetime(2025, 3, 1), html, None, "en")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    ).withColumn("bucket", F.pmod(F.hash("url"), F.lit(8)).cast("int"))
    return cik10, late


def _store_snapshot(store_dir, sub):
    """(path -> mtime_ns) for every data file in a store subdir."""
    base = pathlib.Path(store_dir) / sub
    out = {}
    for p in base.rglob("*.parquet"):
        out[str(p.relative_to(base))] = os.stat(p).st_mtime_ns
    return out


@pytest.fixture(scope="module")
def inc_world(spark, tmp_path_factory):
    """Cold incremental run + matching scratch run, shared by tests."""
    store = str(tmp_path_factory.mktemp("inc") / "store")
    pages = _pages(spark)
    cold = run_incremental(spark, pages, 2024, store)
    return {"store": store, "pages": pages, "cold": cold}


def test_cold_run_matches_scratch(spark, inc_world):
    cold, pages = inc_world["cold"], inc_world["pages"]
    scratch = _scratch(spark, pages)
    assert cold["metrics"]["n_dirty"] == cold["metrics"]["n_companies"] > 0
    for t in ("observations", "benchmarks", "rankings", "triples"):
        assert _norm(cold[t]) == _norm(scratch[t]), t


def test_noop_rerun_touches_nothing(spark, inc_world):
    store, pages = inc_world["store"], inc_world["pages"]
    before = {s: _store_snapshot(store, s)
              for s in ("observations", "triples", "manifest", "extracted")}
    again = run_incremental(spark, pages, 2024, store)
    assert again["metrics"]["new_pages"] == 0
    assert again["metrics"]["n_dirty"] == 0
    assert again["metrics"]["obs_rows_recomputed"] == 0
    after = {s: _store_snapshot(store, s)
             for s in ("observations", "triples", "manifest", "extracted")}
    assert before == after


def test_late_page_rederives_exactly_one_company(spark, inc_world):
    store, pages, cold = (
        inc_world["store"], inc_world["pages"], inc_world["cold"])
    cik10, late = _late_page_row(spark, cold["observations"])
    from edgar_finance_ontology_spark.plans.incremental import (
        cik_bucket_col,
    )

    dirty_bucket = late.select(
        cik_bucket_col(F.lit(cik10), 64).alias("b")).first()["b"]
    obs_before = _store_snapshot(store, "observations")
    tri_before = _store_snapshot(store, "triples")
    man_before = _store_snapshot(store, "manifest")

    late_pages = pages.unionByName(late)
    inc2 = run_incremental(spark, late_pages, 2024, store)
    m = inc2["metrics"]
    # exactly one new page, exactly one dirty company, one obs bucket
    assert m["new_pages"] == 1
    assert m["n_dirty"] == 1
    assert m["obs_buckets_rewritten"] == 1
    # recomputed rows = that company's observations only
    n_cik = inc2["observations"].where(F.col("cik") == cik10).count()
    assert m["obs_rows_recomputed"] == n_cik > 0

    # every clean company's stored partitions are untouched (same
    # files, same mtimes); only the dirty bucket was rewritten
    obs_after = _store_snapshot(store, "observations")
    for rel, mt in obs_before.items():
        if f"cik_bucket={dirty_bucket}/" not in rel:
            assert obs_after.get(rel) == mt, rel
    # the triple store is a snapshot table: a patch only ADDS data
    # files — every pre-patch file survives byte-untouched, replaced
    # partitions included (they are merely de-referenced by the new
    # snapshot)
    tri_after = _store_snapshot(store, "triples")
    for rel, mt in tri_before.items():
        assert tri_after.get(rel) == mt, rel
    # and the pre-patch table is still readable by snapshot id
    # (time travel): it must equal the cold run's triples exactly
    from edgar_finance_ontology_spark.plans import snapshots

    tri_root = pathlib.Path(store) / "triples"
    ids = snapshots.snapshot_ids(tri_root)
    assert len(ids) >= 2
    pre_patch = snapshots.read_snapshot(
        spark, tri_root, snapshot_id=ids[-2]
    ).drop("family", "cik_bucket")
    assert _norm(pre_patch) == _norm(cold["triples"])
    assert m["triples_snapshot_id"] == ids[-1]
    # the manifest is bucket-partitioned too: only the candidate's
    # bucket is rewritten
    man_after = _store_snapshot(store, "manifest")
    for rel, mt in man_before.items():
        if f"cik_bucket={dirty_bucket}/" not in rel:
            assert man_after.get(rel) == mt, rel

    # and the patched world equals a from-scratch run on the full input
    scratch = _scratch(spark, late_pages)
    for t in ("observations", "benchmarks", "rankings", "triples"):
        assert _norm(inc2[t]) == _norm(scratch[t]), t
    # the late fact actually changed the company's observations
    assert _norm(
        inc2["observations"].where(F.col("cik") == cik10)
    ) != _norm(
        cold["observations"].where(F.col("cik") == cik10)
    )


def test_expire_keep_bounds_snapshot_storage(spark, tmp_path):
    """expire_keep=1 drops superseded snapshots after the patch commit
    and deletes every unreferenced data file, leaving exactly the live
    file set — with the maintained world still equal to scratch."""
    from edgar_finance_ontology_spark.plans import snapshots

    store = str(tmp_path / "store")
    pages = _pages(spark)
    cold = run_incremental(spark, pages, 2024, store)
    cik10, late = _late_page_row(spark, cold["observations"])
    late_pages = pages.unionByName(late)
    inc2 = run_incremental(
        spark, late_pages, 2024, store, expire_keep=1
    )
    assert inc2["metrics"]["triples_expire"]["expired_snapshots"] == 1
    tri_root = pathlib.Path(store) / "triples"
    ids = snapshots.snapshot_ids(tri_root)
    assert len(ids) == 1
    live = {f["path"]
            for f in snapshots.snapshot_meta(tri_root, ids[0])["files"]}
    on_disk = {str(p.relative_to(tri_root))
               for p in (tri_root / "data").rglob("*.parquet")}
    assert on_disk == live
    scratch = _scratch(spark, late_pages)
    assert _norm(inc2["triples"]) == _norm(scratch["triples"])


def test_streaming_incremental_maintenance(spark, tmp_path):
    """Rolling-crawl mode: pages arrive as files; each AvailableNow
    drain applies company-grain patches exactly once. A late-page file
    re-derives only its company; a restart with the same checkpoint
    reprocesses nothing."""
    from edgar_finance_ontology_spark.streaming.pages_stream import (
        stream_incremental_maintenance,
    )

    pages = _pages(spark)
    pages_dir = str(tmp_path / "pages_in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    pages.drop("bucket").write.mode("append").parquet(pages_dir)

    q = stream_incremental_maintenance(spark, pages_dir, store, ckpt, 2024)
    q.awaitTermination()
    obs0 = _store_snapshot(store, "observations")
    assert obs0  # cold drain built the store

    # late-page file: one company's amendment
    cold_obs = spark.read.parquet(store + "/observations")
    cik10, late = _late_page_row(spark, cold_obs)
    late.drop("bucket").write.mode("append").parquet(pages_dir)
    q2 = stream_incremental_maintenance(spark, pages_dir, store, ckpt, 2024)
    q2.awaitTermination()
    from edgar_finance_ontology_spark.plans.incremental import (
        cik_bucket_col,
    )

    dirty_bucket = late.select(
        cik_bucket_col(F.lit(cik10), 64).alias("b")).first()["b"]
    obs1 = _store_snapshot(store, "observations")
    for rel, mt in obs0.items():
        if f"cik_bucket={dirty_bucket}/" not in rel:
            assert obs1.get(rel) == mt, rel

    # the maintained world equals a from-scratch run on ALL pages
    scratch = _scratch(spark, pages.unionByName(late))
    maintained = spark.read.parquet(store + "/observations") \
        .drop("cik_bucket")
    assert _norm(maintained) == _norm(scratch["observations"])

    # restart with the same checkpoint: nothing reprocessed
    q3 = stream_incremental_maintenance(spark, pages_dir, store, ckpt, 2024)
    q3.awaitTermination()
    assert _store_snapshot(store, "observations") == obs1


def test_incremental_store_renders_byte_identical_ttl(spark, inc_world,
                                                      tmp_path):
    """The end-to-end north-rule claim: the Turtle document rendered
    from the incrementally-maintained stores is BYTE-identical to the
    one rendered from a from-scratch pipeline run — the deploy
    artifact cannot tell maintenance mode from a full rebuild."""
    from edgar_finance_ontology_spark.emit.turtle_writer import (
        concat_turtle_parts, write_turtle_document,
    )

    store, pages, cold = (
        inc_world["store"], inc_world["pages"], inc_world["cold"])
    scratch = _scratch(spark, pages)

    def render(t, sub):
        out = str(tmp_path / sub)
        write_turtle_document(
            out, t["companies"], t["observations"], t["benchmarks"],
            t["rankings"], fy=2024,
        )
        return concat_turtle_parts(out)

    assert render(cold, "inc") == render(scratch, "full")
