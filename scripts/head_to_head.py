#!/usr/bin/env python3
"""Head-to-head vs the reference on identical inputs and artifacts
(BASELINE.md table). Both sides read the same per-company companyfacts
JSON panel and produce the same artifact set: tags / rankings / wide
CSVs + the full instance TTL.

    python scripts/head_to_head.py --n-companies 960 [--skip-reference]
        [--ref-cap-sec 1800] [--panel-dir DIR] [--keep-panel]

The reference is single-process Python with an O(n^2) composite-ranking
scan; past ~25k companies its wall is hours, so large rows are measured
ours-only and the reference is extrapolated from the measured scaling
(the table says which rows are measured vs extrapolated).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/scripts/select_xbrl_tags.py"


def run_reference(panel: dict, outdir: str, cap_sec: float | None) -> float:
    cmd = [
        sys.executable, REF, "--fy", "2024",
        "--facts", *panel["facts_paths"],
        "--subs-cache-dir", panel["subs_cache_dir"],
        "--out-tags", f"{outdir}/tags.csv",
        "--out-companies", f"{outdir}/companies.csv",
        "--out-benchmarks", f"{outdir}/benchmarks.csv",
        "--out-rankings", f"{outdir}/rankings.csv",
        "--out-wide", f"{outdir}/wide.csv",
        "--emit-ttl", f"{outdir}/instances.ttl",
        "--include-derived",
    ]
    t0 = time.monotonic()
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=outdir,
                       timeout=cap_sec)
    wall = time.monotonic() - t0
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return wall


def run_ours(panel_dir: str, outdir: str, threads: int) -> float:
    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.emit.csv_format import (
        benchmarks_csv_frame, observations_csv_frame, rankings_csv_frame,
    )
    from edgar_finance_ontology_spark.emit.turtle_writer import (
        write_turtle_document,
    )
    from edgar_finance_ontology_spark.operators.wide import (
        build_wide_csv_frame,
    )
    from edgar_finance_ontology_spark.plans.pipeline import (
        canonical_benchmarks_order, canonical_rankings_order, run_pipeline,
    )
    from edgar_finance_ontology_spark.session import build_session
    from edgar_finance_ontology_spark.sources.facts import (
        build_companies, explode_facts, read_companyfacts_json,
        read_submissions_json,
    )

    spark = build_session(
        "efin-h2h", master=f"local[{threads}]",
        shuffle_partitions=max(8, threads),
        extra_conf={"spark.driver.memory": "24g"},
    )
    t0 = time.monotonic()
    cf = read_companyfacts_json(spark, f"{panel_dir}/facts/*.json")
    subs = read_submissions_json(spark, f"{panel_dir}/subs_cache/*.json")
    facts = explode_facts(cf)
    companies = build_companies(cf, subs)
    t = run_pipeline(facts, companies, fy=2024)
    obs, bench, rank = t["observations"], t["benchmarks"], t["rankings"]
    observations_csv_frame(obs).write.mode("overwrite").option(
        "header", True).csv(f"{outdir}/tags_csv")
    benchmarks_csv_frame(
        canonical_benchmarks_order(bench, obs)
    ).write.mode("overwrite").option("header", True).csv(
        f"{outdir}/benchmarks_csv")
    rankings_csv_frame(canonical_rankings_order(rank)).write.mode(
        "overwrite").option("header", True).csv(f"{outdir}/rankings_csv")
    build_wide_csv_frame(obs, rank).write.mode("overwrite").option(
        "header", True).csv(f"{outdir}/wide_csv")
    write_turtle_document(
        f"{outdir}/ttl", t["companies"], obs, bench, rank, fy=2024
    )
    n_obs = obs.count()
    wall = time.monotonic() - t0
    print(f"# ours artifacts done: {n_obs} observations", file=sys.stderr)
    spark.stop()
    return wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-companies", type=int, required=True)
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--ref-cap-sec", type=float, default=None)
    ap.add_argument("--panel-dir", default=None,
                    help="reuse an existing panel instead of writing one")
    ap.add_argument("--keep-panel", action="store_true")
    ap.add_argument("--threads", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from edgar_finance_ontology_spark.sources.synthetic import (
        write_reference_inputs,
    )

    tmp = args.panel_dir or tempfile.mkdtemp(prefix="efin-h2h-")
    out = {"n_companies": args.n_companies, "threads": args.threads}
    try:
        if args.panel_dir is None or not os.path.isdir(f"{tmp}/facts"):
            t0 = time.monotonic()
            panel = write_reference_inputs(tmp, n_companies=args.n_companies)
            out["panel_write_sec"] = round(time.monotonic() - t0, 1)
        else:
            facts = sorted(
                os.path.join(tmp, "facts", f)
                for f in os.listdir(f"{tmp}/facts")
            )
            panel = {"facts_paths": facts,
                     "subs_cache_dir": f"{tmp}/subs_cache"}
        if not args.skip_reference:
            rdir = os.path.join(tmp, "ref_out")
            os.makedirs(rdir, exist_ok=True)
            try:
                out["reference_wall_sec"] = round(
                    run_reference(panel, rdir, args.ref_cap_sec), 1)
            except subprocess.TimeoutExpired:
                out["reference_wall_sec"] = None
                out["reference_capped_at_sec"] = args.ref_cap_sec
        odir = os.path.join(tmp, "ours_out")
        os.makedirs(odir, exist_ok=True)
        out["ours_wall_sec"] = round(run_ours(tmp, odir, args.threads), 1)
        out["ours_ms_per_company"] = round(
            out["ours_wall_sec"] * 1000 / args.n_companies, 2)
        print(json.dumps(out))
    finally:
        if not args.keep_panel and args.panel_dir is None:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
