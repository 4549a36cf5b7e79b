#!/usr/bin/env python3
"""Scale evidence for the big-industry benchmark routing (round-2
verdict item 3): a single 1M-row (industry, metric) group flows through
compute_benchmarks under the DEFAULT max_list_group=100_000 — so the
hybrid router takes the exact distributed path on its own, with no
forced knob — and the output must be bit-equal to the pandas list path
(max_list_group large enough to keep the group on the list side).

    python scripts/bench_big_industry.py [--rows 1000000]

Prints one JSON line with both walls + the equality verdict; the result
is recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_obs(spark, rows: int):
    """Observation-shaped frame: ONE mega industry holding `rows` ROE
    values (deterministic, irregular enough to exercise tie handling)
    plus a handful of ordinary small industries."""
    from pyspark.sql import functions as F

    mega = spark.range(rows).select(
        F.format_string("%010d", F.col("id")).alias("cik"),
        F.concat(F.lit("T"), F.col("id").cast("string")).alias("symbol"),
        F.concat(F.lit("Co"), F.col("id").cast("string")).alias("name"),
        F.lit("Tech").alias("sector"),
        F.lit("Mega Industry").alias("industry"),
        F.lit(2024).alias("fy"),
        F.lit("ROE").alias("metric"),
        F.lit(False).alias("is_derived"),
        (((F.col("id") * 2654435761) % 1000003).cast("double") / 1000.0
         - 500.0).alias("value"),
    )
    small = spark.range(600).select(
        F.format_string("9%09d", F.col("id")).alias("cik"),
        F.concat(F.lit("S"), F.col("id").cast("string")).alias("symbol"),
        F.concat(F.lit("Sm"), F.col("id").cast("string")).alias("name"),
        F.lit("Fin").alias("sector"),
        F.concat(F.lit("Ind"), (F.col("id") % 50).cast("string")).alias(
            "industry"),
        F.lit(2024).alias("fy"),
        F.lit("NetProfitMargin").alias("metric"),
        F.lit(False).alias("is_derived"),
        ((F.col("id") % 997).cast("double") / 100.0).alias("value"),
    )
    return mega.unionByName(small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--threads", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from edgar_finance_ontology_spark.operators.benchmarks import (
        compute_benchmarks,
    )
    from edgar_finance_ontology_spark.session import build_session

    spark = build_session(
        "efin-big-industry", master=f"local[{args.threads}]",
        shuffle_partitions=max(8, args.threads),
        extra_conf={"spark.driver.memory": "24g"},
    )
    obs = synth_obs(spark, args.rows).localCheckpoint(eager=True)

    t0 = time.monotonic()
    exact = compute_benchmarks(obs, 2024)  # default 100k cap -> big path
    rows_exact = sorted(map(tuple, exact.collect()))
    wall_exact = time.monotonic() - t0

    t1 = time.monotonic()
    listp = compute_benchmarks(obs, 2024, max_list_group=args.rows * 2)
    rows_list = sorted(map(tuple, listp.collect()))
    wall_list = time.monotonic() - t1

    out = {
        "rows_mega_group": args.rows,
        "threads": args.threads,
        "wall_exact_path_sec": round(wall_exact, 3),
        "wall_list_path_sec": round(wall_list, 3),
        "bench_rows": len(rows_exact),
        "bit_equal": rows_exact == rows_list,
    }
    print(json.dumps(out))
    assert out["bit_equal"], "exact path diverged from list path"
    spark.stop()


if __name__ == "__main__":
    main()
