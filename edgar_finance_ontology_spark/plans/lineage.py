"""Per-partition lineage checkpointing + resume (north_rule).

The Spark analog of the reference's per-CIK date-stamped file cache
(select_xbrl_tags.py:1406-1461): each stage writes its output parquet
partitioned by url-hash bucket and appends one lineage row per
completed bucket (run_id, stage, bucket, rows_out, status, wall_ms).
A restarted run anti-joins the completed buckets and processes only
the remainder — executor/driver loss mid-stage never reprocesses or
duplicates a completed bucket.

On a real deployment both tables are Iceberg (atomic append snapshots);
here they are directory-parquet with the same layout, written
bucket-atomically (one output dir per bucket, lineage row appended
after the bucket's data commit).
"""

from __future__ import annotations

import pathlib
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.schemas import LINEAGE_SCHEMA


class LineageLog:
    def __init__(self, spark: SparkSession, run_dir: str, run_id: str = "r1"):
        self.spark = spark
        self.run_dir = pathlib.Path(run_dir)
        self.run_id = run_id
        self.path = str(self.run_dir / "_lineage")

    def completed_buckets(self, stage: str) -> list[int]:
        p = pathlib.Path(self.path)
        if not p.exists() or not any(p.glob("*.parquet")):
            return []
        df = self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.path)
        rows = (
            df.where(
                (F.col("stage") == stage) & (F.col("status") == "done")
                & (F.col("run_id") == self.run_id)
            )
            .select("bucket").distinct().collect()
        )
        return [r[0] for r in rows]

    def append(self, stage: str, bucket_counts: list[tuple[int, int]],
               wall_ms: int):
        rows = [
            (self.run_id, stage, int(b), None, int(n), "done", wall_ms)
            for b, n in bucket_counts
        ]
        self.spark.createDataFrame(rows, LINEAGE_SCHEMA).write.mode(
            "append"
        ).parquet(self.path)

    def metrics(self) -> DataFrame:
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.path)


def run_stage(
    log: LineageLog,
    stage: str,
    input_df: DataFrame,
    transform,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Run `transform(input_df_subset)` for the buckets not yet marked
    done, append their output to the stage directory, record lineage,
    and return the FULL stage output (previous + new buckets).

    The transform must preserve the bucket column.
    """
    stage_dir = str(log.run_dir / stage)
    done = log.completed_buckets(stage)
    todo_df = input_df
    if done:
        todo_df = input_df.where(~F.col(bucket_col).isin(done))

    t0 = time.monotonic()
    out = transform(todo_df)
    has_new = out.limit(1).count() > 0
    if has_new:
        out.write.mode("append").partitionBy(bucket_col).parquet(stage_dir)
        wall = int((time.monotonic() - t0) * 1000)
        written = (
            log.spark.read.parquet(stage_dir)
            .groupBy(bucket_col).count().collect()
        )
        new_counts = [
            (r[bucket_col], r["count"]) for r in written
            if r[bucket_col] not in done
        ]
        log.append(stage, new_counts, wall)
    else:
        # still mark empty-but-processed buckets as done so resume skips
        remaining = [
            r[0] for r in todo_df.select(bucket_col).distinct().collect()
        ]
        if remaining:
            log.append(stage, [(b, 0) for b in remaining],
                       int((time.monotonic() - t0) * 1000))
    return log.spark.read.parquet(stage_dir) if pathlib.Path(
        stage_dir
    ).exists() else out


def company_manifest(facts: DataFrame, companies: DataFrame) -> DataFrame:
    """(cik, content_hash) — one row per company, hash of its ENTIRE
    contributing input set (fact rows + profile row). The company-grain
    analog of the reference's per-CIK date-stamped cache
    (select_xbrl_tags.py:1406-1461): the cache key there is the CIK and
    the freshness token is the snapshot date; here the token is a
    content hash, so ANY late page that changes a company's fact set —
    new fact, revised value, profile update — flips exactly that
    company's hash and nothing else.

    Plan shape: one md5 per row (pure map), one map-side-combined
    aggregation per table keyed by cik. The per-cik collect_list is
    bounded by a company's own fact count (thousands, not corpus-
    scale); sort_array makes the hash independent of row order and
    partitioning. Field separator is \\x1f, never \\x00 (pandas
    C-string key trap, round 3)."""
    def row_hash(df: DataFrame):
        cols = [c for c in sorted(df.columns) if c != "cik"]
        return F.md5(F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x02"))
              for c in cols],
        ))

    def table_hash(df: DataFrame, alias: str) -> DataFrame:
        return df.groupBy("cik").agg(
            F.md5(F.concat_ws(
                "", F.sort_array(F.collect_list(row_hash(df)))
            )).alias(alias)
        )

    fh = table_hash(facts, "facts_hash")
    ph = table_hash(companies, "profile_hash")
    return fh.join(ph, "cik", "full_outer").select(
        "cik",
        F.md5(F.concat_ws(
            "\x1f",
            F.coalesce("facts_hash", F.lit("")),
            F.coalesce("profile_hash", F.lit("")),
        )).alias("content_hash"),
    )


def dirty_companies(manifest_new: DataFrame,
                    manifest_old: DataFrame | None) -> DataFrame:
    """ciks whose content hash is new or changed (anti join on the
    (cik, content_hash) pair). Companies REMOVED from the input are
    not handled — a crawl is append-only; a true retraction workflow
    would delete their partitions explicitly."""
    if manifest_old is None:
        return manifest_new.select("cik")
    return manifest_new.join(
        manifest_old, ["cik", "content_hash"], "left_anti"
    ).select("cik")
