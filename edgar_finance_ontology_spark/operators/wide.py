"""Wide per-company pivot: one row per company, a column per metric,
plus {Metric}_Rank_{Industry|Sector|All} columns.

Reference: create_wide_format_csv (select_xbrl_tags.py:1041-1192).
Spark: two pivots (metrics, ranks) + one broadcast join; the metric
column set is discovered from the data like the reference's
all_metrics set, then sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE_COLUMNS = [
    "cik", "symbol", "name", "sector", "industry", "sic",
    "sic_description", "fye",
]


def build_wide_csv_frame(
    observations: DataFrame, rankings: DataFrame
) -> DataFrame:
    """String-typed frame matching companies_wide_{fy}.csv exactly."""
    from ..emit.csv_format import fmt_fixed

    metrics = sorted(
        r[0] for r in observations.select("metric").distinct().collect()
    )

    finite = (
        F.col("value").isNotNull() & ~F.isnan("value")
        & (F.col("value") != float("inf")) & (F.col("value") != float("-inf"))
    )
    vals = observations.select(
        "cik",
        "metric",
        F.when(finite, F.col("value")).alias("value"),
    )
    mvals = vals.groupBy("cik").pivot("metric", metrics).agg(F.first("value"))

    info = observations.groupBy("cik").agg(
        *[F.first(c).alias(c) for c in BASE_COLUMNS if c != "cik"]
    )

    ranks = (
        rankings.where(F.col("ranking_type") == "All")
        .withColumn(
            "scope",
            F.when(F.col("industry") != "", "Industry")
            .when(F.col("sector") != "", "Sector")
            .otherwise("All"),
        )
        .withColumn("colname", F.concat_ws("_Rank_", "metric", "scope"))
    )
    rank_cols = [f"{m}_Rank_{s}" for m in metrics for s in ("Industry", "Sector", "All")]
    rpivot = ranks.groupBy("cik").pivot("colname", rank_cols).agg(F.first("rank"))

    out = info.join(mvals, "cik", "left").join(rpivot, "cik", "left")
    cols = [F.col(c).cast("string").alias(c) for c in BASE_COLUMNS]
    cols += [fmt_fixed(F.col(f"`{m}`"), 6).alias(m) for m in metrics]
    cols += [
        F.coalesce(F.col(f"`{rc}`").cast("string"), F.lit("")).alias(rc)
        for rc in rank_cols
    ]
    return out.select(*cols).orderBy("cik")
