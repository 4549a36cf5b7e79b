"""The reference's SPARQL query surface served as Spark SQL views.

The reference uploads its TTL into Jena Fuseki (fuseki-config.ttl:
23-29) and answers ~60 competency questions (docs/
investment_analysis_queries.md, investment_factor_screening_queries.md)
with SPARQL over the RDFS-closed graph. We do NOT build a SPARQL
engine (SURVEY.md §3.3): the same questions run as SQL over

  efin_observations       — the long fact table
  efin_observations_wide  — per-company metric pivot (star self-joins
                            collapse into column references)
  efin_benchmarks, efin_rankings, efin_companies
  efin_metric_hierarchy   — materialized subclass closure replacing
                            rdfs:subClassOf+ property paths
  efin_leaders            — the reasoner-defined
                            *CompositeTop10LeaderCompany classes as a
                            plain view (the reference documents this
                            equivalence itself: the "class-free"
                            CQ-R1..R4 variants,
                            investment_factor_screening_queries.md:1338+)

plus representative competency-query implementations showing each
SPARQL join shape (star BGP, EXISTS, OPTIONAL, theta-join-as-rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..vocab.metrics import (
    BASE_METRICS, BENCHMARK_RANKING_METRICS, DERIVED_METRICS,
)

# Metric class hierarchy from efin_schema.ttl: Metric ≡ BaseMetric ∪
# DerivedMetric (:943-944); DerivedRatio ⊑ DerivedMetric for ratio-
# valued metrics (:322-504). Materialized transitive closure.
RATIO_METRICS = [
    "GrossMargin", "OperatingMargin", "NetProfitMargin", "ROE",
    "EBITDAMargin", "InterestCoverage", "DebtToEquity", "CurrentRatio",
    "QuickRatio", "InventoryTurnover", "ReceivablesTurnover",
    "OperatingCashFlowRatio", "EquityRatio", "AssetTurnover",
    "RevenueGrowthYoY", "NetIncomeGrowthYoY", "CFOGrowthYoY",
    "AssetGrowthRate", "ROIC",
]


def metric_hierarchy(spark: SparkSession) -> DataFrame:
    rows = []
    for m in BASE_METRICS:
        rows += [(m, "BaseMetric"), (m, "Metric")]
    for m in DERIVED_METRICS:
        rows += [(m, "DerivedMetric"), (m, "Metric")]
        if m in RATIO_METRICS:
            rows.append((m, "DerivedRatio"))
    return spark.createDataFrame(rows, "metric string, ancestor string")


def register_views(
    spark: SparkSession,
    observations: DataFrame,
    companies: DataFrame,
    benchmarks: DataFrame,
    rankings: DataFrame,
) -> None:
    observations.createOrReplaceTempView("efin_observations")
    companies.createOrReplaceTempView("efin_companies")
    benchmarks.createOrReplaceTempView("efin_benchmarks")
    rankings.createOrReplaceTempView("efin_rankings")
    metric_hierarchy(spark).createOrReplaceTempView("efin_metric_hierarchy")

    metrics = sorted(
        r[0] for r in observations.select("metric").distinct().collect()
    )
    wide = (
        observations.groupBy("cik", "symbol", "sector", "industry", "fy")
        .pivot("metric", metrics)
        .agg(F.first("value"))
    )
    wide.createOrReplaceTempView("efin_observations_wide")

    # reasoner-defined leader classes as plain views (efin_schema.ttl:
    # 511-577): Composite Top10 membership per scope
    spark.sql("""
        CREATE OR REPLACE TEMP VIEW efin_leaders AS
        SELECT cik, symbol, industry, sector,
               CASE WHEN industry <> '' THEN 'IndustryCompositeTop10LeaderCompany'
                    ELSE 'AllCompositeTop10LeaderCompany' END AS leader_class,
               rank, composite_score
        FROM efin_rankings
        WHERE metric = 'Composite' AND ranking_type = 'Top10'
    """)


# ---- representative competency queries (SPARQL shape -> SQL) --------

def cq_star_profile(spark: SparkSession) -> DataFrame:
    """CQ1.1.1-style star BGP: N observations of the same company
    (5-way self-join in SPARQL) -> one row from the wide pivot."""
    return spark.sql("""
        SELECT cik, symbol, Revenue AS revenue, NetIncome AS net_income,
               ROE AS roe, NetProfitMargin AS net_margin,
               DebtToEquity AS debt_to_equity
        FROM efin_observations_wide
        WHERE Revenue IS NOT NULL AND NetIncome IS NOT NULL
        ORDER BY cik
    """)


def cq_lineage_exists(spark: SparkSession) -> DataFrame:
    """EXISTS filter over computedFromMetric lineage
    (investment_analysis_queries.md:353-370): observations derived from
    both NetIncome and Equity."""
    return spark.sql("""
        SELECT o.cik, o.metric, o.value
        FROM efin_observations o
        WHERE o.is_derived
          AND o.computed_from LIKE '%NetIncome%'
          AND o.computed_from LIKE '%Equity%'
        ORDER BY o.cik, o.metric
    """)


def cq_optional_metrics(spark: SparkSession) -> DataFrame:
    """SPARQL OPTIONAL -> left join: every company with its (optional)
    EBITDA and (optional) ROIC."""
    return spark.sql("""
        SELECT c.cik, c.symbol, w.EBITDA AS ebitda, w.ROIC AS roic
        FROM efin_companies c
        LEFT JOIN efin_observations_wide w ON c.cik = w.cik
        ORDER BY c.cik
    """)


def cq_peer_rank_by_count(spark: SparkSession) -> DataFrame:
    """The SPARQL theta self-join 'count peers with higher margin'
    (investment_analysis_queries.md:478-520) rewritten as a window
    rank — O(n log n) instead of O(n²)."""
    return spark.sql("""
        SELECT industry, cik, symbol, value AS net_margin,
               rank() OVER (PARTITION BY industry ORDER BY value DESC) - 1
                 AS peers_with_higher_margin
        FROM efin_observations
        WHERE metric = 'NetProfitMargin'
        ORDER BY industry, net_margin DESC, cik
    """)


def cq_leader_intersection(spark: SparkSession) -> DataFrame:
    """Leader-set intersection (investment_factor_screening_queries.md:
    1271-1291): composite Top10 companies that also rank Top10 on
    RevenueGrowthYoY (all-market scope), via LEFT SEMI."""
    return spark.sql("""
        SELECT l.cik, l.symbol, l.rank AS composite_rank
        FROM efin_leaders l
        LEFT SEMI JOIN (
            SELECT cik FROM efin_rankings
            WHERE metric = 'RevenueGrowthYoY' AND ranking_type = 'Top10'
              AND industry = ''
        ) g ON l.cik = g.cik
        WHERE l.leader_class = 'AllCompositeTop10LeaderCompany'
        ORDER BY l.rank
    """)


def cq_subclass_closure(spark: SparkSession) -> DataFrame:
    """rdfs:subClassOf+ property path -> materialized closure join:
    average value per metric superclass."""
    return spark.sql("""
        SELECT h.ancestor, count(*) AS n_obs,
               round(avg(o.value), 6) AS avg_value
        FROM efin_observations o
        JOIN efin_metric_hierarchy h ON o.metric = h.metric
        WHERE h.ancestor = 'DerivedRatio'
        GROUP BY h.ancestor
    """)


def cq_benchmark_compare(spark: SparkSession) -> DataFrame:
    """GROUP-BY subquery + HAVING shape: companies above the all-market
    median for each KEY metric."""
    keys = ", ".join(f"'{m}'" for m in BENCHMARK_RANKING_METRICS)
    return spark.sql(f"""
        SELECT o.metric, o.cik, o.symbol, o.value, b.median_value
        FROM efin_observations o
        JOIN efin_benchmarks b
          ON b.metric = o.metric AND b.industry = ''
        WHERE o.metric IN ({keys}) AND o.value > b.median_value
        ORDER BY o.metric, o.value DESC, o.cik
    """)


def cq_piotroski_style_score(spark: SparkSession) -> DataFrame:
    """BIND/IF arithmetic (investment_analysis_queries.md:128-185):
    a Piotroski-style sum of boolean indicators per company."""
    return spark.sql("""
        SELECT cik, symbol,
               (CASE WHEN ROE > 0 THEN 1 ELSE 0 END
              + CASE WHEN CFO > 0 THEN 1 ELSE 0 END
              + CASE WHEN NetIncome > 0 THEN 1 ELSE 0 END
              + CASE WHEN RevenueGrowthYoY > 0 THEN 1 ELSE 0 END
              + CASE WHEN CurrentRatio > 1 THEN 1 ELSE 0 END
              + CASE WHEN DebtToEquity < 1 THEN 1 ELSE 0 END
              + CASE WHEN GrossMargin > 0.2 THEN 1 ELSE 0 END
              + CASE WHEN AssetTurnover > 0.3 THEN 1 ELSE 0 END)
                 AS piotroski_score
        FROM efin_observations_wide
        ORDER BY piotroski_score DESC, cik
    """)


COMPETENCY_QUERIES = {
    "cq_star_profile": cq_star_profile,
    "cq_lineage_exists": cq_lineage_exists,
    "cq_optional_metrics": cq_optional_metrics,
    "cq_peer_rank_by_count": cq_peer_rank_by_count,
    "cq_leader_intersection": cq_leader_intersection,
    "cq_subclass_closure": cq_subclass_closure,
    "cq_benchmark_compare": cq_benchmark_compare,
    "cq_piotroski_style_score": cq_piotroski_style_score,
}
