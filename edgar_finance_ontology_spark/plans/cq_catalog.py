"""The reference's FULL competency-question catalog as named Spark SQL
views — one entry per CQ heading in

  docs/investment_analysis_queries.md        (CQ1.1.1 … CQ4.3.2, 20)
  docs/investment_factor_screening_queries.md (CQ-M1…M10, CQ-I1…I10,
                                               CQ-C1…C7, CQ-R1…R4, 31)
  docs/competency_questions.md               (6 reasoner CQs)

The reference answers these with SPARQL over the RDFS/OWL-closed graph
in Fuseki; we serve the same questions as SQL over the engine's tables
(SURVEY.md §3.3). Inference surfaces are materialized:

  rdfs:subClassOf+            -> efin_metric_hierarchy closure table
  computedFromMetric EXISTS   -> efin_lineage edge view (whitelist join
                                 on delimiter-bounded matches)
  owl-defined leader classes  -> efin_leader_classes view
  inverse properties          -> plain joins (the long table IS both
                                 directions)
  Duration/Instant classes    -> period_type predicate

Every query is written in the portable SQL subset shared by Spark SQL
and DuckDB, so the test suite executes the IDENTICAL string in both
engines and compares results (tests/test_cq_catalog.py) — the same
dual-engine oracle discipline as the driver gate.

Notes mirrored from the reference docs:
  * sector-scope rankings are not materialized by the reference script
    (scopes are industry + all); the Sector*Top10 leader CQs derive
    them on the fly (efin_sector_top10) with the documented
    DebtToEquity direction flip;
  * QualityFactorLeaderCompany presupposes a GraphDB tagging rule
    (factor doc §3.6); the view pins the documented intent: above
    industry-average ROE and OperatingCashFlowRatio with at-most
    industry-average DebtToEquity.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..vocab.metrics import COMPUTED_FROM_WHITELIST
from .views import metric_hierarchy

class _Year:
    """Symbolic fiscal-year token. The catalog SQL below interpolates
    `{FY}` / `{FY - 1}` as placeholder tokens (`__FY__`, `__FY-1__`),
    which `render_fy` resolves to a concrete year — so the whole
    catalog is parameterized by fiscal year (build_cq_catalog(fy))
    without touching a single query string."""

    def __init__(self, off: int = 0):
        self.off = off

    def __sub__(self, n: int) -> "_Year":
        return _Year(self.off - n)

    def __add__(self, n: int) -> "_Year":
        return _Year(self.off + n)

    def __str__(self) -> str:
        return f"__FY{self.off:+d}__" if self.off else "__FY__"

    def __format__(self, spec: str) -> str:
        return str(self)


FY = _Year()

_FY_TOKEN = re.compile(r"__FY(?:([+-]\d+))?__")

DEFAULT_FY = 2024


def render_fy(sql: str, fy: int) -> str:
    """Resolve every __FY__ / __FY±k__ token to a concrete year."""
    return _FY_TOKEN.sub(lambda m: str(fy + int(m.group(1) or 0)), sql)

# ---------------------------------------------------------------------
# support views (created identically in Spark and DuckDB, over the base
# tables efin_observations / efin_companies / efin_benchmarks /
# efin_rankings / efin_metric_hierarchy / efin_source_metrics)
# ---------------------------------------------------------------------

SUPPORT_VIEWS: list[tuple[str, str]] = [
    # DerivedRatio-hierarchy observations for the focal year
    ("efin_ratio_obs", f"""
        SELECT o.cik, o.symbol, o.name, o.sector, o.industry, o.fy,
               o.metric, o.value, o.is_derived, o.confidence,
               o.computed_from
        FROM efin_observations o
        JOIN efin_metric_hierarchy h
          ON o.metric = h.metric AND h.ancestor = 'DerivedRatio'
        WHERE o.fy = {FY} AND o.value IS NOT NULL
    """),
    # per-(industry, metric) averages over the ratio universe
    ("efin_industry_metric_avg", """
        SELECT industry, metric, avg(value) AS industry_avg
        FROM efin_ratio_obs
        WHERE industry <> ''
        GROUP BY 1, 2
    """),
    # lineage edges: derived observation -> whitelisted source metric.
    # Delimiter-bounded match on the normalized computed_from string
    # (',Equity,' / ',Equity(' — never the bare substring, so 'Assets'
    # does not match 'CurrentAssets').
    ("efin_lineage", """
        SELECT o.cik, o.symbol, o.fy, o.metric, s.source AS source_metric
        FROM efin_observations o
        JOIN efin_source_metrics s
          ON (',' || replace(replace(o.computed_from, ' ', ''), ';', ',')
                  || ',') LIKE ('%,' || s.source || ',%')
          OR (',' || replace(replace(o.computed_from, ' ', ''), ';', ',')
                  || ',') LIKE ('%,' || s.source || '(%')
        WHERE o.is_derived AND o.computed_from <> ''
          AND o.computed_from <> 'direct-growth'
    """),
    # sector-scope Top10 (derived; direction flip for DebtToEquity)
    ("efin_sector_top10", f"""
        SELECT sector, metric, cik, symbol, name, value, rnk AS rank
        FROM (
          SELECT o.sector, o.metric, o.cik, o.symbol, o.name, o.value,
                 row_number() OVER (
                   PARTITION BY o.sector, o.metric
                   ORDER BY CASE WHEN o.metric = 'DebtToEquity'
                                 THEN o.value ELSE -o.value END ASC,
                            o.cik ASC
                 ) AS rnk
          FROM efin_observations o
          WHERE o.fy = {FY} AND o.sector <> '' AND o.value IS NOT NULL
            AND o.metric IN ('ROE', 'NetProfitMargin', 'DebtToEquity',
                             'CurrentRatio', 'RevenueGrowthYoY',
                             'NetIncomeGrowthYoY', 'CFOGrowthYoY',
                             'OperatingCashFlowRatio', 'Revenue',
                             'Composite')
        ) t
        WHERE rnk <= 10
    """),
    # industry Top10 beyond the materialized rankings: the docs'
    # leader CQs reference Revenue / OperatingCashFlowRatio /
    # NetIncomeGrowthYoY industry rankings, which the reference
    # pipeline never materializes (it ranks only the six KEY metrics +
    # Composite) — derived on the fly from observations, doc semantics.
    ("efin_industry_top10_extra", f"""
        SELECT industry, metric, cik, symbol, rnk AS rank
        FROM (
          SELECT o.industry, o.metric, o.cik, o.symbol,
                 row_number() OVER (
                   PARTITION BY o.industry, o.metric
                   ORDER BY o.value DESC, o.cik ASC
                 ) AS rnk
          FROM efin_observations o
          WHERE o.fy = {FY} AND o.industry <> '' AND o.value IS NOT NULL
            AND o.metric IN ('Revenue', 'OperatingCashFlowRatio',
                             'NetIncomeGrowthYoY')
        ) t
        WHERE rnk <= 10
    """),
    # the full industry-scope Top10 surface (materialized + derived)
    ("efin_industry_top10", """
        SELECT industry, metric, cik, symbol, rank
        FROM efin_rankings
        WHERE ranking_type = 'Top10' AND industry <> ''
        UNION ALL
        SELECT industry, metric, cik, symbol, rank
        FROM efin_industry_top10_extra
    """),
    # leader classes: the OWL-defined *Top10LeaderCompany memberships.
    # Industry scope from the full industry Top10 surface; All scope
    # from the materialized rankings; Sector scope from
    # efin_sector_top10; class token strips the YoY suffix
    # (SectorRevenueGrowthTop10LeaderCompany in the docs).
    ("efin_leader_classes", """
        SELECT cik, symbol, industry, '' AS sector,
               'Industry' || replace(metric, 'YoY', '')
                 || 'Top10LeaderCompany' AS leader_class,
               rank
        FROM efin_industry_top10
        UNION ALL
        SELECT cik, symbol, industry, sector,
               'All' || replace(metric, 'YoY', '') || 'Top10LeaderCompany'
                 AS leader_class,
               rank
        FROM efin_rankings
        WHERE ranking_type = 'Top10' AND industry = ''
        UNION ALL
        SELECT t.cik, t.symbol, '' AS industry, t.sector,
               'Sector' || replace(t.metric, 'YoY', '')
                 || 'Top10LeaderCompany' AS leader_class,
               t.rank
        FROM efin_sector_top10 t
    """),
    # quality-factor tag (documented stand-in for the GraphDB rule)
    ("efin_quality_leaders", f"""
        SELECT w.cik, w.symbol, w.industry,
               'QualityFactorLeaderCompany' AS leader_class
        FROM (
          SELECT o.cik, o.symbol, o.industry, o.metric, o.value
          FROM efin_observations o
          WHERE o.fy = {FY} AND o.industry <> ''
            AND o.metric IN ('ROE', 'OperatingCashFlowRatio',
                             'DebtToEquity')
        ) w
        JOIN efin_industry_metric_avg a
          ON a.industry = w.industry AND a.metric = w.metric
        GROUP BY 1, 2, 3
        HAVING count(*) FILTER (WHERE w.metric = 'ROE'
                                  AND w.value > a.industry_avg) > 0
           AND count(*) FILTER (WHERE w.metric = 'OperatingCashFlowRatio'
                                  AND w.value > a.industry_avg) > 0
           AND count(*) FILTER (WHERE w.metric = 'DebtToEquity'
                                  AND w.value <= a.industry_avg) > 0
    """),
]


def _obs(metric: str, alias: str, fy: int | _Year = FY) -> str:
    """Star-BGP leg: one observation of `metric` per company."""
    return (f"(SELECT cik, value AS {alias} FROM efin_observations "
            f"WHERE metric = '{metric}' AND fy = {fy}) {alias}_t")


# ---------------------------------------------------------------------
# the catalog
# ---------------------------------------------------------------------

CQ_CATALOG: dict[str, str] = {}

# ============== investment_analysis_queries.md (20) ==================

CQ_CATALOG["cq1_1_1_core_metrics_vs_industry"] = f"""
SELECT c.cik, c.symbol AS ticker, c.name, c.industry, c.sector,
       roe_t.roe, roic_t.roic, net_margin_t.net_margin,
       debt_to_equity_t.debt_to_equity, current_ratio_t.current_ratio,
       round(ia.avg_roe, 6) AS industry_avg_roe,
       round(ia.avg_roic, 6) AS industry_avg_roic,
       round(ia.avg_margin, 6) AS industry_avg_margin
FROM efin_companies c
JOIN {_obs('ROE', 'roe')} ON roe_t.cik = c.cik
JOIN {_obs('ROIC', 'roic')} ON roic_t.cik = c.cik
JOIN {_obs('NetProfitMargin', 'net_margin')} ON net_margin_t.cik = c.cik
JOIN {_obs('DebtToEquity', 'debt_to_equity')} ON debt_to_equity_t.cik = c.cik
JOIN {_obs('CurrentRatio', 'current_ratio')} ON current_ratio_t.cik = c.cik
JOIN (
  SELECT o1.industry, avg(o1.value) AS avg_roe, avg(o2.value) AS avg_roic,
         avg(o3.value) AS avg_margin
  FROM efin_observations o1
  JOIN efin_observations o2
    ON o2.cik = o1.cik AND o2.metric = 'ROIC' AND o2.fy = {FY}
  JOIN efin_observations o3
    ON o3.cik = o1.cik AND o3.metric = 'NetProfitMargin' AND o3.fy = {FY}
  WHERE o1.metric = 'ROE' AND o1.fy = {FY} AND o1.industry <> ''
  GROUP BY 1
) ia ON ia.industry = c.industry
ORDER BY c.cik
"""

CQ_CATALOG["cq1_2_1_piotroski_fscore"] = f"""
WITH cur AS (
  SELECT cik,
         max(CASE WHEN metric = 'NetIncome' THEN value END) AS net_income,
         max(CASE WHEN metric = 'Assets' THEN value END) AS assets,
         max(CASE WHEN metric = 'CFO' THEN value END) AS cfo,
         max(CASE WHEN metric = 'CurrentRatio' THEN value END) AS current_ratio,
         max(CASE WHEN metric = 'GrossMargin' THEN value END) AS gross_margin,
         max(CASE WHEN metric = 'AssetTurnover' THEN value END) AS asset_turnover,
         max(CASE WHEN metric = 'Liabilities' THEN value END) AS liabilities
  FROM efin_observations WHERE fy = {FY} GROUP BY 1),
pri AS (
  SELECT cik,
         max(CASE WHEN metric = 'NetIncome' THEN value END) AS net_income,
         max(CASE WHEN metric = 'Assets' THEN value END) AS assets,
         max(CASE WHEN metric = 'CurrentRatio' THEN value END) AS current_ratio,
         max(CASE WHEN metric = 'GrossMargin' THEN value END) AS gross_margin,
         max(CASE WHEN metric = 'AssetTurnover' THEN value END) AS asset_turnover,
         max(CASE WHEN metric = 'Liabilities' THEN value END) AS liabilities
  FROM efin_observations WHERE fy = {FY - 1} GROUP BY 1)
SELECT c.cik, c.symbol AS ticker, c.name,
       (CASE WHEN cur.net_income / NULLIF(cur.assets, 0) > 0 THEN 1 ELSE 0 END
      + CASE WHEN cur.cfo > 0 THEN 1 ELSE 0 END
      + CASE WHEN cur.net_income / NULLIF(cur.assets, 0)
                  > pri.net_income / NULLIF(pri.assets, 0) THEN 1 ELSE 0 END
      + CASE WHEN cur.cfo > cur.net_income THEN 1 ELSE 0 END
      + CASE WHEN cur.liabilities / NULLIF(cur.assets, 0)
                  < pri.liabilities / NULLIF(pri.assets, 0) THEN 1 ELSE 0 END
      + CASE WHEN cur.current_ratio > pri.current_ratio THEN 1 ELSE 0 END
      + CASE WHEN cur.gross_margin > pri.gross_margin THEN 1 ELSE 0 END
      + CASE WHEN cur.asset_turnover > pri.asset_turnover THEN 1 ELSE 0 END)
         AS piotroski_score,
       round(cur.net_income / NULLIF(cur.assets, 0), 6) AS roa,
       cur.cfo, cur.current_ratio, cur.gross_margin, cur.asset_turnover
FROM efin_companies c
JOIN cur ON cur.cik = c.cik
JOIN pri ON pri.cik = c.cik
WHERE cur.net_income IS NOT NULL AND cur.assets IS NOT NULL
  AND cur.cfo IS NOT NULL AND cur.current_ratio IS NOT NULL
  AND cur.gross_margin IS NOT NULL AND cur.asset_turnover IS NOT NULL
  AND cur.liabilities IS NOT NULL AND pri.net_income IS NOT NULL
  AND pri.assets IS NOT NULL AND pri.current_ratio IS NOT NULL
  AND pri.gross_margin IS NOT NULL AND pri.asset_turnover IS NOT NULL
  AND pri.liabilities IS NOT NULL
ORDER BY c.cik
"""

CQ_CATALOG["cq1_3_1_profitable_growth"] = f"""
SELECT c.cik, c.symbol AS ticker, c.name,
       revenue_growth_t.revenue_growth,
       net_income_growth_t.net_income_growth,
       round(net_income_growth_t.net_income_growth
             - revenue_growth_t.revenue_growth, 6) + 0 AS growth_quality,
       nm_t2.net_margin, roe_t2.roe
FROM efin_companies c
JOIN {_obs('RevenueGrowthYoY', 'revenue_growth')}
  ON revenue_growth_t.cik = c.cik
JOIN {_obs('NetIncomeGrowthYoY', 'net_income_growth')}
  ON net_income_growth_t.cik = c.cik
JOIN (SELECT cik, value AS net_margin FROM efin_observations
      WHERE metric = 'NetProfitMargin' AND fy = {FY}) nm_t2
  ON nm_t2.cik = c.cik
JOIN (SELECT cik, value AS roe FROM efin_observations
      WHERE metric = 'ROE' AND fy = {FY}) roe_t2 ON roe_t2.cik = c.cik
ORDER BY c.cik
"""

CQ_CATALOG["cq1_4_1_cashflow_quality"] = f"""
SELECT c.cik, c.symbol AS ticker, c.name, cfo_t.cfo,
       net_income_t.net_income,
       round(cfo_t.cfo / NULLIF(net_income_t.net_income, 0), 6)
         AS cash_flow_quality,
       fcf_t.fcf, cfo_growth_t.cfo_growth
FROM efin_companies c
JOIN {_obs('CFO', 'cfo')} ON cfo_t.cik = c.cik
JOIN {_obs('NetIncome', 'net_income')} ON net_income_t.cik = c.cik
JOIN {_obs('FreeCashFlow', 'fcf')} ON fcf_t.cik = c.cik
JOIN {_obs('CFOGrowthYoY', 'cfo_growth')} ON cfo_growth_t.cik = c.cik
WHERE net_income_t.net_income > 0
ORDER BY c.cik
"""

CQ_CATALOG["cq1_5_1_lineage_quality_screen"] = f"""
WITH ia AS (
  SELECT o1.industry, avg(o1.value) AS avg_roe, avg(o2.value) AS avg_margin
  FROM efin_observations o1
  JOIN efin_observations o2
    ON o2.cik = o1.cik AND o2.metric = 'NetProfitMargin' AND o2.fy = {FY}
  WHERE o1.metric = 'ROE' AND o1.fy = {FY} AND o1.industry <> ''
  GROUP BY 1)
SELECT c.cik, c.symbol AS ticker, c.name, c.industry,
       roe.value AS roe, nm.value AS net_margin, fcf.value AS fcf,
       round(ia.avg_roe, 6) AS industry_avg_roe,
       round(ia.avg_margin, 6) AS industry_avg_margin
FROM efin_companies c
JOIN efin_observations roe
  ON roe.cik = c.cik AND roe.metric = 'ROE' AND roe.fy = {FY}
 AND roe.is_derived AND roe.confidence >= 0.9
JOIN efin_observations nm
  ON nm.cik = c.cik AND nm.metric = 'NetProfitMargin' AND nm.fy = {FY}
 AND nm.is_derived AND nm.confidence >= 0.9
LEFT JOIN (
  SELECT o.cik, o.value FROM efin_observations o
  WHERE o.metric = 'FreeCashFlow' AND o.fy = {FY} AND o.is_derived
    AND EXISTS (SELECT 1 FROM efin_lineage l WHERE l.cik = o.cik
                AND l.fy = {FY} AND l.metric = 'FreeCashFlow'
                AND l.source_metric = 'CFO')
    AND EXISTS (SELECT 1 FROM efin_lineage l WHERE l.cik = o.cik
                AND l.fy = {FY} AND l.metric = 'FreeCashFlow'
                AND l.source_metric = 'CapEx')
) fcf ON fcf.cik = c.cik
JOIN ia ON ia.industry = c.industry
WHERE EXISTS (SELECT 1 FROM efin_lineage l WHERE l.cik = c.cik
              AND l.fy = {FY} AND l.metric = 'ROE'
              AND l.source_metric = 'NetIncome')
  AND EXISTS (SELECT 1 FROM efin_lineage l WHERE l.cik = c.cik
              AND l.fy = {FY} AND l.metric = 'ROE'
              AND l.source_metric = 'Equity')
  AND EXISTS (SELECT 1 FROM efin_lineage l WHERE l.cik = c.cik
              AND l.fy = {FY} AND l.metric = 'NetProfitMargin'
              AND l.source_metric = 'NetIncome')
  AND EXISTS (SELECT 1 FROM efin_lineage l WHERE l.cik = c.cik
              AND l.fy = {FY} AND l.metric = 'NetProfitMargin'
              AND l.source_metric = 'Revenue')
  AND roe.value > ia.avg_roe + 0.05
  AND nm.value > ia.avg_margin + 0.05
ORDER BY roe.value DESC, c.cik
"""

CQ_CATALOG["cq2_1_1_roe_vs_industry"] = f"""
WITH ia AS (
  SELECT industry, avg(value) AS avg_roe, max(value) AS max_roe,
         min(value) AS min_roe
  FROM efin_observations
  WHERE metric = 'ROE' AND fy = {FY} AND industry <> ''
  GROUP BY 1)
SELECT c.cik, c.symbol AS ticker, c.name, c.industry, o.value AS roe,
       round(ia.avg_roe, 6) AS industry_avg_roe,
       ia.max_roe AS industry_max_roe, ia.min_roe AS industry_min_roe,
       round(o.value - ia.avg_roe, 6) + 0 AS vs_industry_avg,
       round(o.value / NULLIF(ia.avg_roe, 0) - 1, 6) + 0 AS vs_industry_pct
FROM efin_companies c
JOIN efin_observations o
  ON o.cik = c.cik AND o.metric = 'ROE' AND o.fy = {FY}
JOIN ia ON ia.industry = c.industry
ORDER BY c.cik
"""

CQ_CATALOG["cq2_1_2_margin_rank_in_industry"] = f"""
WITH m AS (
  SELECT cik, industry, value FROM efin_observations
  WHERE metric = 'NetProfitMargin' AND fy = {FY} AND industry <> '')
SELECT c.cik, c.symbol AS ticker, c.name, c.industry,
       me.value AS net_margin,
       (SELECT count(*) FROM m h
        WHERE h.industry = me.industry AND h.value > me.value)
         AS rank_in_industry,
       (SELECT count(DISTINCT cik) FROM m t
        WHERE t.industry = me.industry AND t.cik <> me.cik)
         AS total_peers_in_industry
FROM efin_companies c
JOIN m me ON me.cik = c.cik
ORDER BY rank_in_industry, c.cik
"""

CQ_CATALOG["cq2_2_1_efficiency_vs_industry"] = f"""
WITH ia AS (
  SELECT industry,
         avg(CASE WHEN metric = 'AssetTurnover' THEN value END) AS avg_at,
         avg(CASE WHEN metric = 'InventoryTurnover' THEN value END) AS avg_it,
         avg(CASE WHEN metric = 'ReceivablesTurnover' THEN value END) AS avg_rt
  FROM efin_observations
  WHERE fy = {FY} AND industry <> ''
    AND metric IN ('AssetTurnover', 'InventoryTurnover',
                   'ReceivablesTurnover')
  GROUP BY 1)
SELECT c.cik, c.symbol AS ticker, c.name, c.industry,
       at_o.value AS asset_turnover, it_o.value AS inventory_turnover,
       rt_o.value AS receivables_turnover,
       round(ia.avg_at, 6) AS industry_avg_asset_turnover,
       round(ia.avg_it, 6) AS industry_avg_inventory_turnover,
       round(ia.avg_rt, 6) AS industry_avg_receivables_turnover
FROM efin_companies c
JOIN efin_observations at_o
  ON at_o.cik = c.cik AND at_o.metric = 'AssetTurnover' AND at_o.fy = {FY}
LEFT JOIN efin_observations it_o
  ON it_o.cik = c.cik AND it_o.metric = 'InventoryTurnover'
 AND it_o.fy = {FY}
LEFT JOIN efin_observations rt_o
  ON rt_o.cik = c.cik AND rt_o.metric = 'ReceivablesTurnover'
 AND rt_o.fy = {FY}
JOIN ia ON ia.industry = c.industry
ORDER BY c.cik
"""

CQ_CATALOG["cq2_3_1_leverage_vs_industry"] = f"""
WITH ia AS (
  SELECT industry,
         avg(CASE WHEN metric = 'DebtToEquity' THEN value END) AS avg_de,
         avg(CASE WHEN metric = 'InterestCoverage' AND value > 0
                  THEN value END) AS avg_ic
  FROM efin_observations
  WHERE fy = {FY} AND industry <> ''
    AND metric IN ('DebtToEquity', 'InterestCoverage')
  GROUP BY 1)
SELECT c.cik, c.symbol AS ticker, c.name, c.industry,
       de_o.value AS debt_to_equity, ic_o.value AS interest_coverage,
       round(ia.avg_de, 6) AS industry_avg_debt_to_equity,
       round(ia.avg_ic, 6) AS industry_avg_interest_coverage,
       round(de_o.value - ia.avg_de, 6) + 0 AS debt_vs_industry
FROM efin_companies c
JOIN efin_observations de_o
  ON de_o.cik = c.cik AND de_o.metric = 'DebtToEquity' AND de_o.fy = {FY}
LEFT JOIN efin_observations ic_o
  ON ic_o.cik = c.cik AND ic_o.metric = 'InterestCoverage'
 AND ic_o.fy = {FY}
JOIN ia ON ia.industry = c.industry
ORDER BY c.cik
"""

CQ_CATALOG["cq2_3_2_roe_vs_roic"] = f"""
WITH ia AS (
  SELECT o1.industry, avg(o1.value) AS avg_roe, avg(o2.value) AS avg_roic
  FROM efin_observations o1
  JOIN efin_observations o2
    ON o2.cik = o1.cik AND o2.metric = 'ROIC' AND o2.fy = {FY}
  WHERE o1.metric = 'ROE' AND o1.fy = {FY} AND o1.industry <> ''
  GROUP BY 1)
SELECT c.cik, c.symbol AS ticker, c.name, c.industry,
       roe_o.value AS roe, roic_o.value AS roic,
       round(roe_o.value - roic_o.value, 6) + 0 AS leverage_effect,
       round(ia.avg_roe, 6) AS industry_avg_roe,
       round(ia.avg_roic, 6) AS industry_avg_roic,
       round(ia.avg_roe - ia.avg_roic, 6) + 0 AS industry_avg_leverage_effect
FROM efin_companies c
JOIN efin_observations roe_o
  ON roe_o.cik = c.cik AND roe_o.metric = 'ROE' AND roe_o.fy = {FY}
JOIN efin_observations roic_o
  ON roic_o.cik = c.cik AND roic_o.metric = 'ROIC' AND roic_o.fy = {FY}
JOIN ia ON ia.industry = c.industry
ORDER BY c.cik
"""

CQ_CATALOG["cq2_5_1_multi_ratio_screen"] = f"""
WITH ia AS (
  SELECT industry,
         avg(CASE WHEN metric = 'ROE' THEN value END) AS avg_roe,
         avg(CASE WHEN metric = 'NetProfitMargin' THEN value END) AS avg_m,
         avg(CASE WHEN metric = 'AssetTurnover' THEN value END) AS avg_at,
         avg(CASE WHEN metric = 'DebtToEquity' THEN value END) AS avg_de
  FROM efin_observations
  WHERE fy = {FY} AND industry <> ''
    AND metric IN ('ROE', 'NetProfitMargin', 'AssetTurnover',
                   'DebtToEquity')
  GROUP BY 1)
SELECT c.cik, c.symbol AS ticker, c.name, c.industry,
       roe_o.value AS roe, nm_o.value AS net_margin,
       at_o.value AS asset_turnover, de_o.value AS debt_to_equity,
       round(ia.avg_roe, 6) AS avg_roe, round(ia.avg_m, 6) AS avg_margin,
       round(ia.avg_at, 6) AS avg_at, round(ia.avg_de, 6) AS avg_de
FROM efin_companies c
JOIN efin_observations roe_o
  ON roe_o.cik = c.cik AND roe_o.metric = 'ROE' AND roe_o.fy = {FY}
JOIN efin_observations nm_o
  ON nm_o.cik = c.cik AND nm_o.metric = 'NetProfitMargin'
 AND nm_o.fy = {FY}
LEFT JOIN efin_observations at_o
  ON at_o.cik = c.cik AND at_o.metric = 'AssetTurnover' AND at_o.fy = {FY}
LEFT JOIN efin_observations de_o
  ON de_o.cik = c.cik AND de_o.metric = 'DebtToEquity' AND de_o.fy = {FY}
JOIN ia ON ia.industry = c.industry
WHERE roe_o.value >= ia.avg_roe
  AND nm_o.value >= ia.avg_m
  AND (at_o.value IS NULL OR at_o.value >= ia.avg_at)
  AND (de_o.value IS NULL OR de_o.value <= ia.avg_de)
ORDER BY c.industry, roe_o.value DESC, c.cik
"""

CQ_CATALOG["cq3_1_1_roe_trend"] = f"""
SELECT c.cik, c.symbol AS ticker, c.name, o.fy, o.value AS roe,
       round(o.value - p.value, 6) + 0 AS roe_change
FROM efin_companies c
JOIN efin_observations o
  ON o.cik = c.cik AND o.metric = 'ROE'
LEFT JOIN efin_observations p
  ON p.cik = c.cik AND p.metric = 'ROE' AND p.fy = o.fy - 1
WHERE o.fy >= {FY - 4} AND o.fy <= {FY}
ORDER BY c.cik, o.fy
"""

CQ_CATALOG["cq3_1_2_margin_trends"] = f"""
SELECT c.cik, c.symbol AS ticker, c.name, g.fy,
       g.value AS gross_margin, op.value AS operating_margin,
       nm.value AS net_margin
FROM efin_companies c
JOIN efin_observations g ON g.cik = c.cik AND g.metric = 'GrossMargin'
JOIN efin_observations op
  ON op.cik = c.cik AND op.metric = 'OperatingMargin' AND op.fy = g.fy
JOIN efin_observations nm
  ON nm.cik = c.cik AND nm.metric = 'NetProfitMargin' AND nm.fy = g.fy
WHERE g.fy >= {FY - 4} AND g.fy <= {FY}
ORDER BY c.cik, g.fy
"""

CQ_CATALOG["cq3_2_1_growth_stability"] = f"""
SELECT c.cik, c.symbol AS ticker, c.name, rg.fy,
       rg.value AS revenue_growth, ng.value AS net_income_growth,
       cg.value AS cfo_growth,
       round(ng.value - rg.value, 6) + 0 AS growth_quality
FROM efin_companies c
JOIN efin_observations rg
  ON rg.cik = c.cik AND rg.metric = 'RevenueGrowthYoY'
LEFT JOIN efin_observations ng
  ON ng.cik = c.cik AND ng.metric = 'NetIncomeGrowthYoY' AND ng.fy = rg.fy
LEFT JOIN efin_observations cg
  ON cg.cik = c.cik AND cg.metric = 'CFOGrowthYoY' AND cg.fy = rg.fy
WHERE rg.fy >= {FY - 4} AND rg.fy <= {FY}
ORDER BY c.cik, rg.fy
"""

CQ_CATALOG["cq3_3_1_efficiency_trend"] = f"""
SELECT c.cik, c.symbol AS ticker, c.name, a.fy,
       a.value AS asset_turnover, i.value AS inventory_turnover,
       r.value AS receivables_turnover
FROM efin_companies c
JOIN efin_observations a ON a.cik = c.cik AND a.metric = 'AssetTurnover'
LEFT JOIN efin_observations i
  ON i.cik = c.cik AND i.metric = 'InventoryTurnover' AND i.fy = a.fy
LEFT JOIN efin_observations r
  ON r.cik = c.cik AND r.metric = 'ReceivablesTurnover' AND r.fy = a.fy
WHERE a.fy >= {FY - 4} AND a.fy <= {FY}
ORDER BY c.cik, a.fy
"""

CQ_CATALOG["cq3_4_1_trend_screen"] = f"""
SELECT c.cik, c.symbol AS ticker, c.name,
       round(avg(rg.value), 6) AS avg_revenue_growth,
       round(avg(ng.value), 6) AS avg_net_income_growth,
       round(avg(cg.value), 6) AS avg_cfo_growth,
       round(avg(nm.value), 6) AS avg_net_margin,
       round(max(roe.value) - min(roe.value), 6) + 0 AS roe_improvement
FROM efin_companies c
JOIN efin_observations rg
  ON rg.cik = c.cik AND rg.metric = 'RevenueGrowthYoY'
 AND rg.fy BETWEEN {FY - 4} AND {FY}
LEFT JOIN efin_observations ng
  ON ng.cik = c.cik AND ng.metric = 'NetIncomeGrowthYoY' AND ng.fy = rg.fy
LEFT JOIN efin_observations cg
  ON cg.cik = c.cik AND cg.metric = 'CFOGrowthYoY' AND cg.fy = rg.fy
LEFT JOIN efin_observations nm
  ON nm.cik = c.cik AND nm.metric = 'NetProfitMargin' AND nm.fy = rg.fy
LEFT JOIN efin_observations roe
  ON roe.cik = c.cik AND roe.metric = 'ROE' AND roe.fy = rg.fy
GROUP BY 1, 2, 3
HAVING avg(rg.value) > 0.0
   AND (avg(ng.value) IS NULL OR avg(ng.value) > 0.0)
   AND (avg(cg.value) IS NULL OR avg(cg.value) > 0.0)
   AND (avg(nm.value) IS NULL OR avg(nm.value) > 0.0)
   AND (max(roe.value) IS NULL
        OR max(roe.value) - min(roe.value) >= 0.0)
ORDER BY avg_revenue_growth DESC, c.cik
"""

CQ_CATALOG["cq4_1_1_dupont"] = f"""
SELECT c.cik, c.symbol AS ticker, c.name, roe_o.value AS roe,
       nm_o.value AS net_margin, at_o.value AS asset_turnover,
       er_o.value AS equity_ratio,
       round(nm_o.value * at_o.value / NULLIF(er_o.value, 0), 6)
         AS calculated_roe,
       round(nm_o.value * at_o.value / NULLIF(er_o.value, 0)
             - roe_o.value, 6) + 0 AS roe_difference
FROM efin_companies c
JOIN efin_observations roe_o
  ON roe_o.cik = c.cik AND roe_o.metric = 'ROE' AND roe_o.fy = {FY}
JOIN efin_observations nm_o
  ON nm_o.cik = c.cik AND nm_o.metric = 'NetProfitMargin'
 AND nm_o.fy = {FY}
JOIN efin_observations at_o
  ON at_o.cik = c.cik AND at_o.metric = 'AssetTurnover' AND at_o.fy = {FY}
JOIN efin_observations er_o
  ON er_o.cik = c.cik AND er_o.metric = 'EquityRatio' AND er_o.fy = {FY}
ORDER BY c.cik
"""

CQ_CATALOG["cq4_2_1_lineage_trace"] = f"""
SELECT c.cik, c.symbol AS ticker, c.name,
       l.metric AS derived_metric, l.source_metric
FROM efin_companies c
JOIN efin_lineage l ON l.cik = c.cik AND l.fy = {FY}
ORDER BY l.metric, l.source_metric, c.cik
"""

CQ_CATALOG["cq4_3_1_industry_quality_screen"] = (
    CQ_CATALOG["cq1_5_1_lineage_quality_screen"]
)

CQ_CATALOG["cq4_3_2_sector_low_leverage_screen"] = f"""
WITH sa AS (
  SELECT sector,
         avg(CASE WHEN metric = 'DebtToEquity' THEN value END) AS avg_de,
         avg(CASE WHEN metric = 'InterestCoverage' THEN value END) AS avg_ic
  FROM efin_observations
  WHERE fy = {FY} AND sector <> ''
    AND metric IN ('DebtToEquity', 'InterestCoverage')
  GROUP BY 1)
SELECT c.cik, c.symbol AS ticker, c.name, c.sector,
       de_o.value AS debt_to_equity, ic_o.value AS interest_coverage,
       round(sa.avg_de, 6) AS sector_avg_debt_to_equity,
       round(sa.avg_ic, 6) AS sector_avg_interest_coverage
FROM efin_companies c
JOIN efin_observations de_o
  ON de_o.cik = c.cik AND de_o.metric = 'DebtToEquity' AND de_o.fy = {FY}
 AND de_o.is_derived
LEFT JOIN (
  SELECT o.cik, o.value FROM efin_observations o
  WHERE o.metric = 'InterestCoverage' AND o.fy = {FY} AND o.is_derived
    AND EXISTS (SELECT 1 FROM efin_lineage l WHERE l.cik = o.cik
                AND l.fy = {FY} AND l.metric = 'InterestCoverage'
                AND l.source_metric = 'InterestExpense')
    AND EXISTS (SELECT 1 FROM efin_lineage l WHERE l.cik = o.cik
                AND l.fy = {FY} AND l.metric = 'InterestCoverage'
                AND l.source_metric = 'OperatingIncome')
) ic_o ON ic_o.cik = c.cik
JOIN sa ON sa.sector = c.sector
WHERE (EXISTS (SELECT 1 FROM efin_lineage l WHERE l.cik = c.cik
               AND l.fy = {FY} AND l.metric = 'DebtToEquity'
               AND l.source_metric = 'LongTermDebt')
    OR EXISTS (SELECT 1 FROM efin_lineage l WHERE l.cik = c.cik
               AND l.fy = {FY} AND l.metric = 'DebtToEquity'
               AND l.source_metric = 'ShortTermDebt')
    OR EXISTS (SELECT 1 FROM efin_lineage l WHERE l.cik = c.cik
               AND l.fy = {FY} AND l.metric = 'DebtToEquity'
               AND l.source_metric = 'DebtCurrent'))
  AND EXISTS (SELECT 1 FROM efin_lineage l WHERE l.cik = c.cik
              AND l.fy = {FY} AND l.metric = 'DebtToEquity'
              AND l.source_metric = 'Equity')
  AND de_o.value < sa.avg_de * 0.7
  AND (ic_o.value IS NULL OR ic_o.value >= sa.avg_ic)
ORDER BY de_o.value, ic_o.value DESC, c.cik
"""

# ========== investment_factor_screening_queries.md §1 (M1-M10) ========

CQ_CATALOG["cq_m1_multi_factor_above_avg"] = """
WITH hits AS (
  SELECT r.cik, count(DISTINCT r.metric) AS num_ratios_above_avg
  FROM efin_ratio_obs r
  JOIN efin_industry_metric_avg a
    ON a.industry = r.industry AND a.metric = r.metric
  WHERE r.value >= a.industry_avg
  GROUP BY 1
  HAVING count(DISTINCT r.metric) >= 4)
SELECT c.cik, c.symbol AS ticker, c.name, c.industry,
       h.num_ratios_above_avg
FROM hits h JOIN efin_companies c ON c.cik = h.cik
ORDER BY h.num_ratios_above_avg DESC, c.cik
"""

CQ_CATALOG["cq_m2_factor_coverage_universe"] = """
SELECT c.cik, c.symbol AS ticker, c.name,
       count(DISTINCT r.metric) AS num_derived_ratios
FROM efin_companies c
JOIN efin_ratio_obs r ON r.cik = c.cik
GROUP BY 1, 2, 3
HAVING count(DISTINCT r.metric) >= 8
ORDER BY num_derived_ratios DESC, c.cik
"""

CQ_CATALOG["cq_m3_aggregate_factor_score"] = """
SELECT c.cik, c.symbol AS ticker, c.name,
       round(sum(r.value / a.industry_avg), 6) AS factor_score
FROM efin_companies c
JOIN efin_ratio_obs r ON r.cik = c.cik
JOIN efin_industry_metric_avg a
  ON a.industry = r.industry AND a.metric = r.metric
WHERE a.industry_avg <> 0
GROUP BY 1, 2, 3
HAVING sum(r.value / a.industry_avg) >= 5.0
ORDER BY factor_score DESC, c.cik
"""

CQ_CATALOG["cq_m4_most_discriminating_factor"] = """
SELECT industry, metric, round(avg(value), 6) AS avg_value,
       round(max(value) - min(value), 6) + 0 AS spread
FROM efin_ratio_obs
WHERE industry <> ''
GROUP BY 1, 2
HAVING count(DISTINCT cik) >= 2
ORDER BY spread DESC, industry, metric
LIMIT 20
"""

CQ_CATALOG["cq_m5_leveraged_profitability"] = """
WITH a AS (SELECT industry, metric, industry_avg
           FROM efin_industry_metric_avg)
SELECT c.cik, c.symbol AS ticker, c.name, c.industry,
       roe.value AS roe, nm.value AS net_margin, de.value AS de
FROM efin_companies c
JOIN efin_ratio_obs roe ON roe.cik = c.cik AND roe.metric = 'ROE'
JOIN efin_ratio_obs nm
  ON nm.cik = c.cik AND nm.metric = 'NetProfitMargin'
JOIN efin_ratio_obs de ON de.cik = c.cik AND de.metric = 'DebtToEquity'
JOIN a ar ON ar.industry = c.industry AND ar.metric = 'ROE'
JOIN a am ON am.industry = c.industry AND am.metric = 'NetProfitMargin'
JOIN a ad ON ad.industry = c.industry AND ad.metric = 'DebtToEquity'
WHERE roe.value >= ar.industry_avg * 1.2
  AND nm.value >= am.industry_avg * 1.2
  AND de.value >= ad.industry_avg * 1.3
ORDER BY roe.value DESC, c.cik
"""

CQ_CATALOG["cq_m6_strong_factor_count"] = """
SELECT c.cik, c.symbol AS ticker, c.name,
       count(DISTINCT r.metric) AS num_strong_factors
FROM efin_companies c
JOIN efin_ratio_obs r ON r.cik = c.cik
JOIN efin_industry_metric_avg a
  ON a.industry = r.industry AND a.metric = r.metric
WHERE a.industry_avg <> 0 AND r.value >= a.industry_avg * 1.5
GROUP BY 1, 2, 3
HAVING count(DISTINCT r.metric) >= 6
ORDER BY num_strong_factors DESC, c.cik
"""

CQ_CATALOG["cq_m7_few_weak_factors"] = """
SELECT c.cik, c.symbol AS ticker, c.name,
       count(DISTINCT r.metric) AS num_weak_factors
FROM efin_companies c
JOIN efin_ratio_obs r ON r.cik = c.cik
JOIN efin_industry_metric_avg a
  ON a.industry = r.industry AND a.metric = r.metric
WHERE r.value < a.industry_avg
GROUP BY 1, 2, 3
HAVING count(DISTINCT r.metric) <= 3
ORDER BY num_weak_factors ASC, c.cik
"""

CQ_CATALOG["cq_m8_strongest_weakest_factor"] = """
SELECT c.cik, c.symbol AS ticker, c.name, r.metric,
       round(r.value / a.industry_avg, 6) AS score
FROM efin_companies c
JOIN efin_ratio_obs r ON r.cik = c.cik
JOIN efin_industry_metric_avg a
  ON a.industry = r.industry AND a.metric = r.metric
WHERE a.industry_avg <> 0
ORDER BY c.cik, score DESC, r.metric
"""

CQ_CATALOG["cq_m9_growth_tilt"] = """
WITH ia AS (
  SELECT industry,
         avg(CASE WHEN metric = 'RevenueGrowthYoY' THEN value END) AS avg_revg,
         avg(CASE WHEN metric = 'NetIncomeGrowthYoY' THEN value END) AS avg_nig,
         avg(CASE WHEN metric = 'CFOGrowthYoY' THEN value END) AS avg_cfog,
         avg(CASE WHEN metric = 'AssetGrowthRate' THEN value END) AS avg_assetg,
         avg(CASE WHEN metric = 'ROE' THEN value END) AS avg_roe,
         avg(CASE WHEN metric = 'NetProfitMargin' THEN value END) AS avg_margin
  FROM efin_ratio_obs WHERE industry <> '' GROUP BY 1)
SELECT c.cik, c.symbol AS ticker, c.name,
       rg.value AS revg, ng.value AS nig, cg.value AS cfog,
       ag.value AS assetg, roe.value AS roe, nm.value AS net_margin
FROM efin_companies c
JOIN efin_ratio_obs rg
  ON rg.cik = c.cik AND rg.metric = 'RevenueGrowthYoY'
JOIN efin_ratio_obs ng
  ON ng.cik = c.cik AND ng.metric = 'NetIncomeGrowthYoY'
JOIN efin_ratio_obs cg ON cg.cik = c.cik AND cg.metric = 'CFOGrowthYoY'
JOIN efin_ratio_obs ag
  ON ag.cik = c.cik AND ag.metric = 'AssetGrowthRate'
JOIN efin_ratio_obs roe ON roe.cik = c.cik AND roe.metric = 'ROE'
JOIN efin_ratio_obs nm
  ON nm.cik = c.cik AND nm.metric = 'NetProfitMargin'
JOIN ia ON ia.industry = c.industry
WHERE rg.value > ia.avg_revg AND ng.value > ia.avg_nig
  AND cg.value > ia.avg_cfog AND ag.value > ia.avg_assetg
  AND (roe.value <= ia.avg_roe OR nm.value <= ia.avg_margin)
ORDER BY rg.value DESC, c.cik
"""

CQ_CATALOG["cq_m10_balanced_factors"] = """
WITH scored AS (
  SELECT r.cik, r.metric, r.value / a.industry_avg AS score
  FROM efin_ratio_obs r
  JOIN efin_industry_metric_avg a
    ON a.industry = r.industry AND a.metric = r.metric
  WHERE a.industry_avg <> 0),
near_avg AS (
  SELECT cik, count(DISTINCT metric) AS num_near_avg
  FROM scored WHERE score >= 0.8 AND score <= 1.2 GROUP BY 1),
extreme AS (
  SELECT cik, count(DISTINCT metric) AS num_extreme
  FROM scored WHERE score >= 2.0 OR score <= 0.5 GROUP BY 1)
SELECT c.cik, c.symbol AS ticker, c.name,
       n.num_near_avg,
       coalesce(e.num_extreme, 0) AS num_extreme
FROM efin_companies c
JOIN near_avg n ON n.cik = c.cik
LEFT JOIN extreme e ON e.cik = c.cik
WHERE n.num_near_avg >= 6 AND coalesce(e.num_extreme, 0) <= 1
ORDER BY n.num_near_avg DESC, num_extreme, c.cik
"""

# ========== investment_factor_screening_queries.md §2 (I1-I10) ========

CQ_CATALOG["cq_i1_sector_peer_comparison"] = f"""
SELECT p.cik AS peer, p.symbol AS peer_ticker, p.name AS peer_name,
       p.industry AS peer_industry, roe.value AS roe,
       nm.value AS net_margin
FROM efin_companies t
JOIN efin_companies p ON p.sector = t.sector
LEFT JOIN efin_observations roe
  ON roe.cik = p.cik AND roe.metric = 'ROE' AND roe.fy = {FY}
LEFT JOIN efin_observations nm
  ON nm.cik = p.cik AND nm.metric = 'NetProfitMargin' AND nm.fy = {FY}
WHERE t.cik = (SELECT min(cik) FROM efin_companies)
ORDER BY roe.value DESC, p.cik
"""

CQ_CATALOG["cq_i2_sector_leader_industries"] = f"""
SELECT i.sector, o.industry, round(avg(o.value), 6) AS avg_roe
FROM efin_observations o
JOIN efin_industry_sector i ON i.industry = o.industry
WHERE o.metric = 'ROE' AND o.fy = {FY}
GROUP BY 1, 2
HAVING count(DISTINCT o.cik) >= 1
ORDER BY i.sector, avg_roe DESC, o.industry
"""

CQ_CATALOG["cq_i3_sector_strong_industry_weak"] = f"""
WITH sa AS (
  SELECT sector, avg(value) AS sector_avg_roe FROM efin_observations
  WHERE metric = 'ROE' AND fy = {FY} AND sector <> '' GROUP BY 1),
ia AS (
  SELECT industry, avg(value) AS industry_avg_roe FROM efin_observations
  WHERE metric = 'ROE' AND fy = {FY} AND industry <> '' GROUP BY 1)
SELECT c.cik, c.symbol AS ticker, c.name, c.industry, c.sector,
       o.value AS roe,
       round(sa.sector_avg_roe, 6) AS sector_avg_roe,
       round(ia.industry_avg_roe, 6) AS industry_avg_roe
FROM efin_companies c
JOIN efin_observations o
  ON o.cik = c.cik AND o.metric = 'ROE' AND o.fy = {FY}
JOIN sa ON sa.sector = c.sector
JOIN ia ON ia.industry = c.industry
WHERE o.value > sa.sector_avg_roe AND o.value < ia.industry_avg_roe
ORDER BY o.value DESC, c.cik
"""

CQ_CATALOG["cq_i4_sector_leverage_tail_risk"] = f"""
WITH sa AS (
  SELECT i.sector, avg(o.value) AS sector_avg_de
  FROM efin_observations o
  JOIN efin_industry_sector i ON i.industry = o.industry
  WHERE o.metric = 'DebtToEquity' AND o.fy = {FY} GROUP BY 1),
ia AS (
  SELECT industry, avg(value) AS industry_avg_de FROM efin_observations
  WHERE metric = 'DebtToEquity' AND fy = {FY} AND industry <> ''
  GROUP BY 1)
SELECT i.sector, c.industry, c.cik, c.symbol AS ticker, c.name,
       o.value AS de,
       round(sa.sector_avg_de, 6) AS sector_avg_de,
       round(ia.industry_avg_de, 6) AS industry_avg_de
FROM efin_companies c
JOIN efin_industry_sector i ON i.industry = c.industry
JOIN efin_observations o
  ON o.cik = c.cik AND o.metric = 'DebtToEquity' AND o.fy = {FY}
JOIN sa ON sa.sector = i.sector
JOIN ia ON ia.industry = c.industry
WHERE ia.industry_avg_de >= sa.sector_avg_de * 1.1
  AND o.value >= ia.industry_avg_de * 1.3
ORDER BY i.sector, industry_avg_de DESC, de DESC, c.cik
"""

CQ_CATALOG["cq_i5_sector_rotation_candidates"] = f"""
SELECT i.sector,
       round(avg(roe.value), 6) AS avg_roe,
       round(avg(nm.value), 6) AS avg_net_margin,
       round(avg(de.value), 6) AS avg_debt_to_equity,
       round(avg(roe.value) + avg(nm.value) - avg(de.value), 6) + 0
         AS sector_score
FROM efin_companies c
JOIN efin_industry_sector i ON i.industry = c.industry
LEFT JOIN efin_observations roe
  ON roe.cik = c.cik AND roe.metric = 'ROE' AND roe.fy = {FY}
LEFT JOIN efin_observations nm
  ON nm.cik = c.cik AND nm.metric = 'NetProfitMargin' AND nm.fy = {FY}
LEFT JOIN efin_observations de
  ON de.cik = c.cik AND de.metric = 'DebtToEquity' AND de.fy = {FY}
GROUP BY 1
HAVING count(DISTINCT c.cik) >= 1
ORDER BY sector_score DESC, i.sector
"""

CQ_CATALOG["cq_i6_sector_multi_ratio_top"] = f"""
WITH sa AS (
  SELECT sector,
         avg(CASE WHEN metric = 'ROE' THEN value END) AS avg_roe,
         avg(CASE WHEN metric = 'NetProfitMargin' THEN value END) AS avg_m,
         avg(CASE WHEN metric = 'AssetTurnover' THEN value END) AS avg_at,
         avg(CASE WHEN metric = 'DebtToEquity' THEN value END) AS avg_de
  FROM efin_observations
  WHERE fy = {FY} AND sector <> ''
    AND metric IN ('ROE', 'NetProfitMargin', 'AssetTurnover',
                   'DebtToEquity')
  GROUP BY 1)
SELECT c.cik, c.symbol AS ticker, c.name, c.sector,
       roe.value AS roe, nm.value AS margin, at_o.value AS at,
       de.value AS de
FROM efin_companies c
JOIN efin_observations roe
  ON roe.cik = c.cik AND roe.metric = 'ROE' AND roe.fy = {FY}
JOIN efin_observations nm
  ON nm.cik = c.cik AND nm.metric = 'NetProfitMargin' AND nm.fy = {FY}
JOIN efin_observations at_o
  ON at_o.cik = c.cik AND at_o.metric = 'AssetTurnover' AND at_o.fy = {FY}
JOIN efin_observations de
  ON de.cik = c.cik AND de.metric = 'DebtToEquity' AND de.fy = {FY}
JOIN sa ON sa.sector = c.sector
WHERE roe.value >= sa.avg_roe AND nm.value >= sa.avg_m
  AND at_o.value >= sa.avg_at AND de.value <= sa.avg_de
ORDER BY roe.value DESC, nm.value DESC, c.cik
"""

CQ_CATALOG["cq_i7_sector_core_industries"] = f"""
WITH srev AS (
  SELECT i.sector, sum(o.value) AS sector_revenue
  FROM efin_observations o
  JOIN efin_industry_sector i ON i.industry = o.industry
  WHERE o.metric = 'Revenue' AND o.fy = {FY} GROUP BY 1),
irev AS (
  SELECT i.sector, o.industry, sum(o.value) AS industry_revenue
  FROM efin_observations o
  JOIN efin_industry_sector i ON i.industry = o.industry
  WHERE o.metric = 'Revenue' AND o.fy = {FY} GROUP BY 1, 2)
SELECT irev.sector, irev.industry, c.cik, c.symbol AS ticker, c.name,
       o.value AS revenue
FROM irev
JOIN srev ON srev.sector = irev.sector
JOIN efin_companies c ON c.industry = irev.industry
JOIN efin_observations o
  ON o.cik = c.cik AND o.metric = 'Revenue' AND o.fy = {FY}
WHERE irev.industry_revenue >= srev.sector_revenue * 0.2
ORDER BY irev.sector, irev.industry_revenue DESC, revenue DESC, c.cik
"""

CQ_CATALOG["cq_i8_sector_roe_momentum"] = f"""
WITH y0 AS (
  SELECT i.sector, avg(o.value) AS avg_roe_prior
  FROM efin_observations o
  JOIN efin_industry_sector i ON i.industry = o.industry
  WHERE o.metric = 'ROE' AND o.fy = {FY - 1} GROUP BY 1),
y1 AS (
  SELECT i.sector, avg(o.value) AS avg_roe_cur
  FROM efin_observations o
  JOIN efin_industry_sector i ON i.industry = o.industry
  WHERE o.metric = 'ROE' AND o.fy = {FY} GROUP BY 1)
SELECT y1.sector,
       round(y0.avg_roe_prior, 6) AS avg_roe_{FY - 1},
       round(y1.avg_roe_cur, 6) AS avg_roe_{FY}
FROM y1 JOIN y0 ON y0.sector = y1.sector
ORDER BY (y1.avg_roe_cur - y0.avg_roe_prior) DESC, y1.sector
"""

CQ_CATALOG["cq_i9_sector_leverage_spread"] = f"""
SELECT i.sector,
       min(o.value) AS min_de, max(o.value) AS max_de,
       round(max(o.value) - min(o.value), 6) + 0 AS spread_de
FROM efin_observations o
JOIN efin_industry_sector i ON i.industry = o.industry
WHERE o.metric = 'DebtToEquity' AND o.fy = {FY}
GROUP BY 1
HAVING count(DISTINCT o.cik) >= 1
ORDER BY spread_de DESC, i.sector
"""

CQ_CATALOG["cq_i10_super_sector_leaders"] = f"""
WITH sa AS (
  SELECT sector,
         avg(CASE WHEN metric = 'ROE' THEN value END) AS avg_roe,
         avg(CASE WHEN metric = 'NetProfitMargin' THEN value END) AS avg_m,
         avg(CASE WHEN metric = 'DebtToEquity' THEN value END) AS avg_de
  FROM efin_observations
  WHERE fy = {FY} AND sector <> ''
    AND metric IN ('ROE', 'NetProfitMargin', 'DebtToEquity')
  GROUP BY 1)
SELECT c.cik, c.symbol AS ticker, c.name, c.sector,
       rg.value AS revg, ng.value AS nig, cg.value AS cfog,
       roe.value AS roe, nm.value AS margin, de.value AS de
FROM efin_companies c
JOIN efin_observations rg
  ON rg.cik = c.cik AND rg.metric = 'RevenueGrowthYoY' AND rg.fy = {FY}
JOIN efin_observations ng
  ON ng.cik = c.cik AND ng.metric = 'NetIncomeGrowthYoY' AND ng.fy = {FY}
JOIN efin_observations cg
  ON cg.cik = c.cik AND cg.metric = 'CFOGrowthYoY' AND cg.fy = {FY}
JOIN efin_observations roe
  ON roe.cik = c.cik AND roe.metric = 'ROE' AND roe.fy = {FY}
JOIN efin_observations nm
  ON nm.cik = c.cik AND nm.metric = 'NetProfitMargin' AND nm.fy = {FY}
JOIN efin_observations de
  ON de.cik = c.cik AND de.metric = 'DebtToEquity' AND de.fy = {FY}
JOIN sa ON sa.sector = c.sector
WHERE rg.value > 0 AND ng.value > 0 AND cg.value > 0
  AND roe.value >= sa.avg_roe AND nm.value >= sa.avg_m
  AND de.value <= sa.avg_de
ORDER BY roe.value DESC, nm.value DESC, c.cik
"""

# ========== §3: class-based leader screens (C1-C7) ====================

def _leader_cq(classes: list[str], scope_col: str) -> str:
    legs = []
    for i, cls in enumerate(classes):
        legs.append(
            f"JOIN efin_leader_classes l{i} ON l{i}.cik = c.cik "
            f"AND l{i}.leader_class = '{cls}'"
        )
    return f"""
SELECT DISTINCT c.{scope_col}, c.cik, c.symbol AS ticker, c.name
FROM efin_companies c
{' '.join(legs)}
ORDER BY c.{scope_col}, ticker, c.cik
"""


CQ_CATALOG["cq_c1_industry_revenue_leaders"] = _leader_cq(
    ["IndustryRevenueTop10LeaderCompany"], "industry")
CQ_CATALOG["cq_c2_sector_profitability_leaders"] = _leader_cq(
    ["SectorROETop10LeaderCompany",
     "SectorNetProfitMarginTop10LeaderCompany"], "sector")
CQ_CATALOG["cq_c3_sector_growth_leaders"] = _leader_cq(
    ["SectorCompositeTop10LeaderCompany"], "sector")
CQ_CATALOG["cq_c4_industry_cash_roe_leaders"] = _leader_cq(
    ["IndustryOperatingCashFlowRatioTop10LeaderCompany",
     "IndustryROETop10LeaderCompany"], "industry")
CQ_CATALOG["cq_c5_sector_composite_growth_leaders"] = _leader_cq(
    ["SectorCompositeTop10LeaderCompany",
     "SectorRevenueGrowthTop10LeaderCompany"], "sector")

CQ_CATALOG["cq_c6_quality_roe_leaders"] = """
SELECT DISTINCT c.industry, c.cik, c.symbol AS ticker, c.name
FROM efin_companies c
JOIN efin_quality_leaders q ON q.cik = c.cik
JOIN efin_leader_classes l
  ON l.cik = c.cik AND l.leader_class = 'IndustryROETop10LeaderCompany'
ORDER BY c.industry, ticker, c.cik
"""

CQ_CATALOG["cq_c7_sector_super_leaders"] = _leader_cq(
    ["SectorROETop10LeaderCompany",
     "SectorNetProfitMarginTop10LeaderCompany",
     "SectorCompositeTop10LeaderCompany",
     "SectorOperatingCashFlowRatioTop10LeaderCompany"], "sector")

# ========== §4: class-free equivalents (R1-R4) ========================

CQ_CATALOG["cq_r1_industry_revenue_top10_classfree"] = """
SELECT DISTINCT c.industry, c.cik, c.symbol AS ticker, c.name
FROM efin_companies c
JOIN efin_industry_top10 r
  ON r.cik = c.cik AND r.industry = c.industry AND r.metric = 'Revenue'
ORDER BY c.industry, ticker, c.cik
"""

CQ_CATALOG["cq_r2_sector_roe_margin_top10_classfree"] = """
SELECT DISTINCT c.sector, c.cik, c.symbol AS ticker, c.name
FROM efin_companies c
JOIN efin_sector_top10 r1
  ON r1.cik = c.cik AND r1.sector = c.sector AND r1.metric = 'ROE'
JOIN efin_sector_top10 r2
  ON r2.cik = c.cik AND r2.sector = c.sector
 AND r2.metric = 'NetProfitMargin'
ORDER BY c.sector, ticker, c.cik
"""

CQ_CATALOG["cq_r3_sector_growth_top10_classfree"] = """
SELECT DISTINCT c.sector, c.cik, c.symbol AS ticker, c.name
FROM efin_companies c
JOIN efin_sector_top10 r1
  ON r1.cik = c.cik AND r1.sector = c.sector
 AND r1.metric = 'RevenueGrowthYoY'
JOIN efin_sector_top10 r2
  ON r2.cik = c.cik AND r2.sector = c.sector
 AND r2.metric = 'NetIncomeGrowthYoY'
JOIN efin_sector_top10 r3
  ON r3.cik = c.cik AND r3.sector = c.sector
 AND r3.metric = 'CFOGrowthYoY'
ORDER BY c.sector, ticker, c.cik
"""

CQ_CATALOG["cq_r4_industry_ocf_roe_top10_classfree"] = """
SELECT DISTINCT c.industry, c.cik, c.symbol AS ticker, c.name
FROM efin_companies c
JOIN efin_industry_top10 r1
  ON r1.cik = c.cik AND r1.industry = c.industry
 AND r1.metric = 'OperatingCashFlowRatio'
JOIN efin_industry_top10 r2
  ON r2.cik = c.cik AND r2.industry = c.industry AND r2.metric = 'ROE'
ORDER BY c.industry, ticker, c.cik
"""

# ========== competency_questions.md (reasoner CQs) ====================

CQ_CATALOG["cq_rsn_industry_composite_leaders"] = """
SELECT c.industry, c.symbol AS ticker, c.name
FROM efin_companies c
JOIN efin_leader_classes l
  ON l.cik = c.cik
 AND l.leader_class = 'IndustryCompositeTop10LeaderCompany'
ORDER BY c.industry, ticker
"""

CQ_CATALOG["cq_rsn_all_composite_leaders"] = """
SELECT c.symbol AS ticker, c.name
FROM efin_companies c
JOIN efin_leader_classes l
  ON l.cik = c.cik AND l.leader_class = 'AllCompositeTop10LeaderCompany'
ORDER BY ticker
"""

CQ_CATALOG["cq_rsn_all_metrics"] = """
SELECT DISTINCT metric AS label FROM efin_metric_hierarchy
WHERE ancestor = 'Metric'
ORDER BY label
"""

CQ_CATALOG["cq_rsn_company_observations"] = """
SELECT o.name AS company_name, o.metric AS label, o.value
FROM efin_observations o
ORDER BY o.cik, o.metric, o.fy, o.value
"""

CQ_CATALOG["cq_rsn_metric_observations"] = """
SELECT o.metric AS label, o.name AS company_name, o.value
FROM efin_observations o
ORDER BY o.metric, o.cik, o.fy, o.value
"""

CQ_CATALOG["cq_rsn_duration_observations"] = """
SELECT o.name AS company_name, o.metric AS metric_label, o.value
FROM efin_observations o
WHERE o.period_type = 'duration'
ORDER BY o.cik, o.metric, o.fy, o.value
"""


# ---------------------------------------------------------------------
# registration + execution
# ---------------------------------------------------------------------

# ---------------------------------------------------------------------
# fiscal-year rendering: the module body above built TEMPLATES (year =
# __FY__ tokens); the public CQ_CATALOG / SUPPORT_VIEWS are the
# DEFAULT_FY rendering, and build_cq_catalog(fy) re-renders the whole
# 57-view surface for any year.
# ---------------------------------------------------------------------

_CQ_TEMPLATES: dict[str, str] = dict(CQ_CATALOG)
_SUPPORT_TEMPLATES: list[tuple[str, str]] = list(SUPPORT_VIEWS)


def build_cq_catalog(fy: int = DEFAULT_FY) -> dict[str, str]:
    return {k: render_fy(v, fy) for k, v in _CQ_TEMPLATES.items()}


def build_support_views(fy: int = DEFAULT_FY) -> list[tuple[str, str]]:
    return [(n, render_fy(s, fy)) for n, s in _SUPPORT_TEMPLATES]


CQ_CATALOG = build_cq_catalog(DEFAULT_FY)
SUPPORT_VIEWS = build_support_views(DEFAULT_FY)


def base_tables(spark: SparkSession, observations: DataFrame,
                companies: DataFrame, benchmarks: DataFrame,
                rankings: DataFrame) -> dict[str, DataFrame]:
    """The base tables every catalog query is defined over."""
    src = spark.createDataFrame(
        [(m,) for m in COMPUTED_FROM_WHITELIST], "source string"
    )
    ind_sec = (
        companies.where((F.col("industry") != "") & (F.col("sector") != ""))
        .groupBy("industry")
        .agg(F.min_by("sector", "cik").alias("sector"))
    )
    return {
        "efin_observations": observations,
        "efin_companies": companies,
        "efin_benchmarks": benchmarks,
        "efin_rankings": rankings,
        "efin_metric_hierarchy": metric_hierarchy(spark),
        "efin_source_metrics": src,
        "efin_industry_sector": ind_sec,
    }


# per-application directory holding the current materialized support
# tables; replaced (and the previous generation deleted) on re-register
# so repeated registrations — a different fy, a refreshed snapshot —
# neither pin stale executor storage nor accumulate disk
# applicationId -> (dir, created_by_us); only mkdtemp'd generations
# (created_by_us=True) are deleted on replace
_SUPPORT_STORE: dict[str, tuple[str, bool]] = {}


def register_cq_catalog(spark: SparkSession, observations: DataFrame,
                        companies: DataFrame, benchmarks: DataFrame,
                        rankings: DataFrame,
                        fy: int = DEFAULT_FY,
                        materialize: bool = False,
                        store_dir: str | None = None) -> None:
    """Create every base + support temp view for the given fiscal year;
    after this, each catalog entry runs as
    spark.sql(build_cq_catalog(fy)[name]).

    `materialize=True` computes each support view ONCE, writes it as a
    parquet stage table, and registers the re-read frame — a plain view
    re-executes its whole body for every consumer, and the leader-class
    CQs each join efin_leader_classes (itself windows over the full
    rankings table) up to four times. Stage tables beat `.cache()` here
    for two measured reasons: (1) an InMemoryRelation embeds the entire
    upstream AdaptiveSparkPlan, so every consumer join leg re-plans a
    ~470-node tree on the driver (~0.8 s/leg at the 240-company panel —
    cq_c7's four legs ran 3–21 s while 55 sibling views sat at 0.2 s);
    a parquet-backed view is a leaf FileScan and plans in milliseconds.
    (2) cached frames stay pinned in executor storage across
    re-registrations (round-3 advice item); stage-table generations are
    deleted on replace. On a cluster this is exactly the materialized-
    snapshot-table pattern (the Iceberg analog of the design's metrics
    tables). Dual-engine tests use the plain-view form so the identical
    SQL runs in DuckDB."""
    import shutil
    import tempfile

    for name, df in base_tables(
        spark, observations, companies, benchmarks, rankings
    ).items():
        df.createOrReplaceTempView(name)
    if not materialize:
        for name, sql in build_support_views(fy):
            spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {sql}")
        return
    key = spark.sparkContext.applicationId
    created_by_us = store_dir is None
    new_dir = store_dir or tempfile.mkdtemp(prefix="efin-cq-support-")
    # dependency order: later support views read the parquet-backed
    # registrations of earlier ones, so each is computed exactly once.
    # Within one dependency LEVEL the views are independent — write
    # them from a small thread pool so each wave's small jobs overlap
    # (guide §2.6); registration stays on the main thread between
    # waves so a dependent view never sees a half-registered parent.
    from concurrent.futures import ThreadPoolExecutor

    sqls = dict(build_support_views(fy))
    order = [n for n, _ in build_support_views(fy)]
    waves = _support_waves(order)

    def _write(name: str) -> None:
        spark.sql(sqls[name]).write.mode("overwrite").parquet(
            os.path.join(new_dir, name))

    for wave in waves:
        if len(wave) == 1:
            _write(wave[0])
        else:
            with ThreadPoolExecutor(max_workers=len(wave)) as pool:
                for f in [pool.submit(_write, n) for n in wave]:
                    f.result()
        for name in wave:
            spark.read.parquet(
                os.path.join(new_dir, name)).createOrReplaceTempView(name)
    _replace_support_store(key, new_dir, created_by_us)


# the support-view dependency levels (refs between support views only:
# ratio_obs <- industry_metric_avg <- quality_leaders;
# industry_top10_extra <- industry_top10 <- leader_classes;
# sector_top10 <- leader_classes). _support_waves degrades to the
# sequential template order whenever the template list and this map
# disagree (a newly added view stays correct without touching this).
_SUPPORT_LEVELS = {
    "efin_ratio_obs": 0, "efin_lineage": 0, "efin_sector_top10": 0,
    "efin_industry_top10_extra": 0,
    "efin_industry_metric_avg": 1, "efin_industry_top10": 1,
    "efin_leader_classes": 2, "efin_quality_leaders": 2,
}


def _support_waves(order: list[str]) -> list[tuple[str, ...]]:
    if set(order) != set(_SUPPORT_LEVELS):
        return [(n,) for n in order]
    waves: dict[int, list[str]] = {}
    for n in order:
        waves.setdefault(_SUPPORT_LEVELS[n], []).append(n)
    return [tuple(waves[k]) for k in sorted(waves)]


def _replace_support_store(key: str, new_dir: str,
                           created_by_us: bool) -> None:
    """Record the new support-table generation; delete the previous
    one ONLY if register_cq_catalog created it via mkdtemp. A
    caller-supplied store_dir is a user-owned path that may hold
    unrelated files — it stays in place (the per-view parquet subdirs
    inside it are mode("overwrite") anyway)."""
    import shutil

    old = _SUPPORT_STORE.get(key)
    if old and old[0] != new_dir and old[1]:
        shutil.rmtree(old[0], ignore_errors=True)
    _SUPPORT_STORE[key] = (new_dir, created_by_us)


def run_cq(spark: SparkSession, name: str, fy: int = DEFAULT_FY) -> DataFrame:
    return spark.sql(build_cq_catalog(fy)[name])
