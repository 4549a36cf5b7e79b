"""Metric vocabulary of the EFIN ontology.

Ported as data from the reference:
  BASE_METRICS / DERIVED_METRICS       select_xbrl_tags.py:1254-1271
  BENCHMARK_RANKING_METRICS            select_xbrl_tags.py:1276-1283
  COMPUTED_FROM_WHITELIST              select_xbrl_tags.py:380-392
  duration/instant selector split      select_xbrl_tags.py:2918-2919, 2943-2944
  derived emission order               select_xbrl_tags.py:2504-2657
"""

# 24 base metrics (reference select_xbrl_tags.py:1254-1261).
BASE_METRICS = [
    "Revenue", "OperatingIncome", "NetIncome", "CashAndCashEquivalents", "CFO",
    "Assets", "Liabilities", "Equity",
    "EPSDiluted", "CapEx", "InterestExpense", "DepAmort",
    "LongTermDebt", "ShortTermDebt", "DebtCurrent", "GrossProfit",
    "DilutedShares", "CurrentAssets", "CurrentLiabilities", "Inventories",
    "AccountsReceivable", "CostOfGoodsSold", "IncomeTaxExpense", "PreTaxIncome",
]

# 23 derived metrics (reference select_xbrl_tags.py:1264-1271).
DERIVED_METRICS = [
    "RevenueGrowthYoY", "GrossMargin", "OperatingMargin", "NetProfitMargin", "ROE",
    "FreeCashFlow", "EBITDA", "EBITDAMargin", "InterestCoverage", "DebtToEquity",
    "CurrentRatio", "QuickRatio", "InventoryTurnover", "ReceivablesTurnover",
    "OperatingCashFlowRatio", "EquityRatio", "AssetTurnover",
    "NetIncomeGrowthYoY", "CFOGrowthYoY", "AssetGrowthRate",
    "ROIC", "NOPAT", "InvestedCapital",
]

# Core investment-insight metrics used for benchmarks and rankings
# (reference select_xbrl_tags.py:1276-1283).
BENCHMARK_RANKING_METRICS = [
    "ROE",
    "NetProfitMargin",
    "DebtToEquity",
    "CurrentRatio",
    "RevenueGrowthYoY",
    "CFOGrowthYoY",
]

# Base metrics emitted as duration-type observations, in emission order
# (reference select_xbrl_tags.py:2918-2919).
DURATION_BASE_METRICS = [
    "Revenue", "OperatingIncome", "NetIncome", "CFO", "GrossProfit", "EPSDiluted",
    "CapEx", "InterestExpense", "DepAmort", "CostOfGoodsSold", "IncomeTaxExpense",
    "PreTaxIncome", "DilutedShares",
]

# Base metrics emitted as instant-type observations, in emission order
# (reference select_xbrl_tags.py:2943-2944).
INSTANT_BASE_METRICS = [
    "Assets", "Liabilities", "Equity", "LongTermDebt", "ShortTermDebt",
    "DebtCurrent", "CurrentAssets", "CurrentLiabilities", "Inventories",
    "AccountsReceivable",
]

# The 4 YoY growth metrics (reference select_xbrl_tags.py:2968).
GROWTH_METRICS = [
    "RevenueGrowthYoY", "NetIncomeGrowthYoY", "CFOGrowthYoY", "AssetGrowthRate",
]

# Emission order of the non-growth derived metrics, matching the append
# order in compute_other_derived (reference select_xbrl_tags.py:2520-2647).
OTHER_DERIVED_ORDER = [
    "GrossMargin", "OperatingMargin", "NetProfitMargin", "ROE",
    "FreeCashFlow", "EBITDA", "EBITDAMargin", "InterestCoverage", "DebtToEquity",
    "CurrentRatio", "QuickRatio", "InventoryTurnover", "ReceivablesTurnover",
    "OperatingCashFlowRatio", "AssetTurnover", "EquityRatio",
    "ROIC", "NOPAT", "InvestedCapital",
]

# Full per-company observation emission order (base duration, base instant,
# growth, other derived) — used for byte-stable Turtle ordering
# (reference main() loop, select_xbrl_tags.py:2916-2984).
METRIC_EMISSION_ORDER = (
    DURATION_BASE_METRICS + INSTANT_BASE_METRICS + GROWTH_METRICS + OTHER_DERIVED_ORDER
)

# Whitelist of metric names allowed as efin:computedFromMetric objects
# (reference select_xbrl_tags.py:380-392).
COMPUTED_FROM_WHITELIST = [
    "Revenue", "NetIncome", "CFO", "GrossProfit", "EPSDiluted", "CapEx",
    "InterestExpense", "DepAmort", "LongTermDebt", "ShortTermDebt", "DebtCurrent",
    "DilutedShares", "CurrentAssets", "CurrentLiabilities", "Inventories",
    "AccountsReceivable", "CostOfGoodsSold", "IncomeTaxExpense", "PreTaxIncome",
    "Assets", "Equity", "Liabilities", "CashAndCashEquivalents",
    "OperatingIncome", "RevenueGrowthYoY", "GrossMargin", "OperatingMargin",
    "NetProfitMargin", "ROE", "FreeCashFlow", "EBITDA", "EBITDAMargin",
    "InterestCoverage", "DebtToEquity", "NOPAT", "InvestedCapital",
    "CurrentRatio", "QuickRatio", "InventoryTurnover", "ReceivablesTurnover",
    "OperatingCashFlowRatio", "EquityRatio", "AssetTurnover", "NetIncomeGrowthYoY",
    "CFOGrowthYoY", "AssetGrowthRate", "ROIC",
]
