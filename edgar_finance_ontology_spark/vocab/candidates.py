"""Candidate concept gazetteer: (metric, qname, prior score, sector gate).

Ported as *data* from the reference's static CANDIDATES table
(select_xbrl_tags.py:1565-1714). `ord` preserves the reference's list
order, which is the deterministic tie-break when two candidates score
exactly equal (reference keeps the first hit, select_xbrl_tags.py:1890).

At runtime this table is tiny (~80 rows) and is always broadcast.
"""

from __future__ import annotations

# (metric, ord, qname, base_score, industry_only-or-None)
CANDIDATES_ROWS: list[tuple] = [
    # Revenue (select_xbrl_tags.py:1566-1596)
    ("Revenue", 0, "us-gaap:RevenueFromContractWithCustomerExcludingAssessedTax", 1.00, None),
    ("Revenue", 1, "us-gaap:RevenueFromContractWithCustomerIncludingAssessedTax", 0.985, None),
    ("Revenue", 2, "us-gaap:Revenues", 0.975, None),
    ("Revenue", 3, "us-gaap:SalesRevenueNet", 0.970, None),
    ("Revenue", 4, "us-gaap:NetSales", 0.960, None),
    ("Revenue", 5, "us-gaap:OperatingRevenue", 0.955, None),
    ("Revenue", 6, "us-gaap:UtilityRevenue", 0.960, ("Utilities",)),
    ("Revenue", 7, "us-gaap:ElectricUtilityRevenue", 0.955, ("Utilities",)),
    ("Revenue", 8, "us-gaap:GasUtilityRevenue", 0.945, ("Utilities",)),
    ("Revenue", 9, "us-gaap:RegulatedAndUnregulatedOperatingRevenue", 0.940, ("Utilities",)),
    ("Revenue", 10, "us-gaap:RealEstateRevenueNet", 0.950, ("Real Estate",)),
    ("Revenue", 11, "us-gaap:RentalRevenue", 0.945, ("Real Estate",)),
    ("Revenue", 12, "us-gaap:OperatingLeasesIncomeStatementLeaseRevenue", 0.940, ("Real Estate",)),
    ("Revenue", 13, "us-gaap:OilAndGasRevenue", 0.950, ("Energy",)),
    ("Revenue", 14, "us-gaap:RefiningAndMarketingRevenue", 0.940, ("Energy",)),
    ("Revenue", 15, "us-gaap:SubscriptionRevenue", 0.940, None),
    ("Revenue", 16, "us-gaap:SoftwareLicensesRevenue", 0.930, None),
    ("Revenue", 17, "us-gaap:InterestAndFeeIncomeLoansAndLeases", 0.950, ("Financials",)),
    ("Revenue", 18, "us-gaap:NoninterestIncome", 0.945, ("Financials",)),
    ("Revenue", 19, "us-gaap:NetInterestIncome", 0.940, ("Financials",)),
    ("Revenue", 20, "us-gaap:InvestmentBankingRevenue", 0.935, ("Financials",)),
    ("Revenue", 21, "us-gaap:InterestAndDividendIncomeOperating", 0.930, ("Financials",)),
    ("Revenue", 22, "ifrs-full:Revenue", 0.985, ("IFRS",)),
    # OperatingIncome (select_xbrl_tags.py:1597-1607)
    ("OperatingIncome", 0, "us-gaap:OperatingIncomeLoss", 1.00, None),
    ("OperatingIncome", 1, "ifrs-full:ProfitLossFromOperatingActivities", 0.98, ("IFRS",)),
    ("OperatingIncome", 2, "ifrs-full:ProfitLossBeforeFinanceCostsAndTax", 0.96, ("IFRS",)),
    ("OperatingIncome", 3, "us-gaap:EarningsBeforeInterestAndTaxes", 0.955, None),
    ("OperatingIncome", 4, "us-gaap:IncomeFromOperations", 0.940, None),
    ("OperatingIncome", 5, "us-gaap:RealEstateOperatingIncomeLoss", 0.92, ("Real Estate",)),
    ("OperatingIncome", 6, "us-gaap:IncomeLossFromContinuingOperations", 0.90, ("Financials",)),
    ("OperatingIncome", 7, "us-gaap:IncomeBeforeIncomeTaxes", 0.88, ("Financials",)),
    # NetIncome (select_xbrl_tags.py:1608-1614)
    ("NetIncome", 0, "us-gaap:NetIncomeLoss", 1.00, None),
    ("NetIncome", 1, "us-gaap:NetIncomeLossAttributableToParent", 0.955, None),
    ("NetIncome", 2, "us-gaap:NetIncomeLossAvailableToCommonStockholdersBasic", 0.945, None),
    ("NetIncome", 3, "us-gaap:NetIncomeLossFromContinuingOperationsAvailableToCommonShareholdersBasic", 0.940, None),
    ("NetIncome", 4, "ifrs-full:ProfitLoss", 0.98, ("IFRS",)),
    # CashAndCashEquivalents (select_xbrl_tags.py:1615-1619)
    ("CashAndCashEquivalents", 0, "us-gaap:CashAndCashEquivalentsAtCarryingValue", 1.00, None),
    ("CashAndCashEquivalents", 1, "us-gaap:CashCashEquivalentsRestrictedCashAndRestrictedCashEquivalents", 0.94, None),
    ("CashAndCashEquivalents", 2, "ifrs-full:CashAndCashEquivalents", 0.98, ("IFRS",)),
    # CFO (select_xbrl_tags.py:1620-1624)
    ("CFO", 0, "us-gaap:NetCashProvidedByUsedInOperatingActivities", 1.00, None),
    ("CFO", 1, "us-gaap:NetCashProvidedByUsedInOperatingActivitiesContinuingOperations", 0.96, None),
    ("CFO", 2, "ifrs-full:NetCashFlowsFromUsedInOperatingActivities", 0.98, ("IFRS",)),
    # Assets (select_xbrl_tags.py:1625-1630)
    ("Assets", 0, "us-gaap:Assets", 1.00, None),
    ("Assets", 1, "ifrs-full:Assets", 0.985, ("IFRS",)),
    ("Assets", 2, "us-gaap:LiabilitiesAndStockholdersEquity", 0.92, None),
    ("Assets", 3, "ifrs-full:EquityAndLiabilities", 0.92, ("IFRS",)),
    # Liabilities (select_xbrl_tags.py:1631-1634)
    ("Liabilities", 0, "us-gaap:Liabilities", 1.00, None),
    ("Liabilities", 1, "ifrs-full:Liabilities", 0.985, ("IFRS",)),
    # Equity (select_xbrl_tags.py:1635-1639)
    ("Equity", 0, "us-gaap:StockholdersEquityIncludingPortionAttributableToNoncontrollingInterest", 1.00, None),
    ("Equity", 1, "us-gaap:StockholdersEquity", 0.98, None),
    ("Equity", 2, "ifrs-full:Equity", 0.98, ("IFRS",)),
    # EPSDiluted (select_xbrl_tags.py:1640-1643)
    ("EPSDiluted", 0, "us-gaap:EarningsPerShareDiluted", 1.00, None),
    ("EPSDiluted", 1, "ifrs-full:DilutedEarningsLossPerShare", 0.98, ("IFRS",)),
    # DilutedShares (select_xbrl_tags.py:1644-1647)
    ("DilutedShares", 0, "us-gaap:WeightedAverageNumberOfDilutedSharesOutstanding", 1.00, None),
    ("DilutedShares", 1, "ifrs-full:WeightedAverageNumberOfDilutedSharesOutstanding", 0.98, ("IFRS",)),
    # GrossProfit (select_xbrl_tags.py:1648-1651)
    ("GrossProfit", 0, "us-gaap:GrossProfit", 1.00, None),
    ("GrossProfit", 1, "ifrs-full:GrossProfit", 0.98, ("IFRS",)),
    # CapEx (select_xbrl_tags.py:1652-1656)
    ("CapEx", 0, "us-gaap:PaymentsToAcquirePropertyPlantAndEquipment", 1.00, None),
    ("CapEx", 1, "us-gaap:PaymentsToAcquireProductiveAssets", 0.93, None),
    ("CapEx", 2, "ifrs-full:PurchaseOfPropertyPlantAndEquipment", 0.96, ("IFRS",)),
    # InterestExpense (select_xbrl_tags.py:1657-1661)
    ("InterestExpense", 0, "us-gaap:InterestExpense", 1.00, None),
    ("InterestExpense", 1, "us-gaap:InterestExpenseOperating", 0.94, None),
    ("InterestExpense", 2, "ifrs-full:FinanceCosts", 0.90, ("IFRS",)),
    # DepAmort (select_xbrl_tags.py:1662-1667)
    ("DepAmort", 0, "us-gaap:DepreciationAndAmortization", 1.00, None),
    ("DepAmort", 1, "us-gaap:DepreciationDepletionAndAmortization", 0.98, None),
    ("DepAmort", 2, "us-gaap:Depreciation", 0.94, None),
    ("DepAmort", 3, "ifrs-full:DepreciationAndAmortisationExpense", 0.98, ("IFRS",)),
    # LongTermDebt (select_xbrl_tags.py:1668-1672)
    ("LongTermDebt", 0, "us-gaap:LongTermDebtNoncurrent", 1.00, None),
    ("LongTermDebt", 1, "us-gaap:LongTermDebt", 0.98, None),
    ("LongTermDebt", 2, "ifrs-full:BorrowingsNoncurrent", 0.96, ("IFRS",)),
    # ShortTermDebt (select_xbrl_tags.py:1673-1677)
    ("ShortTermDebt", 0, "us-gaap:ShortTermBorrowings", 1.00, None),
    ("ShortTermDebt", 1, "us-gaap:DebtCurrent", 0.96, None),
    ("ShortTermDebt", 2, "ifrs-full:BorrowingsCurrent", 0.94, ("IFRS",)),
    # DebtCurrent (select_xbrl_tags.py:1678-1680)
    ("DebtCurrent", 0, "us-gaap:DebtCurrent", 1.00, None),
    # CurrentAssets (select_xbrl_tags.py:1681-1684)
    ("CurrentAssets", 0, "us-gaap:AssetsCurrent", 1.00, None),
    ("CurrentAssets", 1, "ifrs-full:CurrentAssets", 0.98, ("IFRS",)),
    # CurrentLiabilities (select_xbrl_tags.py:1685-1688)
    ("CurrentLiabilities", 0, "us-gaap:LiabilitiesCurrent", 1.00, None),
    ("CurrentLiabilities", 1, "ifrs-full:CurrentLiabilities", 0.98, ("IFRS",)),
    # Inventories (select_xbrl_tags.py:1689-1693)
    ("Inventories", 0, "us-gaap:InventoryNet", 1.00, None),
    ("Inventories", 1, "us-gaap:Inventory", 0.97, None),
    ("Inventories", 2, "ifrs-full:Inventories", 0.98, ("IFRS",)),
    # AccountsReceivable (select_xbrl_tags.py:1694-1699)
    ("AccountsReceivable", 0, "us-gaap:AccountsReceivableNetCurrent", 1.00, None),
    ("AccountsReceivable", 1, "us-gaap:AccountsReceivableTradeNetCurrent", 0.96, None),
    ("AccountsReceivable", 2, "us-gaap:ReceivablesNetCurrent", 0.95, None),
    ("AccountsReceivable", 3, "ifrs-full:TradeAndOtherReceivablesCurrent", 0.93, ("IFRS",)),
    # CostOfGoodsSold (select_xbrl_tags.py:1700-1704)
    ("CostOfGoodsSold", 0, "us-gaap:CostOfGoodsSold", 1.00, None),
    ("CostOfGoodsSold", 1, "us-gaap:CostOfRevenue", 0.98, None),
    ("CostOfGoodsSold", 2, "ifrs-full:CostOfSales", 0.98, ("IFRS",)),
    # IncomeTaxExpense (select_xbrl_tags.py:1705-1708)
    ("IncomeTaxExpense", 0, "us-gaap:IncomeTaxExpenseBenefit", 1.00, None),
    ("IncomeTaxExpense", 1, "ifrs-full:IncomeTaxExpense", 0.98, ("IFRS",)),
    # PreTaxIncome (select_xbrl_tags.py:1709-1713)
    ("PreTaxIncome", 0, "us-gaap:IncomeLossFromContinuingOperationsBeforeIncomeTaxesExtraordinaryItemsNoncontrollingInterest", 1.00, None),
    ("PreTaxIncome", 1, "us-gaap:IncomeLossFromContinuingOperationsBeforeIncomeTaxes", 0.98, None),
    ("PreTaxIncome", 2, "ifrs-full:ProfitLossBeforeTax", 0.98, ("IFRS",)),
]


def candidates_df(spark):
    """Candidate gazetteer as a DataFrame: metric, cand_ord, qname,
    base_score, industry_only (nullable array<string>)."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("metric", StringType(), False),
        StructField("cand_ord", IntegerType(), False),
        StructField("qname", StringType(), False),
        StructField("base_score", DoubleType(), False),
        StructField("industry_only", ArrayType(StringType()), True),
    ])
    rows = [
        (m, o, q, s, list(gate) if gate is not None else None)
        for (m, o, q, s, gate) in CANDIDATES_ROWS
    ]
    return spark.createDataFrame(rows, schema)
