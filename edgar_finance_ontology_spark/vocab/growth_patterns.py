"""Direct-growth QName mining patterns + blacklist.

Ported as data from the reference (select_xbrl_tags.py:1719-1744).
Patterns are matched case-insensitively against full QNames
("taxonomy:Tag"); the blacklist rejects tax/reconciliation noise
(select_xbrl_tags.py:1746-1755).
"""

DIRECT_GROWTH_PATTERNS = {
    "RevenueGrowthYoY": [
        r"(?:^|:)Revenue(?!.*Tax)(?!.*Reconciliation).*(Growth|Increase|Change).*(YoY|YearOverYear|Percent|Percentage|Rate)$",
        r"(?:^|:)(YoY|YearOverYear).*Revenue(?!.*Tax)(?!.*Reconciliation).*(Percent|Percentage|Rate)$",
        r"(?:^|:)ChangeInRevenue$",
    ],
    "NetIncomeGrowthYoY": [
        r"(?:^|:)(Net)?Income(Loss)?(?!.*Tax)(?!.*Reconciliation)(?!.*Enacted).*(Growth|Increase|Change).*(YoY|YearOverYear|Percent|Percentage|Rate)$",
        r"(?:^|:)(YoY|YearOverYear).*(Net)?Income(Loss)?(?!.*Tax)(?!.*Reconciliation)(?!.*Enacted).*(Percent|Percentage|Rate)$",
        r"(?:^|:)ChangeInNetIncome(Loss)?$",
    ],
    "CFOGrowthYoY": [
        r"(?:^|:)(Operating|Net)?Cash.*(Flow|Provided).*From.*Operating.*(Growth|Increase|Change).*(YoY|YearOverYear|Percent|Percentage|Rate)$",
        r"(?:^|:)ChangeInNetCashProvidedByUsedInOperatingActivities$",
    ],
    "AssetGrowthRate": [
        r"(?:^|:)Assets.*(Growth|Increase|Change).*(YoY|YearOverYear|Percent|Percentage|Rate)$",
        r"(?:^|:)ChangeInAssets$",
    ],
}

DIRECT_GROWTH_BLACKLIST = [
    "Tax", "Reconciliation", "Enacted", "RateChange", "TaxRate",
    "IncomeTax", "TaxExpense", "TaxBenefit", "TaxProvision",
]
