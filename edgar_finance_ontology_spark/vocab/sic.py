"""SIC-code -> GICS-style sector mapping.

Ported as data from the reference's rule ladder (select_xbrl_tags.py:
1524-1538). Rules are evaluated IN ORDER; the first matching range wins
(the reference's overlapping IT ranges make order significant).
"""

from __future__ import annotations

# (lo, hi, sector) evaluated in order; first hit wins.
SIC_SECTOR_RANGES: list[tuple[int, int, str]] = [
    (1300, 1399, "Energy"),
    (2900, 2999, "Energy"),
    (1000, 1299, "Materials"),
    (1400, 1499, "Materials"),
    (2800, 2899, "Materials"),
    (1500, 1799, "Industrials"),
    (3300, 3399, "Industrials"),
    (3400, 3999, "Industrials"),
    (4900, 4999, "Utilities"),
    (2000, 2099, "Consumer Staples"),
    (2300, 2799, "Consumer Discretionary"),
    (3100, 3299, "Consumer Discretionary"),
    (8000, 8099, "Health Care"),
    (2830, 2839, "Health Care"),
    (3840, 3859, "Health Care"),
    (6000, 6999, "Financials"),
    (3570, 3579, "Information Technology"),
    (7370, 7379, "Information Technology"),
    (3570, 3699, "Information Technology"),
    (7370, 7399, "Information Technology"),
    (4800, 4899, "Communication Services"),
    (2700, 2799, "Communication Services"),
    (6500, 6799, "Real Estate"),
]


def sic_to_sector(sic: int | None) -> str:
    """Python mirror of the rule ladder (used by generators/tests)."""
    if sic is None:
        return "Unknown"
    s = int(sic)
    for lo, hi, sector in SIC_SECTOR_RANGES:
        if lo <= s <= hi:
            return sector
    return "Other"


def sic_sector_expr(col):
    """Column expression form of the ladder (a when/otherwise chain —
    constant-folded by Catalyst, no UDF)."""
    from pyspark.sql import functions as F

    expr = None
    for lo, hi, sector in SIC_SECTOR_RANGES:
        cond = col.between(lo, hi)
        expr = F.when(cond, sector) if expr is None else expr.when(cond, sector)
    return (
        F.when(col.isNull(), "Unknown")
        .otherwise(expr.otherwise("Other"))
    )
