"""Candidate-selection scoring as pure column arithmetic.

Re-expresses the reference's score_adj (select_xbrl_tags.py:1552-1561)
and the source-type bonus (select_xbrl_tags.py:1886) as when/otherwise
chains — fully codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ANNUAL_FORMS = ("10-K", "20-F", "10-K/A", "20-F/A")
FY_FPS = ("FY", "CY", "FYR")

# source-type bonus: annual +0.012, ytd-q4 -0.004, lenient -0.01
# (select_xbrl_tags.py:1886); instant selections get no type bonus
# (select_xbrl_tags.py:1910).
TYP_BONUS = {"annual": 0.012, "ytd-q4": -0.004, "lenient": -0.01, "instant": 0.0}


def score_adj_col(
    form: Column, unit: Column, fp: Column, has_seg: Column, industry_hit: bool = True
) -> Column:
    """+0.06 annual form / -0.01 other form; +0.03 USD / -0.02 other
    unit; +0.03 FY-period fp; -0.01 segmented; +0.02 industry hit.

    Note: after the sector gate, industry_hit is always True in the
    reference too (the gate `continue`s before scoring,
    select_xbrl_tags.py:1878-1885), so it is a constant +0.02.
    """
    form_adj = (
        F.when(form.isin(*ANNUAL_FORMS), F.lit(0.06))
        .when(form.isNotNull() & (form != ""), F.lit(-0.01))
        .otherwise(F.lit(0.0))
    )
    unit_adj = (
        F.when(unit == "USD", F.lit(0.03))
        .when(unit.isNotNull() & (unit != ""), F.lit(-0.02))
        .otherwise(F.lit(0.0))
    )
    fp_adj = F.when(
        F.upper(F.coalesce(fp, F.lit(""))).isin(*FY_FPS), F.lit(0.03)
    ).otherwise(F.lit(0.0))
    seg_adj = F.when(has_seg, F.lit(-0.01)).otherwise(F.lit(0.0))
    ind_adj = F.lit(0.02 if industry_hit else 0.0)
    return form_adj + unit_adj + fp_adj + seg_adj + ind_adj


def typ_bonus_col(typ: Column) -> Column:
    return (
        F.when(typ == "annual", F.lit(0.012))
        .when(typ == "ytd-q4", F.lit(-0.004))
        .when(typ == "lenient", F.lit(-0.01))
        .otherwise(F.lit(0.0))
    )


def clamp01(c: Column) -> Column:
    """max(0, min(1, score)) — reference select_xbrl_tags.py:1889."""
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), c))
