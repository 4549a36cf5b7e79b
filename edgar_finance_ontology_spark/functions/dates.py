"""Fiscal-calendar column helpers.

Spark-native re-expressions of the reference's date utilities:
  parse_date        (select_xbrl_tags.py:1488-1493) -> coalesce(to_date ×3)
  anchors_for_fy    (select_xbrl_tags.py:1495-1499) -> make_date ×2
  end_distance      (select_xbrl_tags.py:1504-1505) -> least(abs(datediff))
All are pure column expressions — whole-stage-codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_date_col(c: Column) -> Column:
    """Try %Y-%m-%d, %Y/%m/%d, %m/%d/%Y in order (null if none parse)."""
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")).cast("date"),
        F.try_to_timestamp(c, F.lit("yyyy/MM/dd")).cast("date"),
        F.try_to_timestamp(c, F.lit("MM/dd/yyyy")).cast("date"),
    )


def fye_month_day(fye: Column) -> tuple[Column, Column]:
    """fiscalYearEnd 'MMDD' -> (month, day); anything malformed -> 12-31
    (reference defaults to '1231', select_xbrl_tags.py:1496-1497)."""
    ok = fye.rlike(r"^\d{4}$")
    mm = F.when(ok, F.substring(fye, 1, 2).cast("int")).otherwise(F.lit(12))
    dd = F.when(ok, F.substring(fye, 3, 2).cast("int")).otherwise(F.lit(31))
    return mm, dd


def fiscal_anchor_cols(fy: Column, fye: Column) -> tuple[Column, Column]:
    """The two fiscal anchor dates: (fy, mm, dd) and (fy+1, mm, dd).

    make_date (non-ANSI mode) nulls out impossible dates (e.g. 02-29 in a non-leap
    year); we then fall back to 12-31, where the reference would raise
    and skip the company — documented determinism fix.
    """
    mm, dd = fye_month_day(fye)
    a1 = F.coalesce(F.make_date(fy, mm, dd), F.make_date(fy, F.lit(12), F.lit(31)))
    a2 = F.coalesce(
        F.make_date(fy + 1, mm, dd), F.make_date(fy + 1, F.lit(12), F.lit(31))
    )
    return a1, a2


def end_distance_col(end_d: Column, a1: Column, a2: Column) -> Column:
    """min abs day-distance to either anchor."""
    return F.least(F.abs(F.datediff(end_d, a1)), F.abs(F.datediff(end_d, a2)))
