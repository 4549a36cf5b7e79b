"""CSV-presentation formatting of the output tables.

The reference formats value as %.6f and confidence as %.3f at row-
construction time (add_row, select_xbrl_tags.py:1798, 1808) and then
every downstream consumer (benchmarks, rankings, TTL) re-parses those
strings — so the 6-decimal rounding is part of the SEMANTICS, not just
presentation. The formatting must round the EXACT binary expansion
(CPython semantics); Spark's format_number/round use the shortest
decimal repr and differ in the 6th decimal for large 2dp values, so
the formatters here are Arrow-batched Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fmt_fixed(c: Column, digits: int) -> Column:
    """Python-exact f"{v:.<digits>f}" (empty string for null). NOT
    format_number: that formats the double's shortest decimal repr and
    diverges from CPython in the last place (fuzz-caught)."""
    from ..functions.iri import py_fixed_format_col

    return py_fixed_format_col(c.cast("double"), digits)


def observations_csv_frame(obs: DataFrame) -> DataFrame:
    """tags_{fy}.csv presentation (select_xbrl_tags.py:2998-3006)."""
    return obs.select(
        "cik", "symbol", "name", "sector", "industry", "sic",
        "sic_description", "fye",
        F.col("fy").cast("string").alias("fy"),
        "metric",
        F.when(F.col("is_derived"), "true").otherwise("false").alias("is_derived"),
        fmt_fixed(F.col("value"), 6).alias("value"),
        "unit", "period_type", "end", "form", "accn", "source_type",
        "selected_tag", "composite_name", "computed_from",
        fmt_fixed(F.col("confidence"), 3).alias("confidence"),
        "reason", "components",
    )


def benchmarks_csv_frame(b: DataFrame) -> DataFrame:
    """benchmarks_{fy}.csv presentation: floats written with Python
    str() semantics (csv.DictWriter writes repr-style shortest floats,
    select_xbrl_tags.py:3014-3021)."""
    from ..functions.iri import py_float_repr_col

    return b.select(
        "industry", "sector", "metric",
        F.col("fy").cast("string").alias("fy"),
        py_float_repr_col(F.col("average_value")).alias("average_value"),
        py_float_repr_col(F.col("median_value")).alias("median_value"),
        py_float_repr_col(F.col("max_value")).alias("max_value"),
        py_float_repr_col(F.col("min_value")).alias("min_value"),
        py_float_repr_col(F.col("percentile25")).alias("percentile25"),
        py_float_repr_col(F.col("percentile75")).alias("percentile75"),
        F.col("sample_size").cast("string").alias("sample_size"),
    )


def rankings_csv_frame(r: DataFrame) -> DataFrame:
    from ..functions.iri import py_float_repr_col

    return r.select(
        "cik", "symbol", "industry", "sector", "metric", "ranking_type",
        F.col("rank").cast("string").alias("rank"),
        py_float_repr_col(F.col("value")).alias("value"),
        py_float_repr_col(F.col("composite_score")).alias("composite_score"),
        F.col("fy").cast("string").alias("fy"),
    )
