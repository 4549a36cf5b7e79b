"""IRI / Turtle-literal helpers.

ttl_escape / iri_safe / parse_computed_from are native column
expressions (regexp_replace / split / transform). iri_camel_case and
py_float_repr need Python-exact semantics (str.capitalize lowercases
word tails — "IBM"->"Ibm" — and repr(float) is shortest-roundtrip), so
they are Arrow-batched pandas UDFs used only in the (tiny) entity-
dimension and final-emission stages, never on the big fact path.

Reference: _ttl_escape select_xbrl_tags.py:41-44, _iri_safe :46-48,
_iri_camel_case :50-71, _parse_computed_from :73-94, float emission
:334 (f'{v}' on a Python float).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def ttl_escape_col(c: Column) -> Column:
    """Escape backslash then double-quote (order matters)."""
    return F.regexp_replace(
        F.regexp_replace(F.coalesce(c, F.lit("")), r"\\", r"\\\\"), '"', r'\\"'
    )


def iri_safe_col(c: Column) -> Column:
    """Replace [^A-Za-z0-9._-] with '-'."""
    return F.regexp_replace(F.coalesce(c, F.lit("")), r"[^A-Za-z0-9._-]", "-")


def iri_camel_case(s: str | None) -> str:
    """Python-exact mirror of the reference's CamelCase IRI mangling:
    non-alnum -> space, split, str.capitalize each word (which
    LOWERCASES tails: 'IBM' -> 'Ibm'), concatenate."""
    if not s:
        return ""
    s = re.sub(r"[^A-Za-z0-9]", " ", s)
    words = s.split()
    if not words:
        return ""
    result = words[0].capitalize()
    for word in words[1:]:
        result += word.capitalize()
    return result


@pandas_udf(StringType())
def iri_camel_case_col(s: pd.Series) -> pd.Series:
    return s.map(iri_camel_case, na_action=None).fillna("")


def py_float_repr(v) -> str:
    """repr() of a Python float — shortest round-trip form, matching the
    reference's f'{v}' Turtle literal (select_xbrl_tags.py:334)."""
    if v is None:
        return ""
    return repr(float(v))


@pandas_udf(StringType())
def py_float_repr_col(v: pd.Series) -> pd.Series:
    return v.map(lambda x: "" if pd.isna(x) else repr(float(x)))


def py_fixed_format_col(c: Column, digits: int) -> Column:
    """Python-exact f"{v:.Nf}" (rounds the exact binary expansion;
    Spark's format_number/round go through the double's SHORTEST
    decimal repr and differ in the last place for values like
    8727893423.39). Arrow-batched; used only on bounded presentation
    frames."""
    fmt = "{:." + str(digits) + "f}"

    @pandas_udf(StringType())
    def _fmt(v: pd.Series) -> pd.Series:
        return v.map(lambda x: "" if pd.isna(x) else fmt.format(float(x)))

    return _fmt(c)


def py_round6_col(c: Column) -> Column:
    """float(f"{v:.6f}") — the reference's CSV round-trip semantics
    (write %.6f, re-parse float), exact-binary rounding."""
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _r6(v: pd.Series) -> pd.Series:
        return v.map(
            lambda x: None if pd.isna(x) else float("{:.6f}".format(float(x)))
        )

    return _r6(c)


def parse_computed_from_col(c: Column) -> Column:
    """'Revenue(cur),Revenue(prior)' -> array('Revenue');
    'direct-growth' -> empty array. Native: split on [,;], strip
    parenthesised suffixes, trim, drop empties, dedup preserving order.
    """
    base = F.when(
        c.isNull() | (c == "") | (c == "direct-growth"), F.array().cast("array<string>")
    ).otherwise(
        F.filter(
            F.transform(
                F.split(c, r"[,;]"),
                lambda p: F.trim(F.regexp_replace(p, r"\([^)]*\)", "")),
            ),
            lambda p: p != "",
        )
    )
    # array_distinct preserves first-occurrence order (matches reference).
    return F.array_distinct(base)
