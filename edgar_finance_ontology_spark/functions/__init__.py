from .dates import parse_date_col, fiscal_anchor_cols  # noqa: F401
from .scoring import score_adj_col, TYP_BONUS  # noqa: F401
from .iri import (  # noqa: F401
    ttl_escape_col,
    iri_safe_col,
    iri_camel_case,
    iri_camel_case_col,
    parse_computed_from_col,
    py_float_repr_col,
)
