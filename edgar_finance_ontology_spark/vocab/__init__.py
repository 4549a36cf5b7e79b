"""Ported vocabulary *data* from the reference (no logic).

Every table here is small (KBs) and is broadcast at join time.
"""

from .metrics import (  # noqa: F401
    BASE_METRICS,
    DERIVED_METRICS,
    BENCHMARK_RANKING_METRICS,
    DURATION_BASE_METRICS,
    INSTANT_BASE_METRICS,
    COMPUTED_FROM_WHITELIST,
    METRIC_EMISSION_ORDER,
    OTHER_DERIVED_ORDER,
    GROWTH_METRICS,
)
from .candidates import CANDIDATES_ROWS, candidates_df  # noqa: F401
from .growth_patterns import (  # noqa: F401
    DIRECT_GROWTH_PATTERNS,
    DIRECT_GROWTH_BLACKLIST,
)
from .sic import SIC_SECTOR_RANGES, sic_to_sector  # noqa: F401
from .namespaces import NAMESPACE_MAP, CURRENCY_CODES  # noqa: F401
