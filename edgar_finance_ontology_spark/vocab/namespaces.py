"""QName-prefix -> namespace URIs and currency codes.

Ported as data from the reference (namespace map:
select_xbrl_tags.py:350-357; currency whitelist:
select_xbrl_tags.py:326).
"""

NAMESPACE_MAP = {
    "us-gaap": "http://fasb.org/us-gaap/",
    "ifrs-full": "http://xbrl.ifrs.org/taxonomy/",
    "dei": "http://xbrl.sec.gov/dei/",
    "srt": "http://fasb.org/srt/",
}

# Fallback namespace pattern for unknown prefixes: http://example.org/{prefix}/

CURRENCY_CODES = (
    "USD", "EUR", "KRW", "JPY", "GBP", "CNY", "AUD", "CAD", "CHF", "HKD", "SGD",
)

EFIN_PREFIX = "efin:"
EFIN_NS = "https://w3id.org/edgar-fin/2024#"

TTL_PREFIX_LINES = [
    "@prefix efin: <https://w3id.org/edgar-fin/2024#> .",
    "@prefix xsd:  <http://www.w3.org/2001/XMLSchema#> .",
    "@prefix owl:  <http://www.w3.org/2002/07/owl#> .",
    "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .",
]
