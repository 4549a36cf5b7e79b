"""EFIN schema ontology, GENERATED from the engine's own vocabulary
tables so the emitted instance graph is loadable standalone: the
instances declare `owl:imports <https://w3id.org/edgar-fin/2024#>`
(emit/turtle.py header) and this module produces the document that
import resolves to.

Semantics mirror the reference schema (/root/reference/ontology/
efin_schema.ttl:36-504): Company/Sector/Industry, the Metric hierarchy
(BaseMetric / DerivedMetric / DerivedRatio with one class per metric),
MetricObservation with Duration/Instant defined subclasses, the
Benchmark and Ranking hierarchies, Unit/Currency/XBRLConcept, every
object/datatype property the emitter uses, and the two reasoner-defined
leader classes. The text itself is generated from
vocab/metrics.py — not copied."""

from __future__ import annotations

from .metrics import BASE_METRICS, DERIVED_METRICS

ONTOLOGY_IRI = "https://w3id.org/edgar-fin/2024#"

# FIBO Business Entities module IRI — the reference's interop target
# (efin_schema.ttl:7,23,36-40 declares the prefix, owl:imports it, and
# subclasses efin:Company under fibo-be:LegalEntity).
FIBO_BE_IRI = "https://spec.edmcouncil.org/fibo/ontology/BE/"

# Ratio/margin-shaped derived metrics (DerivedRatio subclass); the
# remaining derived metrics (absolute-value derivations) stay directly
# under DerivedMetric. Mirrors efin_schema.ttl:322-504.
DERIVED_RATIOS = [
    "RevenueGrowthYoY", "GrossMargin", "OperatingMargin", "NetProfitMargin",
    "ROE", "EBITDAMargin", "InterestCoverage", "DebtToEquity",
    "CurrentRatio", "QuickRatio", "InventoryTurnover", "ReceivablesTurnover",
    "OperatingCashFlowRatio", "EquityRatio", "AssetTurnover",
    "NetIncomeGrowthYoY", "CFOGrowthYoY", "AssetGrowthRate", "ROIC",
]

# Formula annotations for derived metrics (public accounting formulas;
# the engine computes these in operators/observations.py:255-376).
FORMULAS = {
    "RevenueGrowthYoY": "Growth_t = (Revenue_t - Revenue_{t-1}) / Revenue_{t-1}",
    "GrossMargin": "GrossMargin = GrossProfit / Revenue",
    "OperatingMargin": "OperatingMargin = OperatingIncome / Revenue",
    "NetProfitMargin": "NetProfitMargin = NetIncome / Revenue",
    "ROE": "ROE = NetIncome / avg(Equity_t, Equity_{t-1})",
    "FreeCashFlow": "FreeCashFlow = CFO - CapEx",
    "EBITDA": "EBITDA = OperatingIncome + DepAmort",
    "EBITDAMargin": "EBITDAMargin = EBITDA / Revenue",
    "InterestCoverage": "InterestCoverage = OperatingIncome / InterestExpense",
    "DebtToEquity": "DebtToEquity = TotalDebt / Equity",
    "CurrentRatio": "CurrentRatio = CurrentAssets / CurrentLiabilities",
    "QuickRatio": "QuickRatio = (CurrentAssets - Inventories) / CurrentLiabilities",
    "InventoryTurnover": "InventoryTurnover = CostOfGoodsSold / avg(Inventories)",
    "ReceivablesTurnover": "ReceivablesTurnover = Revenue / avg(AccountsReceivable)",
    "OperatingCashFlowRatio": "OperatingCashFlowRatio = CFO / CurrentLiabilities",
    "EquityRatio": "EquityRatio = Equity / Assets",
    "AssetTurnover": "AssetTurnover = Revenue / avg(Assets)",
    "NetIncomeGrowthYoY": "Growth_t = (NetIncome_t - NetIncome_{t-1}) / NetIncome_{t-1}",
    "CFOGrowthYoY": "Growth_t = (CFO_t - CFO_{t-1}) / CFO_{t-1}",
    "AssetGrowthRate": "Growth_t = (Assets_t - Assets_{t-1}) / Assets_{t-1}",
    "NOPAT": "NOPAT = OperatingIncome * (1 - IncomeTaxExpense / PreTaxIncome)",
    "InvestedCapital": "InvestedCapital = TotalDebt + Equity",
    "ROIC": "ROIC = NOPAT / avg(InvestedCapital)",
}

_OBJECT_PROPERTIES = [
    # (name, domain, range, comment)
    ("ofCompany", "efin:MetricObservation", "efin:Company",
     "Company the observation belongs to (functional)."),
    ("observesMetric", "efin:MetricObservation", "efin:Metric",
     "Metric concept the observation measures (functional)."),
    ("hasUnit", "efin:MetricObservation", "efin:Unit",
     "Measurement unit of the observed value."),
    ("hasCurrency", "efin:MetricObservation", "efin:Currency",
     "Currency of the observed value when the unit is monetary."),
    ("hasXbrlConcept", "efin:MetricObservation", "efin:XBRLConcept",
     "Source XBRL concept the value was selected from."),
    ("computedFromMetric", "efin:MetricObservation", "efin:Metric",
     "Input metric lineage edge of a derived observation."),
    ("inSector", "efin:Company", "efin:Sector",
     "Sector classification of the company."),
    ("inIndustry", "efin:Company", "efin:Industry",
     "Industry classification of the company."),
    ("inSectorOf", "efin:Industry", "efin:Sector",
     "Sector an industry belongs to."),
    ("forIndustry", None, "efin:Industry",
     "Industry scope of a benchmark or ranking."),
    ("forSector", None, "efin:Sector",
     "Sector scope of a benchmark or ranking (SectorAll = all-market)."),
    ("forMetric", None, "efin:Metric",
     "Metric a benchmark or ranking is computed over."),
    ("hasRanking", "efin:Company", "efin:Ranking",
     "Back-link from a company to its ranking instances."),
]

_DATATYPE_PROPERTIES = [
    ("hasCIK", "efin:Company", "xsd:string", "Zero-padded 10-digit SEC CIK."),
    ("hasTicker", "efin:Company", "xsd:string", "Exchange ticker symbol."),
    ("hasCompanyName", "efin:Company", "xsd:string", "Registered company name."),
    ("hasSIC", "efin:Company", "xsd:string", "SIC code."),
    ("hasSICDescription", "efin:Company", "xsd:string", "SIC description."),
    ("hasFiscalYearEnd", "efin:Company", "xsd:string", "Fiscal year end MMDD."),
    ("hasFiscalYear", "efin:MetricObservation", "xsd:integer",
     "Fiscal year of the observation (functional)."),
    ("hasQuarter", "efin:MetricObservation", "xsd:integer",
     "Quarter 1-4 inferred from 10-Q period ends."),
    ("hasPeriodType", "efin:MetricObservation", "xsd:string",
     "duration | instant (keys the Duration/Instant defined classes)."),
    ("hasPeriodEnd", "efin:MetricObservation", "xsd:dateTime",
     "Period end timestamp (T00:00:00)."),
    ("hasNumericValue", "efin:MetricObservation", "xsd:double",
     "The observed value (functional)."),
    ("isDerived", "efin:MetricObservation", "xsd:boolean",
     "Whether the value was computed rather than directly reported."),
    ("hasSourceType", "efin:MetricObservation", "xsd:string",
     "Selection provenance (static-candidate / direct-growth / derived...)."),
    ("hasQName", "efin:XBRLConcept", "xsd:string", "Prefixed XBRL QName."),
    ("hasNamespace", "efin:XBRLConcept", "xsd:anyURI", "QName namespace URI."),
    ("forFiscalYear", None, "xsd:integer",
     "Fiscal year of a benchmark/ranking."),
    ("hasAverageValue", "efin:Benchmark", "xsd:double", "Group mean."),
    ("hasMedianValue", "efin:Benchmark", "xsd:double", "Group median."),
    ("hasMaxValue", "efin:Benchmark", "xsd:double", "Group maximum."),
    ("hasMinValue", "efin:Benchmark", "xsd:double", "Group minimum."),
    ("hasPercentile25", "efin:Benchmark", "xsd:double",
     "Index-based (nearest-rank) 25th percentile."),
    ("hasPercentile75", "efin:Benchmark", "xsd:double",
     "Index-based (nearest-rank) 75th percentile."),
    ("hasSampleSize", "efin:Benchmark", "xsd:integer", "Group cardinality."),
    ("hasRankingType", "efin:Ranking", "xsd:string", "Top10 | All."),
    ("hasRank", "efin:Ranking", "xsd:integer", "1-based rank position."),
    ("hasRankingValue", "efin:Ranking", "xsd:double", "Ranked metric value."),
    ("hasCompositeScore", "efin:Ranking", "xsd:double",
     "Min-max-normalized composite score."),
    ("hasFormulaMath", "efin:DerivedMetric", "xsd:string",
     "Human-readable derivation formula annotation."),
]

_CORE_CLASSES = [
    # FIBO-BE interop axiom: efin:Company subClassOf fibo-be:LegalEntity
    # (mirrors /root/reference/ontology/efin_schema.ttl:36-40; the
    # header owl:imports the FIBO-BE module and write_fibo_be_module
    # ships a minimal resolvable target alongside the schema)
    ("Company", "fibo-be:LegalEntity",
     "A legal entity filing financial reports. Subclasses FIBO-BE "
     "LegalEntity for interoperability with standard finance "
     "ontologies."),
    ("Sector", None, "Sector classification (CamelCase IRI instances)."),
    ("Industry", None, "Industry classification; linked to its sector via inSectorOf."),
    ("Metric", None, "Abstract financial metric concept."),
    ("BaseMetric", "efin:Metric", "Metric observed directly from filings."),
    ("DerivedMetric", "efin:Metric", "Metric computed from other metrics."),
    ("DerivedRatio", "efin:DerivedMetric", "Ratio-shaped derived metric."),
    ("MetricObservation", None,
     "Observed value of a metric for (company, fiscal year, quarter)."),
    ("DurationObservation", "efin:MetricObservation",
     "Defined class: observations with hasPeriodType 'duration'."),
    ("InstantObservation", "efin:MetricObservation",
     "Defined class: observations with hasPeriodType 'instant'."),
    ("Benchmark", None, "Aggregate statistics for a (scope, metric, year)."),
    ("IndustryBenchmark", "efin:Benchmark", "Benchmark scoped to one industry."),
    ("AllBenchmark", "efin:Benchmark", "All-market benchmark (SectorAll)."),
    ("Ranking", None, "Ordered company ranking for a (scope, metric, year)."),
    ("TopRanking", "efin:Ranking", "Top-N ranking entries."),
    ("IndustryTopRanking", "efin:TopRanking", "Top-N within one industry."),
    ("AllTopRanking", "efin:TopRanking", "Top-N across the whole market."),
    ("Unit", None, "Measurement unit (USD, shares, ...)."),
    ("Currency", None, "Currency unit."),
    ("XBRLConcept", None, "Source XBRL reporting concept."),
    ("Composite", "efin:DerivedMetric",
     "The composite (multi-metric normalized sum) pseudo-metric used by "
     "composite rankings."),
]


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"')


def schema_ttl() -> str:
    """The full schema document as Turtle text."""
    lines = [
        "@prefix efin: <https://w3id.org/edgar-fin/2024#> .",
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .",
        "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .",
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .",
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .",
        f"@prefix fibo-be: <{FIBO_BE_IRI}> .",
        "",
        f"<{ONTOLOGY_IRI}>",
        "  a owl:Ontology ;",
        '  rdfs:label "EDGAR Finance Ontology (EFIN) — schema"@en ;',
        '  rdfs:comment "Generated by '
        'edgar_finance_ontology_spark.vocab.schema_ttl from the engine '
        'vocabulary tables."@en ;',
        f"  owl:imports <{FIBO_BE_IRI}> .",
        "",
    ]
    for name, parent, comment in _CORE_CLASSES:
        lines.append(f"efin:{name}")
        lines.append("  a owl:Class ;")
        if parent:
            lines.append(f"  rdfs:subClassOf {parent} ;")
        lines.append(f'  rdfs:label "{name}"@en ;')
        lines.append(f'  rdfs:comment "{_esc(comment)}"@en .')
        lines.append("")
    for m in BASE_METRICS:
        lines += [
            f"efin:{m}",
            "  a owl:Class ;",
            "  rdfs:subClassOf efin:BaseMetric ;",
            f'  rdfs:label "{m}"@en .',
            "",
        ]
    for m in DERIVED_METRICS:
        parent = "efin:DerivedRatio" if m in DERIVED_RATIOS else "efin:DerivedMetric"
        lines.append(f"efin:{m}")
        lines.append("  a owl:Class ;")
        lines.append(f"  rdfs:subClassOf {parent} ;")
        if m in FORMULAS:
            lines.append(f'  efin:hasFormulaMath "{_esc(FORMULAS[m])}"@en ;')
        lines.append(f'  rdfs:label "{m}"@en .')
        lines.append("")
    for name, domain, rng, comment in _OBJECT_PROPERTIES:
        lines.append(f"efin:{name}")
        lines.append("  a owl:ObjectProperty ;")
        if domain:
            lines.append(f"  rdfs:domain {domain} ;")
        lines.append(f"  rdfs:range {rng} ;")
        lines.append(f'  rdfs:comment "{_esc(comment)}"@en .')
        lines.append("")
    for name, domain, rng, comment in _DATATYPE_PROPERTIES:
        lines.append(f"efin:{name}")
        lines.append("  a owl:DatatypeProperty ;")
        if domain:
            lines.append(f"  rdfs:domain {domain} ;")
        lines.append(f"  rdfs:range {rng} ;")
        lines.append(f'  rdfs:comment "{_esc(comment)}"@en .')
        lines.append("")
    # reasoner-defined leader classes (served as Spark SQL views in
    # plans/views.py; declared here so the schema covers the full
    # reference query surface — efin_schema.ttl:511-577 analog)
    for scope, cls in (("Industry", "IndustryCompositeTop10LeaderCompany"),
                       ("All", "AllCompositeTop10LeaderCompany")):
        rk = "efin:IndustryTopRanking" if scope == "Industry" else "efin:AllTopRanking"
        lines += [
            f"efin:{cls}",
            "  a owl:Class ;",
            "  owl:equivalentClass [",
            "    a owl:Class ;",
            "    owl:intersectionOf ( efin:Company [",
            "      a owl:Restriction ;",
            "      owl:onProperty efin:hasRanking ;",
            "      owl:someValuesFrom [",
            "        a owl:Class ;",
            f"        owl:intersectionOf ( {rk}",
            "          [ a owl:Restriction ; owl:onProperty efin:forMetric ;"
            " owl:hasValue efin:Composite ]",
            "          [ a owl:Restriction ; owl:onProperty efin:hasRankingType ;"
            ' owl:hasValue "Top10" ] )',
            "      ]",
            "    ] )",
            "  ] ;",
            f'  rdfs:label "{cls}"@en .',
            "",
        ]
    return "\n".join(lines)


def fibo_be_min_ttl() -> str:
    """A minimal, self-authored FIBO-BE module so the schema's
    owl:imports target resolves offline: it declares the one class the
    interop axiom needs (fibo-be:LegalEntity) under the module IRI the
    reference imports. FIBO itself is published by the EDM Council
    under MIT; this stub only restates the class IRI + label, it does
    not vendor their text."""
    return "\n".join([
        f"@prefix fibo-be: <{FIBO_BE_IRI}> .",
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .",
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .",
        "",
        f"<{FIBO_BE_IRI}>",
        "  a owl:Ontology ;",
        '  rdfs:label "FIBO Business Entities (minimal interop module)"'
        "@en ;",
        '  rdfs:comment "Minimal offline stand-in for the EDM Council '
        "FIBO-BE module: declares the LegalEntity class the EFIN schema"
        ' subclasses. Replace with the full FIBO-BE release for complete'
        ' semantics."@en .',
        "",
        "fibo-be:LegalEntity",
        "  a owl:Class ;",
        '  rdfs:label "LegalEntity"@en ;',
        '  rdfs:comment "Any natural person or organization capable of'
        ' accruing liability on its own part."@en .',
        "",
    ])


def write_schema(path: str) -> str:
    with open(path, "w") as f:
        f.write(schema_ttl())
    return path


def write_fibo_be_module(path: str) -> str:
    with open(path, "w") as f:
        f.write(fibo_be_min_ttl())
    return path
