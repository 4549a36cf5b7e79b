"""The generated schema ontology must resolve every efin: class,
property, and metric IRI the emitted instance graph uses — the
instances owl:import it (emit/turtle.py header), so a consumer loading
header + schema + instances gets a closed vocabulary.

Parsed with the repo's own pragmatic Turtle parser (rdflib is not in
the container; gated import below uses it when present)."""

import pathlib
import re
import sys

import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).parent))

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _schema_subjects(ttl: str) -> dict[str, str]:
    """{efin:Name: first rdf:type}"""
    out = {}
    subj = None
    for line in ttl.splitlines():
        s = line.strip()
        m = re.match(r"^(efin:\w+)$", s)
        if m:
            subj = m.group(1)
            continue
        if subj and s.startswith("a "):
            out[subj] = s[2:].rstrip(" ;.").strip()
            subj = None
    return out


def test_schema_covers_all_instance_vocabulary():
    from edgar_finance_ontology_spark.vocab.schema_ttl import schema_ttl

    decls = _schema_subjects(schema_ttl())
    triples = pd.read_parquet(GOLDEN / "kg_triples.parquet")

    used_classes = {
        o for o in triples.loc[triples["pred"] == "rdf:type", "obj"]
        if o.startswith("efin:")
    }
    used_props = {
        p for p in triples["pred"].unique()
        if p.startswith("efin:")
    }
    used_metrics = {
        o for o in triples.loc[
            triples["pred"].isin(
                ["efin:observesMetric", "efin:forMetric",
                 "efin:computedFromMetric"]
            ),
            "obj",
        ]
    }

    missing_classes = {
        c for c in used_classes
        if decls.get(c) != "owl:Class"
    }
    assert not missing_classes, missing_classes

    missing_props = {
        p for p in used_props
        if decls.get(p) not in ("owl:ObjectProperty", "owl:DatatypeProperty")
    }
    assert not missing_props, missing_props

    missing_metrics = {m for m in used_metrics if decls.get(m) != "owl:Class"}
    assert not missing_metrics, missing_metrics


def test_schema_declares_hierarchy_and_leader_classes():
    from edgar_finance_ontology_spark.vocab.schema_ttl import schema_ttl

    ttl = schema_ttl()
    for marker in (
        "rdfs:subClassOf efin:BaseMetric",
        "rdfs:subClassOf efin:DerivedMetric",
        "rdfs:subClassOf efin:DerivedRatio",
        "efin:IndustryCompositeTop10LeaderCompany",
        "efin:AllCompositeTop10LeaderCompany",
        "owl:hasValue efin:Composite",
        "efin:hasFormulaMath",
    ):
        assert marker in ttl, marker


def test_schema_parses_with_rdflib_when_available():
    try:
        import rdflib
    except ImportError:
        import pytest

        pytest.skip("rdflib not installed in this container")
    from edgar_finance_ontology_spark.vocab.schema_ttl import schema_ttl

    g = rdflib.Graph()
    g.parse(data=schema_ttl(), format="turtle")
    assert len(g) > 300
