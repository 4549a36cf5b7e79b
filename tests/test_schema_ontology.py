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


def test_schema_declares_fibo_alignment():
    """The interop axiom the reference ships (efin_schema.ttl:36-40):
    efin:Company subclasses fibo-be:LegalEntity, the fibo-be prefix is
    declared, the FIBO-BE module is owl:imported, and the generated
    minimal module actually defines the target class."""
    from edgar_finance_ontology_spark.vocab.schema_ttl import (
        FIBO_BE_IRI, fibo_be_min_ttl, schema_ttl,
    )

    ttl = schema_ttl()
    assert f"@prefix fibo-be: <{FIBO_BE_IRI}> ." in ttl
    assert f"owl:imports <{FIBO_BE_IRI}> ." in ttl
    company = ttl.split("efin:Company\n", 1)[1].split("\n\n", 1)[0]
    assert "rdfs:subClassOf fibo-be:LegalEntity ;" in company

    mod = fibo_be_min_ttl()
    assert f"<{FIBO_BE_IRI}>" in mod
    assert "fibo-be:LegalEntity" in mod
    assert "a owl:Class ;" in mod


def test_schema_and_fibo_module_parse_with_rdflib_when_available():
    try:
        import rdflib
    except ImportError:
        import pytest

        pytest.skip("rdflib not installed in this container")
    from edgar_finance_ontology_spark.vocab.schema_ttl import (
        FIBO_BE_IRI, fibo_be_min_ttl, schema_ttl,
    )

    g = rdflib.Graph()
    g.parse(data=schema_ttl(), format="turtle")
    g.parse(data=fibo_be_min_ttl(), format="turtle")
    company = rdflib.URIRef("https://w3id.org/edgar-fin/2024#Company")
    legal = rdflib.URIRef(FIBO_BE_IRI + "LegalEntity")
    assert (company, rdflib.RDFS.subClassOf, legal) in g
    assert (legal, rdflib.RDF.type, rdflib.OWL.Class) in g
