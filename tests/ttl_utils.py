"""Pragmatic parser for the reference's Turtle dialect -> triple set.

Handles exactly the shapes emit_efin_ttl produces: multi-line subject
blocks ("S a C ;" / "  pred obj ;" ... "."), single-line statements
("S p o ."), comments, prefixes and the ontology header. Good enough
for set-level P/R comparison; not a general Turtle parser.
"""

from __future__ import annotations


def parse_ttl_triples(text: str) -> set[tuple[str, str, str]]:
    triples: set[tuple[str, str, str]] = set()
    subject = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or line.startswith("@prefix"):
            continue
        if line.startswith("<https://w3id.org/edgar-fin/2024/instances>"):
            subject = "__header__"
            continue
        if subject == "__header__":
            if line.endswith("."):
                subject = None
            continue
        if line == ".":
            subject = None
            continue
        terminated = line.endswith(" .") or line == "." or line.endswith(";") is False and line.endswith(".")
        body = line.rstrip()
        end_block = False
        if body.endswith(" ;") or body.endswith(";"):
            body = body.rstrip(";").rstrip()
        elif body.endswith(" .") or body.endswith("."):
            body = body[:-1].rstrip()
            end_block = True
        if subject is None:
            # new statement: "S a C" or "S p o"
            parts = body.split(" ", 2)
            if len(parts) == 3:
                s, p, o = parts
                triples.add((s, "rdf:type" if p == "a" else p, o.strip()))
                if not end_block:
                    subject = s
        else:
            parts = body.split(" ", 1)
            if len(parts) == 2:
                p, o = parts
                triples.add(
                    (subject, "rdf:type" if p == "a" else p, o.strip())
                )
            if end_block:
                subject = None
        if end_block:
            subject = None
    return triples


def precision_recall(
    ours: set[tuple], ref: set[tuple]
) -> tuple[float, float]:
    if not ours or not ref:
        return (0.0, 0.0)
    tp = len(ours & ref)
    return tp / len(ours), tp / len(ref)
