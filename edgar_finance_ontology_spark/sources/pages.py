"""Synthetic Common-Crawl-style pages embedding the panel's facts.

The graft's input table (BASELINE.json input_hint): pages(url string,
warc_ts timestamp, html binary, text string, lang string). The
generator renders every fact record of the synthetic company panel
into deterministic HTML filing pages (plus company profile pages and
boilerplate/noise), so the web pipeline can be gated against the SAME
reference golden set as the companyfacts pipeline.

Head-entity skew: company 0's records are replicated across
`skew_copies` extra pages (content-identical, distinct urls), giving
the Zipfian head the skew tests need; the fact parser dedups records
by (cik, qname, unit, accn, end, fp, segment), so replicas don't
change semantics.
"""

from __future__ import annotations

import datetime as dt
import html as html_mod

from pyspark.sql import DataFrame, SparkSession

from .schemas import PAGES_SCHEMA
from .synthetic import build_panel

_BOILER_NAV = (
    "<nav><ul><li>Home</li><li>Filings</li><li>About</li>"
    "<li>Subscribe to our newsletter!</li></ul></nav>"
)
_BOILER_FOOTER = (
    "<footer>© 2025 Example Filings Mirror. Terms of Use. Privacy."
    "</footer>"
)


def fact_sentence(cik10: str, qname: str, unit: str, rec: dict) -> str:
    """One structured filing sentence carrying a full fact record."""
    seg = rec.get("segment") or ""
    qtrs = rec.get("qtrs")
    parts = [
        f"CIK {cik10} reported {qname} of {rec['val']!r} {unit}",
        f"for the period ending {rec['end']}",
        f"(fiscal year {rec['fy']}, fp {rec.get('fp') or 'NA'},"
        f" form {rec.get('form') or 'NA'},"
        f" accession {rec.get('accn') or 'NA'},"
        f" qtrs {qtrs if qtrs is not None else 'NA'},"
        f" segment {seg or 'NA'})",
    ]
    return " ".join(parts) + "."


def profile_sentence(meta: dict, subs: dict) -> str:
    return (
        f"Company profile: {meta['name']} (ticker {meta['symbol']}, CIK "
        f"{meta['cik']}) files under SIC {subs['sic']} "
        f"({subs['sicDescription']}); fiscal year ends {subs['fiscalYearEnd']}."
    )


def _page_html(title: str, sentences: list[str]) -> str:
    body = "".join(
        f"<p>{html_mod.escape(s, quote=False)}</p>" for s in sentences
    )
    return (
        f"<html><head><title>{html_mod.escape(title)}</title></head><body>"
        f"{_BOILER_NAV}<main><h1>{html_mod.escape(title)}</h1>{body}</main>"
        f"{_BOILER_FOOTER}</body></html>"
    )


def build_page_rows(
    facts_per_page: int = 3,
    skew_copies: int = 8,
    noise_pages: int = 20,
    n_companies: int = 12,
) -> list[tuple]:
    """Deterministic (url, warc_ts, html, text, lang) rows; `text` is
    left None — the extraction operator fills it."""
    rows: list[tuple] = []

    def add(url: str, ts: dt.datetime, title: str, sentences: list[str]):
        html = _page_html(title, sentences).encode("utf-8")
        rows.append((url, ts, html, None, "en"))

    for entry in build_panel(n_companies):
        meta, fj, subs = entry["meta"], entry["facts"], entry["subs"]
        cik10 = meta["cik"]
        # profile page
        add(
            f"https://filings.example.com/{cik10}/profile.html",
            dt.datetime(2025, 1, 1, 0, 0, 0),
            f"{meta['name']} profile",
            [profile_sentence(meta, subs)],
        )
        # filing pages: pack fact sentences
        sentences = []
        for tax in fj["facts"]:
            for tag, body in fj["facts"][tax].items():
                for unit, recs in body["units"].items():
                    for rec in recs:
                        sentences.append(
                            fact_sentence(cik10, f"{tax}:{tag}", unit, rec)
                        )
        chunks = [
            sentences[i:i + facts_per_page]
            for i in range(0, len(sentences), facts_per_page)
        ]
        n_copies = 1 + (skew_copies if cik10.endswith("100001") else 0)
        for copy in range(n_copies):
            for i, chunk in enumerate(chunks):
                suffix = f"facts-{i:04d}" + (f"-dup{copy}" if copy else "")
                add(
                    f"https://filings.example.com/{cik10}/{suffix}.html",
                    dt.datetime(2025, 1, 2, 0, 0, 0) + dt.timedelta(minutes=i),
                    f"{meta['name']} filing extract {i}",
                    chunk,
                )

    for i in range(noise_pages):
        add(
            f"https://noise.example.org/post/{i:05d}.html",
            dt.datetime(2025, 2, 1) + dt.timedelta(hours=i),
            f"Unrelated blog post {i}",
            [
                f"This is unrelated web prose number {i}. Revenue of the "
                "blogger's imagination is unbounded, but no filing facts "
                "live here.",
                "Lorem ipsum dolor sit amet, consectetur adipiscing elit.",
            ],
        )
    return rows


def synthesize_pages(
    spark: SparkSession,
    facts_per_page: int = 3,
    skew_copies: int = 8,
    noise_pages: int = 20,
    n_buckets: int = 16,
    n_companies: int = 12,
) -> DataFrame:
    """The pages table, repartitioned by url-hash bucket (the lineage
    unit — stands in for Iceberg bucket(url) partitioning)."""
    from pyspark.sql import functions as F

    rows = build_page_rows(facts_per_page, skew_copies, noise_pages, n_companies)
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    return df.withColumn(
        "bucket", F.pmod(F.hash("url"), F.lit(n_buckets)).cast("int")
    ).repartition(n_buckets, "bucket")
