"""Web link graph: hyperlink extraction from raw pages and the
domain-level PageRank prior built on it.

The classic crawl-quality signal: a page's registrable domain earns
reputation from who links to it, and that prior feeds ranking /
filtering / entity-linking decisions downstream. Everything here is
column-native (regexp over the decoded HTML, HOF-free URL surgery from
functions/urls) and the centrality kernel is the existing
integer-exact `pagerank_int` — no new iteration machinery.

Scale posture: link extraction is a pure narrow map + explode (rows ~
out-degree per page, the web graph's natural size); the domain edge
set aggregates by (src_domain, dst_domain) with map-side combine —
domain-grain cardinality (~10^8) is orders below page grain (10^12) —
and PageRank then iterates over that contracted graph only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import registrable_domain

# href/src attribute values, both quote styles. Single regex pass per
# style; attribute-order and spacing insensitive.
_HREF_DQ = r'href\s*=\s*"([^"]*)"'
_HREF_SQ = r"href\s*=\s*'([^']*)'"


def _html_str(html: Column) -> Column:
    """Binary HTML as a UTF-8 string (the pages-frame convention;
    binary cast decodes UTF-8, invalid sequences replaced)."""
    return html.cast("string")


def extract_links(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(src, dst) hyperlink edges from raw page HTML.

    Kept dst forms: absolute http(s) URLs and protocol-relative
    `//host/...` (resolved with the src scheme). Path-relative hrefs
    are DROPPED, not resolved — domain-grain analysis never needs
    them (a relative link is same-domain by definition and would only
    add self-loops), and full RFC 3986 reference resolution is
    presentation logic this graph does not depend on. Fragment-only
    and javascript:/mailto: links are dropped with them."""
    h = _html_str(F.col(html_col))
    raw = F.array_union(
        F.regexp_extract_all(h, F.lit(_HREF_DQ), 1),
        F.regexp_extract_all(h, F.lit(_HREF_SQ), 1),
    )
    out = pages.select(
        F.col(url_col).alias("src"),
        F.explode(raw).alias("_href"),
    )
    src_scheme = F.regexp_extract(
        F.col("src"), r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1
    )
    dst = F.when(
        F.col("_href").rlike(r"^[Hh][Tt][Tt][Pp][Ss]?://"),
        F.col("_href"),
    ).when(
        F.col("_href").startswith("//"),
        F.concat(src_scheme, F.lit(":"), F.col("_href")),
    )
    return out.select(
        "src", dst.alias("dst")
    ).where(F.col("dst").isNotNull())


def domain_edges(links: DataFrame,
                 suffix_file: str | None = None) -> DataFrame:
    """(src, dst, n_links) distinct registrable-domain edges with link
    counts, self-loops removed — the contracted graph PageRank
    iterates on."""
    e = links.select(
        registrable_domain(F.col("src"), suffix_file=suffix_file)
        .alias("src"),
        registrable_domain(F.col("dst"), suffix_file=suffix_file)
        .alias("dst"),
    ).where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
        & (F.col("src") != F.col("dst"))
    )
    return e.groupBy("src", "dst").agg(
        F.count("*").cast("long").alias("n_links")
    )


def domain_pagerank(pages: DataFrame, iters: int = 5,
                    suffix_file: str | None = None,
                    url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """Per-domain PageRank prior straight from raw pages: extract
    hyperlinks, contract to the registrable-domain graph, run the
    integer-exact kernel. Returns (id, rank_units) — see pagerank_int
    for the determinism contract."""
    from .graphs import pagerank_int

    edges = domain_edges(
        extract_links(pages, url_col, html_col), suffix_file
    )
    return pagerank_int(edges.select("src", "dst"), iters=iters)
