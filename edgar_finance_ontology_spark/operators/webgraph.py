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


# full <a> tag with its text: group 1 = href value, group 2 = anchor
# text (nearest-tag body, no nested markup)
_ANCHOR_DQ = r'<a\s[^>]*href\s*=\s*"([^"]*)"[^>]*>([^<]*)</a>'
_ANCHOR_SQ = r"<a\s[^>]*href\s*=\s*'([^']*)'[^>]*>([^<]*)</a>"


def extract_anchors(pages: DataFrame, url_col: str = "url",
                    html_col: str = "html") -> DataFrame:
    """(src, dst, anchor) hyperlink edges WITH their anchor text — the
    classic alias-evidence signal for entity linking (the text the web
    uses to refer to a link target). Href and text come from the SAME
    regex pass (group 1 / group 2), so the two arrays align by
    construction and zip positionally; both quote styles are covered.
    Only absolute http(s) targets are kept (see extract_links on why
    relative targets don't matter at this grain)."""
    h = _html_str(F.col(html_col))

    def pairs(pat):
        return F.arrays_zip(
            F.regexp_extract_all(h, F.lit(pat), 1).alias("dst"),
            F.regexp_extract_all(h, F.lit(pat), 2).alias("anchor"),
        )

    out = pages.select(
        F.col(url_col).alias("src"),
        F.explode(
            F.concat(pairs(_ANCHOR_DQ), pairs(_ANCHOR_SQ))
        ).alias("p"),
    ).select(
        "src", F.col("p.dst").alias("dst"),
        F.col("p.anchor").alias("anchor"),
    )
    return out.where(F.col("dst").rlike(r"^[Hh][Tt][Tt][Pp][Ss]?://"))


def anchor_alias_counts(anchors: DataFrame,
                        suffix_file: str | None = None) -> DataFrame:
    """(entity_domain, alias, n) — how often each normalized anchor
    string names each registrable target domain, aggregated web-wide.
    This is the prior-evidence table the entity-linking stage consumes
    (alias strings with high counts for one domain are strong link
    candidates; operators/linking.py's scorer takes exactly such a
    candidate table). Normalization: lower, trim, inner whitespace
    collapsed; empty anchors dropped. One map-side-combined exchange
    on (domain, alias)."""
    alias = F.regexp_replace(
        F.trim(F.lower(F.col("anchor"))), r"\s+", " "
    )
    e = anchors.select(
        registrable_domain(F.col("dst"), suffix_file=suffix_file)
        .alias("entity_domain"),
        alias.alias("alias"),
    ).where(
        F.col("entity_domain").isNotNull() & (F.col("alias") != "")
    )
    return e.groupBy("entity_domain", "alias").agg(
        F.count("*").cast("long").alias("n")
    )


def anchor_candidates(alias_counts: DataFrame) -> DataFrame:
    """(surface, entity_id, prior): the anchor-commonness prior
    P(entity | alias) — each alias's count share across the domains it
    names (the classic Wikipedia-anchor linking prior, computed here
    from web-wide href evidence instead of a curated dump). Output is
    shaped for link_mentions' candidate table (operators/linking.py),
    so the web graph feeds the north-star linking stage directly.
    The per-alias window is bounded by the handful of domains an alias
    actually names — no corpus-scale window frames."""
    from pyspark.sql import Window

    w = Window.partitionBy("alias")
    return alias_counts.select(
        F.col("alias").alias("surface"),
        F.col("entity_domain").alias("entity_id"),
        (F.col("n") / F.sum("n").over(w)).alias("prior"),
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
