"""Feed / sitemap discovery as DataFrame operators.

Re-expression of the reference's crawling-adjacent parsers
(/root/reference/lib/src/feeds.dart:228-350, sitemaps.dart:15-21,
53-188) for batch corpora: given a column of fetched XML documents,
extract candidate URLs with JVM-side regex ops (`regexp_extract_all`) —
no Python in the loop, so discovery over billions of fetched sitemaps is
a scan-bound map.

The reference's HTTP fetching itself is out of scope for the batch north
rule (downloads.dart); streaming ingestion composes via
``trafilatura_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# sitemaps.dart:15-21: <loc>…</loc> entries
_SITEMAP_LOC = r"<loc>(.*?)</loc>"
# feeds.dart:39-63: RSS <link>…</link>, Atom <link … href="…">, and
# JSON-feed "url": "…" entries
_RSS_LINK = r"<link>(.*?)</link>"
_ATOM_HREF = r'<link[^>]*?href="([^"]+)"'
_JSON_URL = r'"url"\s*:\s*"([^"]+)"'


def extract_sitemap_urls(df: DataFrame, xml_col: str = "xml",
                         id_col: str = "source") -> DataFrame:
    """One row per <loc> URL, document order preserved via posexplode."""
    return (
        df.select(F.col(id_col),
                  F.posexplode(F.regexp_extract_all(F.col(xml_col),
                                                    F.lit(_SITEMAP_LOC), 1))
                  .alias("pos", "url"))
    )


def extract_feed_urls(df: DataFrame, xml_col: str = "xml",
                      id_col: str = "source") -> DataFrame:
    """RSS + Atom link extraction, de-duplicated per feed."""
    links = F.array_union(
        F.array_union(
            F.regexp_extract_all(F.col(xml_col), F.lit(_RSS_LINK), 1),
            F.regexp_extract_all(F.col(xml_col), F.lit(_ATOM_HREF), 1),
        ),
        F.when(F.trim(F.col(xml_col)).startswith("{"),
               F.regexp_extract_all(F.col(xml_col), F.lit(_JSON_URL), 1))
        .otherwise(F.array().cast("array<string>")),
    )
    return df.select(F.col(id_col), F.explode(links).alias("url")).distinct()


# sitemaps.dart:44-50 default guesses
SITEMAP_GUESSES = ["sitemap.xml", "sitemap.xml.gz", "sitemap",
                   "sitemap_index.xml", "sitemap_news.xml"]

# sitemaps.dart:15-21 hreflang alternates
_HREFLANG_HREF = r'href="([^"]+)"'


def guess_sitemap_urls(homepage: str) -> list[str]:
    """Base URL + domain + candidate sitemap locations
    (sitemaps.dart:219-289 sitemapSearch bootstrap)."""
    from urllib.parse import urlparse
    u = urlparse(homepage)
    base = f"{u.scheme}://{u.netloc}"
    return [f"{base}/{g}" for g in SITEMAP_GUESSES]


def extract_hreflang_urls(df: DataFrame, xml_col: str = "xml",
                          id_col: str = "source",
                          lang: str | None = None) -> DataFrame:
    """hreflang alternate links from sitemap XML (sitemaps.dart:324-368);
    optional language filter on the hreflang attribute."""
    pat = (rf'<xhtml:link[^>]*hreflang="{lang}[^"]*"[^>]*href="([^"]+)"'
           if lang else r'<xhtml:link[^>]*href="([^"]+)"')
    return (
        df.select(F.col(id_col),
                  F.explode(F.regexp_extract_all(F.col(xml_col),
                                                 F.lit(pat), 1)).alias("url"))
        .distinct()
    )


def same_domain(url_a: Column, url_b: Column) -> Column:
    """Same-host gate used by feed validation (feeds.dart:103-135)."""
    return F.parse_url(url_a, F.lit("HOST")) == F.parse_url(url_b, F.lit("HOST"))


def filter_known(urls: DataFrame, known: DataFrame,
                 url_col: str = "url") -> DataFrame:
    """Crawl-frontier dedup (UrlStore analog): anti-join against the
    known-URL table — broadcast when small, shuffle-hash otherwise."""
    return urls.join(known.select(url_col).distinct(), url_col, "left_anti")
