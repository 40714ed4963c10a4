"""Sitemap XML source: sitemaps.org protocol files -> frontier seeds.

A north-star seed source next to the I2P addressbook (sources/i2p.py):
the reference has no sitemap support (no match for 'sitemap' anywhere in
/root/reference/app), but a production frontier feeder wants it — it is
the one seed channel where the site itself declares URL priority and
change frequency, which feed straight into the recrawl scheduler
(crawler/freshness.py).

Parsing is pure column expressions (regexp over the XML text), NOT a
DOM parse: sitemap files are machine-generated, flat, and spec-bounded
(<=50k URLs / 50 MB uncompressed per file), so tag-regex extraction is
the standard large-pipeline approach and keeps the whole plan in
codegen — one `regexp_extract_all` explode plus per-field
`regexp_extract`, no Python. Files arrive as (source_url, content)
rows exactly like subscription files; fetching the files is the same
driver-side fetch_fn plumbing as i2p.fetch_subscriptions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_SITEMAP_LOC = r"(?s)<sitemap>.*?<loc>\s*(\S+?)\s*</loc>.*?</sitemap>"


def _field(block, tag: str):
    got = F.regexp_extract(block, rf"(?s)<{tag}>\s*(.*?)\s*</{tag}>", 1)
    return F.nullif(got, F.lit(""))


def parse_sitemap(sitemaps: DataFrame, xml_col: str = "content",
                  keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """<urlset> entries -> one row per <url> block:
    (keep_cols..., loc, lastmod, changefreq, priority). `loc` is
    required per the protocol — blocks without one are dropped;
    `priority` defaults to the spec's 0.5 when absent."""
    blocks = sitemaps.select(
        *keep_cols,
        F.explode(F.regexp_extract_all(F.col(xml_col),
                                       F.lit(_URL_BLOCK),
                                       F.lit(1))).alias("_b"))
    b = F.col("_b")
    return (blocks
            .select(*keep_cols,
                    _field(b, "loc").alias("loc"),
                    _field(b, "lastmod").alias("lastmod"),
                    _field(b, "changefreq").alias("changefreq"),
                    F.coalesce(_field(b, "priority").cast("double"),
                               F.lit(0.5)).alias("priority"))
            .filter(F.col("loc").isNotNull()))


def sitemap_index_locs(sitemaps: DataFrame,
                       xml_col: str = "content") -> DataFrame:
    """<sitemapindex> files -> (loc) rows of child sitemap URLs; the
    driver loops fetch over these (nesting is spec-capped at one
    level, so recursion is a bounded driver-side loop, never a plan)."""
    return (sitemaps
            .select(F.explode(
                F.regexp_extract_all(F.col(xml_col),
                                     F.lit(_SITEMAP_LOC),
                                     F.lit(1))).alias("loc"))
            .filter(F.col("loc") != ""))
