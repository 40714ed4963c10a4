"""RSS / Atom feed source: syndication feeds -> frontier seed candidates.

The third declarative seed channel next to the I2P addressbook
(sources/i2p.py) and sitemaps (sources/sitemap.py): the reference has no
feed support (no match for 'rss' / 'atom' / '<item>' anywhere in
/root/reference/app), but feeds are the one seed source that carries a
PUBLICATION TIME per URL, which feeds the recrawl scheduler
(crawler/freshness.py) with real change evidence instead of probe
history.

Same design stance as parse_sitemap: pure column expressions (regexp
span extraction over the XML text), never a DOM parse — feeds are
machine-generated and flat, so tag-regex extraction keeps the whole
plan in codegen. Both wire formats are handled in ONE pass:

  RSS 2.0   <item>  ... <link>URL</link> ... <pubDate>D</pubDate>
  Atom      <entry> ... <link href="URL"/> ... <updated>D</updated>

Files arrive as (source, content) rows exactly like subscription and
sitemap files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENTRY_BLOCK = r"(?s)<item>.*?</item>|<entry>.*?</entry>"
_RSS_LINK = r"(?s)<link>\s*([^<]*?)\s*</link>"
_ATOM_LINK = r'<link href="([^"]*)"'
_RSS_DATE = r"(?s)<pubDate>\s*([^<]*?)\s*</pubDate>"
_ATOM_DATE = r"(?s)<updated>\s*([^<]*?)\s*</updated>"


def parse_feed(feeds: DataFrame, xml_col: str = "content",
               keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Feed XML -> one row per item/entry:
    (keep_cols..., url, published, fmt).

    ``fmt`` is 'rss' or 'atom' per block (a mixed aggregator batch is
    fine — format is decided per item, not per file). Blocks without a
    resolvable link are dropped; ``published`` is the raw declared
    timestamp string (NULL when the block has none) — parsing it to a
    typed timestamp is the caller's locale decision."""
    blocks = feeds.select(
        *keep_cols,
        F.explode(F.regexp_extract_all(F.col(xml_col),
                                       F.lit(_ENTRY_BLOCK),
                                       F.lit(0))).alias("_b"))
    b = F.col("_b")
    is_rss = b.startswith("<item>")
    url = F.when(is_rss, F.regexp_extract(b, _RSS_LINK, 1)) \
           .otherwise(F.regexp_extract(b, _ATOM_LINK, 1))
    published = F.when(is_rss, F.regexp_extract(b, _RSS_DATE, 1)) \
                 .otherwise(F.regexp_extract(b, _ATOM_DATE, 1))
    return (blocks
            .select(*keep_cols,
                    F.nullif(url, F.lit("")).alias("url"),
                    F.nullif(published, F.lit("")).alias("published"),
                    F.when(is_rss, F.lit("rss")).otherwise(F.lit("atom"))
                    .alias("fmt"))
            .filter(F.col("url").isNotNull()))


def feed_candidates(parsed: DataFrame) -> DataFrame:
    """Aggregator semantics over parsed items: the same link shows up
    in every poll of the feed (and often in several feeds), so dedupe
    by URL keeping the EARLIEST declared publication string and the
    lexically-min format tag for determinism. Output is frontier-
    candidate shaped: one row per distinct URL."""
    return (parsed
            .groupBy("url")
            .agg(F.min("published").alias("published"),
                 F.min("fmt").alias("fmt"),
                 F.count(F.lit(1)).cast("long").alias("n_sightings")))
