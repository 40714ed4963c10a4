"""Explicit StructTypes for every table the engine touches (never inferSchema).

Shapes follow SURVEY.md §1 / FIXTURES.md; the documents/spans shape is the
BASELINE.json input_hint contract. Reference record types:
url_model (url_model.py:6-9), index_model (index_model.py:4-24), the Mongo
frontier document (mongo_request_generator.py:14-40).
"""

from pyspark.sql import types as T

# interleaved text+media payload — the canonical doc shape (input_hint)
SPAN = T.StructType([
    T.StructField("kind", T.StringType(), False),       # title|heading|text|section|image|video|document|archive|link
    T.StructField("text", T.StringType(), True),        # null for media/link spans
    T.StructField("media_ref", T.StringType(), True),   # null for text spans
    T.StructField("offset", T.IntegerType(), False),    # 0-based document order
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("spans", T.ArrayType(SPAN), True),
])

# full parsed-page row: spans + the scalar columns the reference index_model
# carries (index_model.py:4-24); emitted by the parse operator
PARSED_PAGE = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("base_url", T.StringType(), True),
    T.StructField("network", T.StringType(), True),
    T.StructField("title", T.StringType(), True),
    T.StructField("meta_description", T.StringType(), True),
    T.StructField("content", T.StringType(), True),
    T.StructField("important_content", T.StringType(), True),
    T.StructField("meta_keywords", T.StringType(), True),
    T.StructField("content_type", T.ArrayType(T.StringType()), True),
    T.StructField("sub_url", T.ArrayType(T.StringType()), True),
    T.StructField("images", T.ArrayType(T.StringType()), True),
    T.StructField("videos", T.ArrayType(T.StringType()), True),
    T.StructField("documents", T.ArrayType(T.StringType()), True),
    T.StructField("archives", T.ArrayType(T.StringType()), True),
    T.StructField("clearnet_links", T.ArrayType(T.StringType()), True),
    T.StructField("sections", T.ArrayType(T.StringType()), True),
    T.StructField("names", T.ArrayType(T.StringType()), True),
    T.StructField("emails", T.ArrayType(T.StringType()), True),
    T.StructField("phone_numbers", T.ArrayType(T.StringType()), True),
    T.StructField("validity_score", T.IntegerType(), True),
    T.StructField("spans", T.ArrayType(SPAN), True),
])

# frontier table (SURVEY.md §1.2): Mongo index_model collection re-expressed
FRONTIER = T.StructType([
    T.StructField("url_hash", T.LongType(), False),     # xxhash64(canonical url)
    T.StructField("url", T.StringType(), False),        # canonical
    T.StructField("host_key", T.StringType(), False),
    T.StructField("depth", T.IntegerType(), False),
    T.StructField("network", T.StringType(), False),
    T.StructField("state", T.StringType(), False),      # pending|in_flight|done|dead
    T.StructField("installed_at", T.TimestampType(), False),
    T.StructField("seq", T.LongType(), False),          # global install sequence
    T.StructField("fail_count", T.IntegerType(), False),
    T.StructField("round", T.IntegerType(), False),
    # ordering lineage: how this URL entered the frontier
    T.StructField("parent_seq", T.LongType(), True),    # crawl_seq of parent page
    T.StructField("link_pos", T.IntegerType(), True),   # document-order link index
])

SEEDS = T.StructType([
    T.StructField("seed_id", T.LongType(), False),
    T.StructField("url", T.StringType(), False),        # pre-canonical form
    T.StructField("installed_at", T.TimestampType(), False),
])

WEB_PAGES = T.StructType([
    T.StructField("url_hash", T.LongType(), False),
    T.StructField("url", T.StringType(), False),        # canonical
    T.StructField("host_key", T.StringType(), False),
    T.StructField("status", T.IntegerType(), False),    # 200 | 404 | 0 (timeout)
    T.StructField("redirect_url", T.StringType(), True),
    T.StructField("html", T.StringType(), True),
    T.StructField("out_links", T.ArrayType(T.StringType()), True),
])

SEEN = T.StructType([
    T.StructField("url_hash", T.LongType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("host_key", T.StringType(), False),
])

CRAWL_ORDER = T.StructType([
    T.StructField("crawl_seq", T.LongType(), False),
    T.StructField("round", T.IntegerType(), False),
    T.StructField("host_key", T.StringType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("depth", T.IntegerType(), False),
    T.StructField("attempts", T.IntegerType(), False),
    T.StructField("ok", T.BooleanType(), False),
])

ROBOTS = T.StructType([
    T.StructField("host_key", T.StringType(), False),
    T.StructField("disallow", T.ArrayType(T.StringType()), True),
    T.StructField("crawl_delay", T.DoubleType(), True),
    T.StructField("fetched_at", T.TimestampType(), True),
])

METRICS = T.StructType([
    T.StructField("round", T.IntegerType(), False),
    T.StructField("partition_id", T.IntegerType(), False),
    T.StructField("stage", T.StringType(), False),
    T.StructField("n_fetched", T.LongType(), False),
    T.StructField("n_ok", T.LongType(), False),
    T.StructField("n_failed", T.LongType(), False),
    T.StructField("n_links_admitted", T.LongType(), False),
    T.StructField("wall_ms", T.DoubleType(), False),
])
