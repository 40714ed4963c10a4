"""Leak-site parse path (SURVEY.md §2 M4 + S7): registry-dispatched
per-site extractors over fetched HTML, batched card sink.

Reference architecture (reimagined Spark-first, not ported):
  * dispatch: ``leak_parse_controller.on_init_leak_parser``
    (leak_parse_controller.py:44-62) resolves "_" + host_name(url) via
    importlib, silently skipping unknown hosts -> here a broadcast inner
    join against the parser registry DataFrame;
  * extraction: per-site classes under app/raw/parsers/local/ implementing
    leak_extractor_interface (leak_extractor_interface.py:12-50) -> here
    plain picklable functions running inside ONE mapInPandas operator,
    Arrow-batched, one output row per extracted card;
  * sink: ``trigger_server`` indexes cards in batches of 10 as extraction
    progresses (leak_parse_controller.py:129-136) -> here a ``batch_id``
    column (card_pos // 10 per page) + parquet sink partitioned by
    host_key, so a downstream indexer consumes the same batch grouping.
"""

from genesis_spark.leaks.dispatch import (dispatch_leak_parse, leak_registry,
                                          sink_leak_cards)
from genesis_spark.leaks.model import CARD_SCHEMA, make_card
from genesis_spark.leaks.parsers import REGISTRY

__all__ = ["dispatch_leak_parse", "leak_registry", "sink_leak_cards",
           "CARD_SCHEMA", "make_card", "REGISTRY"]
