"""genesis_spark — a from-scratch PySpark-native rebuild of the capabilities of
msmannan00/Genesis-Auto-Crawler (reference read-only at /root/reference).

Not a port: the reference is a Celery/Redis/Mongo row-at-a-time Python crawler;
this engine is DataFrame/SQL dataflow with Arrow-vectorized UDFs over
snapshot-versioned parquet tables (Iceberg-style table layer in
``genesis_spark.storage``).

Layout
------
- ``functions``  : URL canonicalization / network-type / host-key kernels
                   (reference: app/crawler/crawler_services/shared/helper_method.py),
                   text scalar functions, stopword/dictionary assets.
- ``operators``  : HTML -> interleaved span parse (reference:
                   html_parse_manager.py), dedup (Bloom shards + exact anti-join,
                   MinHash/SimHash/ngram near-dup), similarity search, text stats.
- ``crawler``    : frontier table ops, the distributed BFS wave loop (reference:
                   generic_parse_controller.py:97-123), the pure-Python oracle
                   crawler used as the golden-order reference, synthetic web-graph
                   generator.
- ``storage``    : snapshot table layer (atomic snapshot-per-commit parquet
                   tables with MERGE-style ops, checkpoint/resume, lineage).
- ``streaming``  : structured-streaming frontier ingest.
"""

__version__ = "0.1.0"
