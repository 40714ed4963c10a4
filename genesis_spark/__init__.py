"""genesis_spark — a from-scratch PySpark-native rebuild of the capabilities of
msmannan00/Genesis-Auto-Crawler (reference read-only at /root/reference).

Not a port: the reference is a Celery/Redis/Mongo row-at-a-time Python crawler;
this engine is DataFrame/SQL dataflow with Arrow-vectorized UDFs over
snapshot-versioned parquet tables (Iceberg-style layer in
``genesis_spark.sources.tables``).

Layout
------
- ``functions``  : URL canonicalization / network-type / host-key kernels
                   (reference: app/crawler/crawler_services/shared/helper_method.py),
                   the HTML -> interleaved span parse kernel (reference:
                   html_parse_manager.py), text scalar functions, xxh64 parity.
- ``operators``  : URL-seen prefilters (Bloom + cuckoo shards, exact anti-join
                   stays the truth), dedup (MinHash/SimHash/ngram/embedding
                   near-dup), connected components / cluster dedup, similarity
                   search (brute/LSH/IVF), classifier harness, text stats,
                   multimodal decode, global sequence.
- ``crawler``    : frontier table ops, the distributed BFS wave loop (reference:
                   generic_parse_controller.py:97-123), politeness/robots,
                   production fetch_fn, the pure-Python oracle crawler used as
                   the golden-order reference.
- ``sources``    : snapshot table layer (atomic snapshot-per-commit parquet
                   tables with MERGE-style ops, checkpoint/resume/compaction,
                   lineage), i2p addressbook, deterministic fixtures, the
                   interleaved text+media document synthesizer.
- ``leaks``      : per-site extractor registry, broadcast dispatch, card sink,
                   query-driven collector.
- ``streaming``  : structured-streaming ingest: stateful URL-seen, delta-append
                   frontier sink, watermarked windowed metrics.
"""

__version__ = "0.1.0"
