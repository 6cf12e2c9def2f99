"""pdf_plumber_util_spark — a PySpark-native main-content extraction engine.

Brand-new implementation (NOT a port) of the computational semantics of the
reference `pdf_plumb` tool (marvinmednick/pdf_plumber_util), generalized to
Common-Crawl-style web pages, expressed Spark-first:

* Tokenizer layer: the only pandas/Arrow UDFs — ``html:binary`` -> word
  records with deterministic synthetic geometry.
* Relational layer: every layout operator (line clustering, segment runs,
  gap windows, spacing rules, block sessionization, header/footer voting)
  as composable ``DataFrame -> DataFrame`` functions built from window
  functions + aggregations, designed to run with a single shuffle per
  document corpus (hash-partition by url once; all downstream windows and
  aggregations are keyed by ``url`` prefixes so Catalyst inserts no further
  exchanges).
* Plans layer: the end-to-end extraction pipeline, resumable via anti-join
  against a committed-partition lineage sidecar.

Reference citations in docstrings use ``file:line`` of /root/reference.
"""

__version__ = "0.1.0"
