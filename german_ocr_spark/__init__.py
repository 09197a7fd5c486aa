"""german_ocr_spark — a PySpark-native document-extraction engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``Keyvanhardani/german-ocr`` (see /root/repo/SURVEY.md):
batched, Arrow-vectorized extraction over tables of interleaved
text+media span documents, plus the relational / dedup / similarity /
text-analysis operators a web-scale training-data pipeline needs.

Layout
------
- ``schema``     span / node / block schemas (SURVEY §1.4)
- ``synth``      deterministic seed-fixed corpus synthesizer (FIXTURES F1-F4)
- ``functions``  scalar function library, 3-way consistent
                 (pandas kernel / Spark Column / DuckDB SQL)
- ``kernels``    pure-pandas vectorized kernels (boilerplate, xy-cut)
- ``operators``  Spark operators (extract pipeline, dedup, similarity)
- ``sources``    readers: span tables, binary files, directory globs
- ``plans``      lineage, checkpoint/resume, explain helpers
- ``streaming``  Structured Streaming progress / incremental jobs
"""

__version__ = "0.1.0"
